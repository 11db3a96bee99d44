"""Frame construction: image(s) -> fixed-size feature set.

The TPU analogue of the reference's Frame (src/Frame.cc): per-sensor
constructors run extraction, undistortion, depth association and grid
assignment. Here a frame is a fixed-size FrameFeatures pytree; the 64x48
candidate grid (Frame::AssignFeaturesToGrid src/Frame.cc:387) is unnecessary
because window searches are masked dense matmuls (ops/matching.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.ops import frontend, image as image_ops


class FrameFeatures(NamedTuple):
    """Fixed-size per-frame features (padded to N slots)."""
    xy: jax.Array      # [N,2] undistorted pixel coords
    desc: jax.Array    # [N,D] unit descriptors
    depth: jax.Array   # [N] metric depth (inf for mono / no reading)
    valid: jax.Array   # [N] bool
    time: jax.Array    # [] timestamp (seconds)

    @property
    def n(self):
        return self.xy.shape[0]


def build_frame_mono(params, img, cam: _cam.Camera, time: float,
                     n_max: int = 1024, threshold: float = 0.007,
                     boxes=None, box_mask=None) -> FrameFeatures:
    """Monocular frame: gray -> SuperPoint -> select -> undistort.
    (reference: Frame mono ctor src/Frame.cc:291 + GrabImageMonocular
    src/Tracking.cc:1585)."""
    from dani_slam_tpu.models import superpoint

    g = image_ops.to_gray01(img)
    heat, dm = superpoint.apply(params, g)
    out = frontend.extract(heat, dm, n_max=n_max, threshold=threshold,
                           boxes=boxes, box_mask=box_mask)
    xy = _cam.undistort_keypoints(cam, out["xy"])
    return FrameFeatures(xy=xy, desc=out["desc"],
                         depth=jnp.full((n_max,), jnp.inf),
                         valid=out["valid"],
                         time=jnp.asarray(time, jnp.float32))


def build_frame_rgbd(params, img, depth_img, cam: _cam.Camera, time: float,
                     depth_factor: float = 5000.0, n_max: int = 1024,
                     threshold: float = 0.007, boxes=None,
                     box_mask=None) -> FrameFeatures:
    """RGB-D frame: depth sampled at keypoint locations (reference:
    Frame::ComputeStereoFromRGBD src/Frame.cc:918 — converts depth to a
    virtual right coordinate; we keep metric depth directly)."""
    from dani_slam_tpu.models import superpoint

    g = image_ops.to_gray01(img)
    heat, dm = superpoint.apply(params, g)
    out = frontend.extract(heat, dm, n_max=n_max, threshold=threshold,
                           boxes=boxes, box_mask=box_mask)
    dmap = image_ops.depth_from_encoded(depth_img, depth_factor)
    xi = jnp.clip(out["xy"][:, 0].astype(jnp.int32), 0, dmap.shape[1] - 1)
    yi = jnp.clip(out["xy"][:, 1].astype(jnp.int32), 0, dmap.shape[0] - 1)
    d = dmap[yi, xi]
    xy = _cam.undistort_keypoints(cam, out["xy"])
    return FrameFeatures(xy=xy, desc=out["desc"], depth=d,
                         valid=out["valid"],
                         time=jnp.asarray(time, jnp.float32))
