"""Frame construction: image(s) -> fixed-size feature set.

The TPU analogue of the reference's Frame (src/Frame.cc): per-sensor
constructors run extraction, undistortion, depth association and grid
assignment. Here a frame is a fixed-size FrameFeatures pytree; the 64x48
candidate grid (Frame::AssignFeaturesToGrid src/Frame.cc:387) is unnecessary
because window searches are masked dense matmuls (ops/matching.py).
"""
from __future__ import annotations

from functools import partial
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
    octave: jax.Array | None = None   # [N] int8 pyramid level (None = 0)

    @property
    def n(self):
        return self.xy.shape[0]

    def octave_or_zeros(self) -> jax.Array:
        if self.octave is None:
            return jnp.zeros((self.xy.shape[0],), jnp.int8)
        return self.octave


def build_frame_mono(params, img, cam: _cam.Camera, time: float,
                     n_max: int = 1024, threshold: float = 0.007,
                     boxes=None, box_mask=None, n_levels: int = 1,
                     scale_factor: float = 1.2) -> FrameFeatures:
    """Monocular frame: gray -> SuperPoint -> select -> undistort.
    (reference: Frame mono ctor src/Frame.cc:291 + GrabImageMonocular
    src/Tracking.cc:1585). n_levels > 1 runs the multi-level pyramid with
    per-level budgets (SPextractor::ComputePyramid semantics,
    src/SPextractor.cpp:115-127,631)."""
    from dani_slam_tpu.models import superpoint

    g = image_ops.to_gray01(img)
    if n_levels > 1:
        out = frontend.extract_multiscale(
            params, g, n_max=n_max, n_levels=n_levels,
            scale_factor=scale_factor, threshold=threshold)
        valid = out["valid"]
        if boxes is not None:
            valid = frontend.suppress_in_boxes(out["xy"], valid, boxes,
                                               box_mask)
        xy = _cam.undistort_keypoints(cam, out["xy"])
        return FrameFeatures(xy=xy, desc=out["desc"],
                             depth=jnp.full((xy.shape[0],), jnp.inf),
                             valid=valid,
                             time=jnp.asarray(time, jnp.float32),
                             octave=out["octave"])
    heat, dm = superpoint.apply(params, g)
    out = frontend.extract(heat, dm, n_max=n_max, threshold=threshold,
                           boxes=boxes, box_mask=box_mask)
    xy = _cam.undistort_keypoints(cam, out["xy"])
    return FrameFeatures(xy=xy, desc=out["desc"],
                         depth=jnp.full((n_max,), jnp.inf),
                         valid=out["valid"],
                         time=jnp.asarray(time, jnp.float32))


@jax.jit
def stereo_match_depth(xy_l, desc_l, valid_l, xy_r, desc_r, valid_r,
                       fx, baseline, y_band: float = 2.0,
                       th_desc: float = 0.7):
    """Left<->right descriptor matching on a rectified pair -> per-left-
    keypoint depth (reference: Frame::ComputeStereoMatches src/Frame.cc:
    813-915 — LightGlue left/right matching + disparity -> depth + outlier
    trim; here mutual-NN with an epipolar row band, one masked matmul).
    Returns depth [N] (inf where unmatched)."""
    from dani_slam_tpu.ops import matching as m_ops

    d = m_ops.desc_distance_matrix(desc_l, desc_r)
    band = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1]) <= y_band
    disp_ok = (xy_l[:, None, 0] - xy_r[None, :, 0]) > 0.1
    mask = band & disp_ok & valid_l[:, None] & valid_r[None, :]
    m = m_ops.masked_match(d, mask, th=th_desc, mutual=True)
    disp = xy_l[:, 0] - xy_r[m.idx, 0]
    depth = fx * baseline / jnp.maximum(disp, 1e-6)
    # median-based outlier trim (reference trims matches with descriptor
    # distance beyond ~1.5x median, Frame.cc:856-915)
    med = jnp.median(jnp.where(m.ok, m.dist, jnp.nan))
    keep = m.ok & (m.dist <= 1.5 * jnp.nan_to_num(med, nan=1e9) + 1e-6)
    return jnp.where(keep, depth, jnp.inf)


def stereo_match_depth_lightglue(matcher, xy_l, desc_l, valid_l, xy_r,
                                 desc_r, valid_r, fx, baseline,
                                 y_band: float = 4.0):
    """Stereo depth via the learned LightGlue matcher (the reference's
    actual ComputeStereoMatches path, src/Frame.cc:813-915), with the same
    rectified-geometry gates as the descriptor-NN variant."""
    from dani_slam_tpu.models import lightglue as lg

    idx, score, ok = lg.match(matcher, xy_l, desc_l, valid_l, xy_r, desc_r,
                              valid_r)
    disp = xy_l[:, 0] - xy_r[idx, 0]
    band = jnp.abs(xy_l[:, 1] - xy_r[idx, 1]) <= y_band
    keep = ok & band & (disp > 0.1)
    return jnp.where(keep, fx * baseline / jnp.maximum(disp, 1e-6), jnp.inf)


def build_frame_stereo(params, img_l, img_r, cam: _cam.Camera,
                       baseline: float, time: float, n_max: int = 1024,
                       threshold: float = 0.007,
                       matcher=None) -> FrameFeatures:
    """Stereo frame: both images through SuperPoint as ONE batch of 2 (the
    reference forks two extraction threads, src/Frame.cc:125-128 — on TPU
    the batch dim does the same with zero orchestration), then rectified
    stereo matching fills metric depth."""
    from dani_slam_tpu.models import superpoint

    g = jnp.stack([image_ops.to_gray01(img_l), image_ops.to_gray01(img_r)])
    heat, dm = superpoint.SuperPoint().apply(params, g[..., None])
    out_l = frontend.extract(heat[0], dm[0], n_max=n_max, threshold=threshold)
    out_r = frontend.extract(heat[1], dm[1], n_max=n_max, threshold=threshold)
    if matcher is not None:
        depth = stereo_match_depth_lightglue(
            matcher, out_l["xy"], out_l["desc"], out_l["valid"],
            out_r["xy"], out_r["desc"], out_r["valid"], cam.params[0],
            baseline)
    else:
        depth = stereo_match_depth(
            out_l["xy"], out_l["desc"], out_l["valid"], out_r["xy"],
            out_r["desc"], out_r["valid"], cam.params[0], baseline)
    xy = _cam.undistort_keypoints(cam, out_l["xy"])
    return FrameFeatures(xy=xy, desc=out_l["desc"], depth=depth,
                         valid=out_l["valid"],
                         time=jnp.asarray(time, jnp.float32))


def stereo_fisheye_depth(cam_l: _cam.Camera, cam_r: _cam.Camera,
                         xy_l, desc_l, valid_l, xy_r, desc_r, valid_r,
                         R_rl, t_rl, lapping_l=(0, 1e9), lapping_r=(0, 1e9),
                         th_desc: float = 0.7, reproj_px: float = 2.0,
                         min_parallax_cos: float = 0.9998):
    """Unrectified (fisheye) stereo depth: descriptor matching restricted to
    the lapping areas + two-view ray triangulation with reprojection and
    parallax gates (reference: Frame::ComputeStereoFishEyeMatches
    src/Frame.cc:1060-1101 — BFMatcher knn over lapping-area keypoints, then
    KannalaBrandt8::TriangulateMatches src/CameraModels/KannalaBrandt8.cpp:
    306-393 with parallax/reprojection checks). (R_rl, t_rl) maps left-cam
    coords to right-cam coords. Returns depth [N] in the LEFT camera (inf
    where unmatched/rejected)."""
    from dani_slam_tpu.ops import matching as m_ops

    in_l = (xy_l[:, 0] >= lapping_l[0]) & (xy_l[:, 0] <= lapping_l[1])
    in_r = (xy_r[:, 0] >= lapping_r[0]) & (xy_r[:, 0] <= lapping_r[1])
    d = m_ops.desc_distance_matrix(desc_l, desc_r)
    mask = (valid_l & in_l)[:, None] & (valid_r & in_r)[None, :]
    m = m_ops.masked_match(d, mask, th=th_desc, mutual=True)

    r_l = _cam.unproject(cam_l, xy_l)                 # rays in left cam
    r_r = _cam.unproject(cam_r, xy_r)[m.idx]          # matched right rays
    X_l = _cam.triangulate_two_view(r_l, r_r, R_rl, t_rl)
    X_r = jnp.einsum('ij,nj->ni', R_rl, X_l) + t_rl
    e_l = _cam.project(cam_l, X_l) - xy_l
    e_r = _cam.project(cam_r, X_r) - xy_r[m.idx]
    ok_rep = ((jnp.sum(e_l * e_l, -1) < reproj_px ** 2) &
              (jnp.sum(e_r * e_r, -1) < reproj_px ** 2))
    # parallax between the two viewing rays (reference rejects
    # cosParallaxRays > 0.9998, KannalaBrandt8.cpp:342)
    r_r_in_l = jnp.einsum('ji,nj->ni', R_rl, r_r)
    cosp = (jnp.einsum('ni,ni->n', r_l, r_r_in_l) /
            (jnp.linalg.norm(r_l, axis=-1) *
             jnp.linalg.norm(r_r_in_l, axis=-1)).clip(1e-9))
    good = (m.ok & (X_l[:, 2] > 0) & (X_r[:, 2] > 0) & ok_rep &
            (cosp < min_parallax_cos))
    return jnp.where(good, X_l[:, 2], jnp.inf)


def build_frame_stereo_fisheye(params, img_l, img_r, cam_l: _cam.Camera,
                               cam_r: _cam.Camera, R_rl, t_rl, time: float,
                               lapping_l=(0, 1e9), lapping_r=(0, 1e9),
                               n_max: int = 1024,
                               threshold: float = 0.007) -> FrameFeatures:
    """Fisheye (KB8) stereo frame: no rectification — both images through
    SuperPoint as one batch, then lapping-area matching + ray triangulation
    for metric depth (reference: the stereo-fisheye Frame ctor
    src/Frame.cc:968 with vLappingArea from Settings)."""
    from dani_slam_tpu.models import superpoint

    g = jnp.stack([image_ops.to_gray01(img_l), image_ops.to_gray01(img_r)])
    heat, dm = superpoint.SuperPoint().apply(params, g[..., None])
    out_l = frontend.extract(heat[0], dm[0], n_max=n_max,
                             threshold=threshold)
    out_r = frontend.extract(heat[1], dm[1], n_max=n_max,
                             threshold=threshold)
    depth = stereo_fisheye_depth(
        cam_l, cam_r, out_l["xy"], out_l["desc"], out_l["valid"],
        out_r["xy"], out_r["desc"], out_r["valid"], R_rl, t_rl,
        lapping_l, lapping_r)
    # keypoints enter the SLAM layer as undistorted pinhole-plane points
    xy = _cam.undistort_keypoints(cam_l, out_l["xy"])
    return FrameFeatures(xy=xy, desc=out_l["desc"], depth=depth,
                         valid=out_l["valid"],
                         time=jnp.asarray(time, jnp.float32))


def build_frame_rgbd(params, img, depth_img, cam: _cam.Camera, time: float,
                     depth_factor: float = 5000.0, n_max: int = 1024,
                     threshold: float = 0.007, boxes=None,
                     box_mask=None) -> FrameFeatures:
    """RGB-D frame: depth sampled at keypoint locations (reference:
    Frame::ComputeStereoFromRGBD src/Frame.cc:918 — converts depth to a
    virtual right coordinate; we keep metric depth directly)."""
    use_boxes = boxes is not None
    if not use_boxes:
        boxes = jnp.zeros((1, 4), jnp.float32)
        box_mask = jnp.zeros((1,), bool)
    return _frame_rgbd_program(params, img, depth_img, cam,
                               jnp.asarray(time, jnp.float32),
                               jnp.asarray(depth_factor, jnp.float32),
                               jnp.asarray(threshold, jnp.float32),
                               boxes, box_mask, n_max=n_max,
                               use_boxes=use_boxes)


@partial(jax.jit, static_argnames=("n_max", "use_boxes"))
def _frame_rgbd_program(params, img, depth_img, cam, time, depth_factor,
                        threshold, boxes, box_mask, n_max: int,
                        use_boxes: bool) -> FrameFeatures:
    """The whole RGB-D frontend as ONE XLA program: grayscale -> SuperPoint
    -> NMS/top-k select -> (dynamic-box suppression) -> descriptor sampling
    -> depth gather -> undistortion. One dispatch per frame, no host scalars
    on the hot path (every traced input is a device array — through the axon
    tunnel a single host->device scalar upload costs ~26 ms RTT,
    docs/DEVELOPMENT.md)."""
    from dani_slam_tpu.models import superpoint

    g = image_ops.to_gray01(img)
    heat, dm = superpoint.apply(params, g)
    out = frontend.extract(heat, dm, n_max=n_max, threshold=threshold,
                           boxes=boxes if use_boxes else None,
                           box_mask=box_mask if use_boxes else None)
    dmap = image_ops.depth_from_encoded(depth_img, depth_factor)
    xi = jnp.clip(out["xy"][:, 0].astype(jnp.int32), 0, dmap.shape[1] - 1)
    yi = jnp.clip(out["xy"][:, 1].astype(jnp.int32), 0, dmap.shape[0] - 1)
    d = dmap[yi, xi]
    xy = _cam.undistort_keypoints(cam, out["xy"])
    return FrameFeatures(xy=xy, desc=out["desc"], depth=d,
                         valid=out["valid"], time=time)
