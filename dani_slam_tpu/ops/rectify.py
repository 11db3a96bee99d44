"""Stereo rectification: compute row-aligned virtual cameras + remap grids.

Reference: Settings precomputes the rectification maps M1l/M2l/M1r/M2r from
the stereo extrinsics via cv::stereoRectify + cv::initUndistortRectifyMap
(src/Settings.cc), and System::TrackStereo applies cv::remap per frame
(src/System.cc:262-279). Frame::ComputeStereoMatches then assumes
row-aligned epipolar lines.

TPU-first: the maps are built once (numpy at setup time — Bouguet's
half-rotation construction, same geometry as cv::stereoRectify with
alpha=0 semantics simplified to shared mean intrinsics), and the per-frame
remap is ops/image.remap_bilinear — one fused gather program that runs
batched with the rest of the frontend.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.ops import image as image_ops


def _rodrigues(om: np.ndarray) -> np.ndarray:
    th = float(np.linalg.norm(om))
    if th < 1e-12:
        return np.eye(3)
    k = om / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _rotvec(R: np.ndarray) -> np.ndarray:
    cos = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    th = float(np.arccos(cos))
    if th < 1e-12:
        return np.zeros(3)
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2 * np.sin(th)) * v


def stereo_rectify(K1, D1, K2, D2, R, T, size):
    """Bouguet rectification. R, T: x2 = R x1 + T (cam2-from-cam1).

    Returns (R1, R2, K_new, baseline): per-camera rectifying rotations
    (x_rect = R_i x_cam), the shared rectified pinhole intrinsics, and the
    rectified baseline (meters)."""
    K1 = np.asarray(K1, np.float64)
    K2 = np.asarray(K2, np.float64)
    R = np.asarray(R, np.float64)
    T = np.asarray(T, np.float64).reshape(3)
    W, H = size

    om = _rotvec(R)
    r_half_pos = _rodrigues(0.5 * om)      # exp(om/2)
    r_half_neg = _rodrigues(-0.5 * om)     # exp(-om/2)
    # split the rotation: cam1 rotated by exp(om/2), cam2 by exp(-om/2)
    # leaves a pure translation t' = exp(-om/2) T between the frames
    t_new = r_half_neg @ T
    # align the residual baseline with the x axis
    e1 = t_new / max(np.linalg.norm(t_new), 1e-12)
    if e1[0] < 0:             # keep +x to the right camera convention
        e1 = -e1
    e2 = np.array([-e1[1], e1[0], 0.0])
    n2 = np.linalg.norm(e2)
    if n2 < 1e-9:
        e2 = np.array([0.0, 1.0, 0.0])
    else:
        e2 = e2 / n2
    e3 = np.cross(e1, e2)
    Rw = np.stack([e1, e2, e3], axis=0)
    R1 = Rw @ r_half_pos
    R2 = Rw @ r_half_neg
    baseline = float(np.linalg.norm(t_new))

    f_new = 0.5 * (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1]) / 2
    K_new = np.array([[f_new, 0, (W - 1) / 2],
                      [0, f_new, (H - 1) / 2],
                      [0, 0, 1.0]])
    return R1, R2, K_new, baseline


def rectify_map(cam: _cam.Camera, R_rect, K_new, size):
    """Source-pixel grid for one camera: for each RECTIFIED pixel, the raw
    image coordinate to sample (cv::initUndistortRectifyMap semantics).
    cam: the ORIGINAL camera model (pinhole+distortion or KB8)."""
    W, H = size
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))
    Kinv = jnp.asarray(np.linalg.inv(K_new), jnp.float32)
    rays = jnp.stack([u, v, jnp.ones_like(u)], axis=-1) @ Kinv.T   # [H,W,3]
    # rotate rectified rays back into the original camera frame
    rays_cam = rays @ jnp.asarray(R_rect, jnp.float32)             # R^T ray
    src = _cam.project(cam, rays_cam.reshape(-1, 3)).reshape(H, W, 2)
    return src


class StereoRectifier(NamedTuple):
    """Precomputed rectification state (reference: Settings M1l/M2l/M1r/M2r
    + the rectified Camera used by the whole pipeline)."""
    map_l: jax.Array      # [H,W,2] raw coords per rectified pixel (left)
    map_r: jax.Array
    cam: _cam.Camera      # rectified pinhole camera
    baseline: float       # rectified baseline [m]

    def __call__(self, img_l, img_r):
        l = image_ops.remap_bilinear(img_l, self.map_l[..., 0],
                                     self.map_l[..., 1])
        r = image_ops.remap_bilinear(img_r, self.map_r[..., 0],
                                     self.map_r[..., 1])
        return l, r


def build_rectifier(cam_l: _cam.Camera, cam_r: _cam.Camera, R, T,
                    size) -> StereoRectifier:
    """cam_l/cam_r: original camera models; R, T: cam_r-from-cam_l."""
    def K_of(c):
        fx, fy, cx, cy = (float(x) for x in c.params[:4])
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    R1, R2, K_new, baseline = stereo_rectify(
        K_of(cam_l), None, K_of(cam_r), None, R, T, size)
    map_l = rectify_map(cam_l, R1, K_new, size)
    map_r = rectify_map(cam_r, R2, K_new, size)
    cam_new = _cam.Camera.pinhole(float(K_new[0, 0]), float(K_new[1, 1]),
                                  float(K_new[0, 2]), float(K_new[1, 2]),
                                  size[0], size[1])
    return StereoRectifier(map_l, map_r, cam_new, baseline)
