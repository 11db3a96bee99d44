"""Synthetic SLAM worlds for testing.

The reference has no unit tests — its verification is dataset playback +
ATE evaluation (SURVEY.md §4). Since the TUM/EuRoC datasets and the authors'
model weights are not available in this environment, the system-level test
harness renders synthetic worlds: random landmark clouds with stable unique
descriptors, observed through the real camera model along known trajectories.
This exercises every SLAM-layer component (matching, pose solve, triangulation,
BA, keyframing, loop closing) with exact ground truth, independent of the
learned feature detector.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie
from dani_slam_tpu.slam.frame import FrameFeatures


class SyntheticWorld(NamedTuple):
    points: jax.Array     # [M,3] world landmarks
    desc: jax.Array       # [M,D] unit descriptors (unique per landmark)


def make_world(n_points: int = 2000, desc_dim: int = 64, seed: int = 0,
               box=((-6.0, 6.0), (-4.0, 4.0), (-6.0, 6.0))) -> SyntheticWorld:
    rng = np.random.RandomState(seed)
    pts = np.stack([rng.uniform(lo, hi, n_points) for lo, hi in box],
                   axis=1).astype(np.float32)
    d = rng.randn(n_points, desc_dim).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return SyntheticWorld(jnp.asarray(pts), jnp.asarray(d))


def orbit_trajectory(n_frames: int, radius: float = 10.0,
                     angle_span: float = 2 * np.pi, height: float = 0.0,
                     look_at=(0.0, 0.0, 0.0)):
    """Camera orbiting the origin, always looking at `look_at`.
    Returns (R_cw [F,3,3], t_cw [F,3]) ground-truth poses (T_cw)."""
    Rs, ts = [], []
    for i in range(n_frames):
        a = angle_span * i / max(n_frames - 1, 1)
        C = np.array([radius * np.sin(a), height, -radius * np.cos(a)])
        z = np.asarray(look_at) - C
        z = z / np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=1)       # columns = camera axes
        R_cw = R_wc.T
        t_cw = -R_cw @ C
        Rs.append(R_cw)
        ts.append(t_cw)
    return (jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.asarray(np.stack(ts), jnp.float32))


def forward_trajectory(n_frames: int, step: float = 0.08,
                       yaw_rate: float = 0.0):
    """Camera moving forward along +z with optional constant yaw."""
    Rs, ts = [], []
    R_wc = np.eye(3)
    C = np.zeros(3)
    for i in range(n_frames):
        R_cw = R_wc.T
        Rs.append(R_cw.copy())
        ts.append(-R_cw @ C)
        C = C + R_wc @ np.array([0.0, 0.0, step])
        if yaw_rate:
            c, s = np.cos(yaw_rate), np.sin(yaw_rate)
            R_wc = R_wc @ np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return (jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.asarray(np.stack(ts), jnp.float32))


def render_frame(world: SyntheticWorld, cam: _cam.Camera, R_cw, t_cw,
                 n_max: int = 512, noise_px: float = 0.3,
                 desc_noise: float = 0.05, seed: int = 0,
                 with_depth: bool = False, depth_noise: float = 0.0,
                 time: float = 0.0):
    """Render a FrameFeatures observation of the world from pose T_cw.

    Returns (features, true_ids [n_max] int32 — world landmark index per slot,
    -1 for padding).
    """
    rng = np.random.RandomState(seed)
    pc = np.asarray(lie.se3_apply(R_cw, t_cw, world.points))
    z = pc[:, 2]
    xy = np.asarray(_cam.project(cam, jnp.asarray(pc)))
    vis = ((z > 0.3) & (xy[:, 0] >= 1) & (xy[:, 0] < cam.width - 1) &
           (xy[:, 1] >= 1) & (xy[:, 1] < cam.height - 1))
    ids = np.nonzero(vis)[0]
    rng.shuffle(ids)
    ids = ids[:n_max]
    n = len(ids)

    D = world.desc.shape[1]
    fxy = np.zeros((n_max, 2), np.float32)
    fdesc = np.zeros((n_max, D), np.float32)
    fdepth = np.full((n_max,), np.inf, np.float32)
    valid = np.zeros((n_max,), bool)
    true_ids = np.full((n_max,), -1, np.int32)

    fxy[:n] = xy[ids] + rng.randn(n, 2) * noise_px
    d = np.asarray(world.desc)[ids] + rng.randn(n, D) * desc_noise
    fdesc[:n] = d / np.linalg.norm(d, axis=1, keepdims=True)
    if with_depth:
        fdepth[:n] = z[ids] * (1 + rng.randn(n) * depth_noise)
    valid[:n] = True
    true_ids[:n] = ids

    feat = FrameFeatures(
        xy=jnp.asarray(fxy), desc=jnp.asarray(fdesc),
        depth=jnp.asarray(fdepth), valid=jnp.asarray(valid),
        time=jnp.asarray(time, jnp.float32))
    return feat, jnp.asarray(true_ids)
