"""Perspective-n-Point RANSAC, fully vectorized.

Replaces the reference's MLPnPsolver (src/MLPnPsolver.cpp — maximum-
likelihood PnP on bearing vectors with Gauss-Newton refinement, wrapped in a
sequential RANSAC loop with parameters (0.99, 10, 300, 6, 0.5, 5.991) at
src/Tracking.cc:3714).

TPU-first: all B hypotheses are solved at once — each from a 6-point DLT
(SVD of a [12,12] system, batched), scored against all N correspondences in
one masked reduction, and the best hypothesis is polished with the batched
LM pose optimizer (ops/solvers.pose_optimize). Camera-model-agnostic like
the reference: operates on unprojected rays, so fisheye works unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie
from dani_slam_tpu.ops import solvers


class PnPResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array
    ok: jax.Array


def _dlt_p6(X: jax.Array, rays: jax.Array):
    """Batched 6-point DLT: world points X (B,6,3), normalized rays
    (B,6,3) -> camera matrices P = [R|t] up to scale (B,3,4)."""
    x = rays[..., 0] / rays[..., 2]
    y = rays[..., 1] / rays[..., 2]
    Xh = jnp.concatenate([X, jnp.ones(X.shape[:-1] + (1,))], axis=-1)  # B,6,4
    zero = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, zero, -x[..., None] * Xh], axis=-1)
    r2 = jnp.concatenate([zero, Xh, -y[..., None] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)            # (B,12,12)
    _, _, Vt = jnp.linalg.svd(A)
    P = Vt[..., 11, :].reshape(A.shape[:-2] + (3, 4))
    # fix scale & sign: ||first 3x3 rows|| -> rotation via SVD projection
    M = P[..., :3]
    U, S, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt2)
    scale = jnp.mean(S, axis=-1) * det
    R = U @ (jnp.eye(3) * det[..., None, None]) @ Vt2
    # recompute with proper-rotation projection
    E = jnp.zeros_like(U).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    E = E.at[..., 2, 2].set(det)
    R = U @ E @ Vt2
    t = P[..., 3] / scale[..., None]
    return R, t


@partial(jax.jit, static_argnames=("n_hypo",))
def pnp_ransac(key, cam, pts_w: jax.Array, obs_xy: jax.Array,
               mask: jax.Array, n_hypo: int = 256, th_px: float = 5.991 ** 0.5,
               min_inliers: int = 12) -> PnPResult:
    """Robust pose from 2D-3D matches. pts_w [N,3] world points, obs_xy [N,2]
    pixels, mask [N] valid matches."""
    N = pts_w.shape[0]
    rays = _cam.unproject(cam, obs_xy)
    p = mask.astype(jnp.float32) + 1e-6
    logits = jnp.log(p)
    idx = jax.random.categorical(
        key, jnp.broadcast_to(logits, (n_hypo, 6, N)), axis=-1)  # (B,6)
    R, t = _dlt_p6(pts_w[idx], rays[idx])

    # score all hypotheses: reprojection error of every point
    pc = jnp.einsum('bij,nj->bni', R, pts_w) + t[:, None]
    proj = _cam.project(cam, pc.reshape(-1, 3)).reshape(n_hypo, N, 2)
    err = jnp.sum((proj - obs_xy[None]) ** 2, axis=-1)
    inl = (err < th_px ** 2) & mask[None] & (pc[..., 2] > 0)
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)

    # polish with the LM pose optimizer on the best hypothesis
    res = solvers.pose_optimize(R[best], t[best], cam, pts_w, obs_xy,
                                inl[best])
    ok = res.n_inliers >= min_inliers
    return PnPResult(res.R, res.t, res.inliers, res.n_inliers, ok)
