"""Sim(3) estimation: RANSAC Horn alignment + relative-pose refinement.

Reference: src/Sim3Solver.cc — RANSAC over 3-point minimal sets with Horn's
closed-form absolute orientation (ComputeSim3 quaternion method,
Sim3Solver.cc:316-380) and reprojection-error inlier checks in both images;
src/Optimizer.cc OptimizeSim3:2115 — g2o refinement of the relative Sim3
with point edges in both directions and inlier recount.

TPU-first: B 3-point hypotheses solved as one batched SVD Horn alignment
(ops/solvers.horn_align), scored with one masked reduction; refinement is a
fixed-iteration GN on the 7-D sim3 tangent with autodiff Jacobians.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie
from dani_slam_tpu.ops import linalg as dla
from dani_slam_tpu.ops import solvers


class Sim3Result(NamedTuple):
    R: jax.Array      # rotation of T_12: maps frame-2 coords to frame-1
    t: jax.Array
    s: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array
    ok: jax.Array


@partial(jax.jit, static_argnames=("n_hypo", "fix_scale"))
def sim3_ransac(key, cam1, cam2, pts1_c: jax.Array, pts2_c: jax.Array,
                mask: jax.Array, n_hypo: int = 128, th_px: float = 9.21 ** 0.5,
                min_inliers: int = 20, fix_scale: bool = False) -> Sim3Result:
    """Estimate T_12 (sim3 mapping camera-2-frame points into camera-1
    frame) from matched camera-frame 3-D points.

    pts1_c/pts2_c: [N,3] matched landmark positions in the two camera frames
    (the reference feeds mvX3Dc1/mvX3Dc2, Sim3Solver.cc:84-112). Inlier test:
    project both ways, chi2 threshold in pixels (9.21 = 2-DoF 99%,
    Sim3Solver.cc:CheckInliers).
    """
    N = pts1_c.shape[0]
    p = mask.astype(jnp.float32) + 1e-6
    idx = jax.random.categorical(
        key, jnp.broadcast_to(jnp.log(p), (n_hypo, 3, N)), axis=-1)
    R, t, s = jax.vmap(
        lambda i: _horn3(pts2_c[i], pts1_c[i], fix_scale))(idx)

    # score: project pts2 into cam1 via T12 and pts1 into cam2 via T12^-1
    p2in1 = s[:, None, None] * jnp.einsum('bij,nj->bni', R, pts2_c) + t[:, None]
    proj1 = _cam.project(cam1, p2in1.reshape(-1, 3)).reshape(n_hypo, N, 2)
    obs1 = _cam.project(cam1, pts1_c)
    e1 = jnp.sum((proj1 - obs1[None]) ** 2, axis=-1)
    Ri, ti, si = lie.sim3_inv(R, t, s)
    p1in2 = si[:, None, None] * jnp.einsum('bij,nj->bni', Ri, pts1_c) + ti[:, None]
    proj2 = _cam.project(cam2, p1in2.reshape(-1, 3)).reshape(n_hypo, N, 2)
    obs2 = _cam.project(cam2, pts2_c)
    e2 = jnp.sum((proj2 - obs2[None]) ** 2, axis=-1)
    inl = (e1 < th_px ** 2) & (e2 < th_px ** 2) & mask[None]
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    b = jnp.argmax(counts)
    # final re-fit on all inliers of the best hypothesis
    w = inl[b].astype(jnp.float32)
    Rf, tf, sf = solvers.horn_align(pts2_c, pts1_c, w=w,
                                    with_scale=not fix_scale)
    if fix_scale:
        sf = jnp.ones(())
    ok = counts[b] >= min_inliers
    return Sim3Result(Rf, tf, sf, inl[b], counts[b], ok)


def _horn3(P, Q, fix_scale):
    R, t, s = solvers.horn_align(P, Q, with_scale=not fix_scale)
    if fix_scale:
        s = jnp.ones(())
    return R, t, s


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3(cam1, cam2, R0, t0, s0, pts1_c, obs1_xy, pts2_c, obs2_xy,
                  mask, iters: int = 10, fix_scale: bool = False,
                  chi2_th: float = 9.21):
    """Refine a relative Sim3 with point reprojection edges in both
    directions and Huber kernels (delta = sqrt(10), matching the reference:
    Optimizer::OptimizeSim3 src/Optimizer.cc:2115 — without the robust
    kernel, drifted-map structure systematically biases the scale: the
    pixel-space ML fit trades scale against translation on the worst pairs).
    Returns (R, t, s, inliers, n_inliers)."""
    xi0 = jnp.zeros(7)
    delta = 10.0 ** 0.5

    def residuals(xi, R, t, s):
        dR, dt, ds = lie.sim3_exp(xi)
        Rn, tn, sn = lie.sim3_mul(dR, dt, ds, R, t, s)
        p2in1 = lie.sim3_apply(Rn, tn, sn, pts2_c)
        r1 = _cam.project(cam1, p2in1) - obs1_xy
        Ri, ti, si = lie.sim3_inv(Rn, tn, sn)
        p1in2 = lie.sim3_apply(Ri, ti, si, pts1_c)
        r2 = _cam.project(cam2, p1in2) - obs2_xy
        return r1, r2

    def chi2(R, t, s):
        r1, r2 = residuals(jnp.zeros(7), R, t, s)
        return jnp.sum(r1 * r1, -1) + jnp.sum(r2 * r2, -1)

    def rho(c):
        sq = jnp.sqrt(jnp.maximum(c, 1e-12))
        return jnp.where(sq <= delta, c, 2 * delta * sq - delta * delta)

    def gn(it, carry):
        R, t, s, inl = carry
        r1c, r2c = residuals(xi0, R, t, s)
        c1 = jnp.sum(r1c * r1c, -1)
        c2 = jnp.sum(r2c * r2c, -1)
        w1 = jnp.where(jnp.sqrt(jnp.maximum(c1, 1e-12)) <= delta, 1.0,
                       delta / jnp.sqrt(jnp.maximum(c1, 1e-12)))
        w2 = jnp.where(jnp.sqrt(jnp.maximum(c2, 1e-12)) <= delta, 1.0,
                       delta / jnp.sqrt(jnp.maximum(c2, 1e-12)))

        def flat_res(xi):
            r1, r2 = residuals(xi, R, t, s)
            wm = jnp.where(inl, 1.0, 0.0)
            return jnp.concatenate([
                (r1 * (wm * jnp.sqrt(w1))[:, None]).reshape(-1),
                (r2 * (wm * jnp.sqrt(w2))[:, None]).reshape(-1)])

        r = flat_res(xi0)
        J = jax.jacfwd(flat_res)(xi0)
        if fix_scale:
            J = J.at[:, 6].set(0.0)
        H = J.T @ J + 1e-6 * jnp.eye(7)
        dx = -dla.chol_solve(H, J.T @ r)
        if fix_scale:
            dx = dx.at[6].set(0.0)
        dR, dt, ds = lie.sim3_exp(dx)
        Rn, tn, sn = lie.sim3_mul(dR, dt, ds, R, t, s)

        def rob_cost(R_, t_, s_):
            return jnp.sum(jnp.where(inl, rho(chi2(R_, t_, s_)), 0.0))
        better = rob_cost(Rn, tn, sn) < rob_cost(R, t, s)
        R = jnp.where(better, Rn, R)
        t = jnp.where(better, tn, t)
        s = jnp.where(better, sn, s)
        # the reference optimizes all edges first and prunes outliers only
        # after convergence begins (OptimizeSim3 removes bad edges after the
        # first 5 iterations); gate only in the second half here
        inl = jnp.where(it >= iters // 2,
                        mask & (chi2(R, t, s) <= 2 * chi2_th), mask)
        return (R, t, s, inl)

    R, t, s, inl = jax.lax.fori_loop(0, iters, gn, (R0, t0, s0, mask))
    inl = inl & (chi2(R, t, s) <= chi2_th)
    return R, t, s, inl, jnp.sum(inl.astype(jnp.int32))
