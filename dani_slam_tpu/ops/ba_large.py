"""Large-scale bundle adjustment: Schur-free preconditioned conjugate
gradients (inexact Gauss-Newton / LM).

Replaces the explicit Schur assembly of ops/ba.py at MAP scale. ba_solve
builds a one-hot [P,N,L] tensor and a dense H_pl [P,L,6,3]; at the default
MapCaps (K=256, N=1024, L=32768) those are terabytes — fine for the local
window, impossible for Optimizer::GlobalBundleAdjustemnt
(src/Optimizer.cc:52-390) or Optimizer::FullInertialBA (src/Optimizer.cc:392)
semantics over the whole map.

TPU-first formulation (the "Bundle Adjustment in the Large" inexact-step
idea, re-shaped for XLA):
  * The reduced camera system S = H_pp - H_pl H_ll^-1 H_pl^T is never
    materialized. CG only needs S @ x, which factors into per-observation
    products with the SPARSE H_pl blocks A_m [6,3] (18 floats per
    observation — megabytes, not terabytes).
  * Landmark-indexed reductions (H_ll, g_l, H_pl^T x) use a sort-by-landmark
    ordering fixed at trace time + cumsum segment sums: cs[end_l]-cs[start_l].
    No TPU scatters (sequential, ~us/row), no one-hot matmuls (O(P N L)
    FLOPs) — one [M,d] cumsum (log-depth) + two gathers.
  * Pose-indexed reductions stay keyframe-major reshape-sums ([P,N,...]
    layouts), as in ops/ba.py.
  * H_pp is block-diagonal for reprojection-only systems, so the Jacobi
    block preconditioner is exact on the un-reduced part.

The inertial variant (full_inertial_ba) extends the state to 15 DoF
[pose(6) | v(3) | bg(3) | ba(3)] and adds the temporal preintegration chain
(EdgeInertial + EdgeGyroRW/EdgeAccRW, src/G2oTypes.h:495,635,671) as a block
tridiagonal term in the same CG matvec, plus the staged bias priors
(EdgePriorGyro/EdgePriorAcc with weights (priorG, priorA), the
LocalMapping::InitializeIMU schedule src/LocalMapping.cc:183-233).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie
from dani_slam_tpu.ops import ba as ba_ops
from dani_slam_tpu.ops import imu as imu_ops

CHI2_MONO = 5.991


# ---------------------------------------------------------------------------
# sorted segment sums
# ---------------------------------------------------------------------------

def _landmark_segments(obs_lm, valid, L):
    """Fixed (trace-time-constant) sort of observations by landmark id.
    Returns (perm [M], starts [L], ends [L]): rows perm[starts[l]:ends[l]]
    are the observations of landmark l."""
    ids = jnp.where(valid, obs_lm, L)
    perm = jnp.argsort(ids)
    sorted_ids = ids[perm]
    grid = jnp.arange(L, dtype=sorted_ids.dtype)
    starts = jnp.searchsorted(sorted_ids, grid, side="left")
    ends = jnp.searchsorted(sorted_ids, grid, side="right")
    return perm, starts, ends


def _segsum(vals_sorted, starts, ends):
    """Per-landmark sums of pre-sorted per-observation values.
    vals_sorted [M, d] -> [L, d] via exclusive cumsum differences."""
    cs = jnp.concatenate([jnp.zeros_like(vals_sorted[:1]),
                          jnp.cumsum(vals_sorted, axis=0)], axis=0)
    return cs[ends] - cs[starts]


# ---------------------------------------------------------------------------
# visual-only PCG bundle adjustment
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iters", "cg_iters", "robust"))
def ba_solve_pcg(R0, t0, pose_fixed, lm0, lm_valid, cam,
                 obs_kf, obs_lm, obs_xy, obs_valid, obs_info=None,
                 iters: int = 10, cg_iters: int = 40, robust: bool = True,
                 huber_delta: float = CHI2_MONO ** 0.5) -> ba_ops.BAResult:
    """Drop-in for ops/ba.ba_solve at map scale (same keyframe-major
    observation layout: obs_kf == repeat(arange(P), N)). Memory is O(M)
    instead of O(P*N*L)."""
    P = R0.shape[0]
    L = lm0.shape[0]
    M = obs_kf.shape[0]
    N = M // P
    info = jnp.ones(M) if obs_info is None else obs_info
    delta = huber_delta

    obs_kf = jnp.where(obs_valid, obs_kf, 0)
    obs_lm_s = jnp.where(obs_valid, obs_lm, 0)
    base_valid = obs_valid & jnp.take(lm_valid, obs_lm_s)
    perm, seg_start, seg_end = _landmark_segments(obs_lm_s, base_valid, L)
    olm_2d = obs_lm_s.reshape(P, N)

    def cost_of(R, t, lm):
        r, _, _ = ba_ops._residuals(R, t, cam, lm, obs_kf, obs_lm_s, obs_xy)
        c = jnp.sum(r * r, axis=-1) * info
        rho = ba_ops._rho(c, delta) if robust else c
        return c, jnp.sum(jnp.where(base_valid, rho, 0.0))

    def lm_iter(_, carry):
        R, t, lm, lam = carry
        r, Jpose, Jpt = ba_ops._residuals(R, t, cam, lm, obs_kf, obs_lm_s,
                                          obs_xy)
        c = jnp.sum(r * r, axis=-1) * info
        w = (ba_ops._robust_w(c, delta) if robust else jnp.ones_like(c))
        w = jnp.where(base_valid, w * info, 0.0)

        # per-observation blocks (sparse H_pl): A_m = Jpose^T W Jpt  [M,6,3]
        A = jnp.einsum('mki,mk,mkj->mij', Jpose,
                       jnp.broadcast_to(w[:, None], (M, 2)), Jpt)
        JtJ_p = jnp.einsum('mik,m,mil->mkl', Jpose, w, Jpose)
        JtJ_l = jnp.einsum('mik,m,mil->mkl', Jpt, w, Jpt)
        g_p_m = jnp.einsum('mik,m,mi->mk', Jpose, w, r)
        g_l_m = jnp.einsum('mik,m,mi->mk', Jpt, w, r)

        H_pp = JtJ_p.reshape(P, N, 6, 6).sum(1)
        g_p = g_p_m.reshape(P, N, 6).sum(1)
        H_ll = _segsum(JtJ_l.reshape(M, 9)[perm], seg_start,
                       seg_end).reshape(L, 3, 3)
        g_l = _segsum(g_l_m[perm], seg_start, seg_end)

        # damping (same scheme as ba_solve)
        H_pp_d = H_pp + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_pp))
                         + 1e-8 * jnp.eye(6))
        H_ll_d = H_ll + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_ll))
                         + 1e-8 * jnp.eye(3))
        Hll_inv = ba_ops._inv3x3(H_ll_d)

        A4 = A.reshape(P, N, 6, 3)
        keep = (~pose_fixed).astype(jnp.float32)

        def matvec(x):                       # x [P,6] -> S x (gauge-masked)
            x = x * keep[:, None]
            u = jnp.einsum('pnij,pi->pnj', A4, x)           # H_pl^T x
            y = _segsum(u.reshape(M, 3)[perm], seg_start, seg_end)
            z = jnp.einsum('lij,lj->li', Hll_inv, y)
            w2 = jnp.einsum('pnij,pnj->pni', A4, z[olm_2d])  # H_pl Hll^-1 ..
            Sx = jnp.einsum('pij,pj->pi', H_pp_d, x) - w2.sum(1)
            return Sx * keep[:, None] + x_fix_identity(x)

        def x_fix_identity(x):
            return x * pose_fixed.astype(jnp.float32)[:, None]

        # reduced RHS: g_p - H_pl Hll^-1 g_l  (gradient; solve S dx = -rhs)
        hg = jnp.einsum('lij,lj->li', Hll_inv, g_l)
        rhs = g_p - jnp.einsum('pnij,pnj->pni', A4, hg[olm_2d]).sum(1)
        rhs = rhs * keep[:, None]

        # Jacobi preconditioner from the (damped, un-reduced) pose diagonal
        prec = 1.0 / jnp.clip(
            jax.vmap(jnp.diag)(H_pp_d), 1e-8, None)         # [P,6]
        prec = jnp.where(pose_fixed[:, None], 1.0, prec)

        b = -rhs

        def cg_step(_, cg):
            x, rvec, p, rz = cg
            Ap = matvec(p)
            pAp = jnp.sum(p * Ap)
            alpha = jnp.where(pAp > 1e-20, rz / pAp, 0.0)
            x = x + alpha * p
            rvec = rvec - alpha * Ap
            z = prec * rvec
            rz_new = jnp.sum(rvec * z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, rvec, p, rz_new)

        x0 = jnp.zeros((P, 6))
        z0 = prec * b
        dp, *_ = jax.lax.fori_loop(
            0, cg_iters, cg_step, (x0, b, z0, jnp.sum(b * z0)))
        dp = dp * keep[:, None]

        # landmark back-substitution: dl = -Hll^-1 (g_l + H_pl^T dp)
        u = jnp.einsum('pnij,pi->pnj', A4, dp)
        y = _segsum(u.reshape(M, 3)[perm], seg_start, seg_end)
        dl = -jnp.einsum('lij,lj->li', Hll_inv, g_l + y)
        dl = jnp.where(lm_valid[:, None], dl, 0.0)

        dR, dt = lie.se3_exp(dp)
        R_new = dR @ R
        t_new = jnp.einsum('pij,pj->pi', dR, t) + dt
        lm_new = lm + dl

        _, c_old = cost_of(R, t, lm)
        _, c_new = cost_of(R_new, t_new, lm_new)
        better = c_new < c_old
        R = jnp.where(better, R_new, R)
        t = jnp.where(better, t_new, t)
        lm = jnp.where(better, lm_new, lm)
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-8, 1e8)
        return (R, t, lm, lam)

    carry = (R0, t0, lm0, jnp.asarray(1e-4))
    R, t, lm, _ = jax.lax.fori_loop(0, iters, lm_iter, carry)
    c, total = cost_of(R, t, lm)
    inlier = base_valid & (c <= CHI2_MONO)
    return ba_ops.BAResult(R, t, lm, inlier, total)
