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

def _make_pcg_iter(pose_fixed, lm_valid, cam, obs_kf, obs_lm, obs_xy,
                   obs_valid, obs_info, P, L, M, N,
                   cg_iters: int, robust: bool, delta: float):
    """Build the (lm_iter, cost_of, base_valid) closures of the Schur-free
    PCG LM solve over a fixed observation problem. Shared by the one-shot
    ba_solve_pcg and the time-sliced ba_pcg_chunk (async GBA)."""
    info = jnp.ones(M) if obs_info is None else obs_info

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

    return lm_iter, cost_of, base_valid


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
    lm_iter, cost_of, base_valid = _make_pcg_iter(
        pose_fixed, lm_valid, cam, obs_kf, obs_lm, obs_xy, obs_valid,
        obs_info, P, L, M, N, cg_iters, robust, huber_delta)
    carry = (R0, t0, lm0, jnp.asarray(1e-4))
    R, t, lm, _ = jax.lax.fori_loop(0, iters, lm_iter, carry)
    c, total = cost_of(R, t, lm)
    inlier = base_valid & (c <= CHI2_MONO)
    return ba_ops.BAResult(R, t, lm, inlier, total)


@partial(jax.jit, static_argnames=("iters", "cg_iters", "robust"))
def ba_pcg_chunk(carry, pose_fixed, lm_valid, cam,
                 obs_kf, obs_lm, obs_xy, obs_valid, obs_info=None,
                 iters: int = 2, cg_iters: int = 40, robust: bool = True,
                 huber_delta: float = CHI2_MONO ** 0.5):
    """Run `iters` LM iterations of the PCG solve and return the carry
    (R, t, lm, lam) — the time-sliced global-BA step. The caller spreads a
    full GBA across keyframe intervals instead of paying one
    multi-hundred-ms program inline (the reference runs GBA on a concurrent
    thread and aborts it on interruption, src/LoopClosing.cc:1199-1207
    mbStopGBA; slicing is the single-device equivalent: bounded chunks
    between frames, weld-back at the end)."""
    R0, t0, lm0, lam = carry
    P = R0.shape[0]
    L = lm0.shape[0]
    M = obs_kf.shape[0]
    N = M // P
    lm_iter, _, _ = _make_pcg_iter(
        pose_fixed, lm_valid, cam, obs_kf, obs_lm, obs_xy, obs_valid,
        obs_info, P, L, M, N, cg_iters, robust, huber_delta)
    return jax.lax.fori_loop(0, iters, lm_iter, (R0, t0, lm0, lam))


# ---------------------------------------------------------------------------
# Full (whole-map) visual-inertial BA
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iters", "cg_iters", "robust",
                                   "full_info"))
def full_inertial_ba(R0, t0, v0, bg0, ba0, pose_fixed, lm0, lm_valid, cam,
                     obs_lm, obs_xy, obs_valid, preints, edge_valid,
                     calib: imu_ops.ImuCalib,
                     prior_g: float = 0.0, prior_a: float = 0.0,
                     iters: int = 8, cg_iters: int = 50,
                     robust: bool = True, full_info: bool = True):
    """Whole-map visual-inertial BA (reference: Optimizer::FullInertialBA
    src/Optimizer.cc:392 — all keyframes' 15-DoF states + all landmarks,
    EdgeInertial chain between consecutive keyframes, EdgePriorGyro/Acc with
    staged weights (priorG, priorA) during IMU initialization,
    src/LocalMapping.cc:183-233).

    States are in TEMPORAL order (slot i+1 follows slot i). Observations are
    keyframe-major: obs_lm [P,N] GLOBAL landmark ids (-1 none), obs_xy
    [P,N,2]. preints: stacked Preintegrated [P-1]; edge_valid [P-1].
    pose_fixed freezes only the POSE dofs (gauge); velocities/biases of
    anchors stay free, as in ops/viba.py.

    Same Schur-free PCG machinery as ba_solve_pcg; the inertial chain and
    bias priors enter the CG matvec as a block-tridiagonal + diagonal term —
    never materializing the [P,P,15,15] reduced system.
    """
    from dani_slam_tpu.ops import viba as viba_ops

    P, N = obs_lm.shape
    L = lm0.shape[0]
    M = P * N
    delta = CHI2_MONO ** 0.5

    obs_kf = jnp.repeat(jnp.arange(P), N)
    olm_flat = jnp.where(obs_valid, obs_lm, 0).reshape(-1)
    ovalid_flat = (obs_valid & (obs_lm >= 0)).reshape(-1)
    oxy_flat = obs_xy.reshape(-1, 2)
    base_valid = ovalid_flat & jnp.take(lm_valid, olm_flat)
    perm, seg_start, seg_end = _landmark_segments(olm_flat, base_valid, L)
    olm_2d = olm_flat.reshape(P, N)

    # inertial edge information: full inverse 9x9 preintegration block +
    # bias-walk diagonal (reference EdgeInertial uses cov.inverse(),
    # src/Optimizer.cc:392-813), shared helper with ops/viba.py
    edge_W = imu_ops.edge_information(preints, calib,
                                      diag_only=not full_info)
    edge_W = edge_W * edge_valid[:, None, None]              # [E,15,15]

    # bias prior information (toward zero, reference EdgePriorGyro/Acc)
    prior_diag = jnp.concatenate([
        jnp.zeros(9), jnp.full(3, prior_g), jnp.full(3, prior_a)])

    zero15 = jnp.zeros(15)

    def edge_parts(R, t, v, bg, ba_):
        def one(i):
            p = jax.tree_util.tree_map(lambda a: a[i], preints)
            args = (R[i], t[i], v[i], bg[i], ba_[i], R[i + 1], t[i + 1],
                    v[i + 1], bg[i + 1], ba_[i + 1], p, calib.R_bc,
                    calib.t_bc)
            r_e = viba_ops._imu_edge_residual(zero15, zero15, *args)
            Ji = jax.jacfwd(lambda dx: viba_ops._imu_edge_residual(
                dx, zero15, *args))(zero15)
            Jj = jax.jacfwd(lambda dx: viba_ops._imu_edge_residual(
                zero15, dx, *args))(zero15)
            return r_e, Ji, Jj
        return jax.vmap(one)(jnp.arange(P - 1))

    def vis_cost(R, t, lm):
        r, _, _ = ba_ops._residuals(R, t, cam, lm, obs_kf, olm_flat,
                                    oxy_flat)
        c = jnp.sum(r * r, axis=-1)
        rho = ba_ops._rho(c, delta) if robust else c
        return c, jnp.sum(jnp.where(base_valid, rho, 0.0))

    def total_cost(R, t, v, bg, ba_, lm):
        _, cv = vis_cost(R, t, lm)
        r_e, _, _ = edge_parts(R, t, v, bg, ba_)
        ci = jnp.einsum('ek,ekl,el->', r_e, edge_W, r_e)
        cp = jnp.sum((bg * bg) * prior_g + (ba_ * ba_) * prior_a)
        return cv + ci + cp

    def lm_iter(_, carry):
        R, t, v, bg, ba_, lm, lam = carry

        # ---- visual blocks (pose sub-block only) ----
        r, Jpose, Jpt = ba_ops._residuals(R, t, cam, lm, obs_kf, olm_flat,
                                          oxy_flat)
        c = jnp.sum(r * r, axis=-1)
        w = ba_ops._robust_w(c, delta) if robust else jnp.ones_like(c)
        w = jnp.where(base_valid, w, 0.0)
        A = jnp.einsum('mki,mk,mkj->mij', Jpose,
                       jnp.broadcast_to(w[:, None], (M, 2)), Jpt)
        JtJ_p = jnp.einsum('mik,m,mil->mkl', Jpose, w, Jpose)
        JtJ_l = jnp.einsum('mik,m,mil->mkl', Jpt, w, Jpt)
        g_p_m = jnp.einsum('mik,m,mi->mk', Jpose, w, r)
        g_l_m = jnp.einsum('mik,m,mi->mk', Jpt, w, r)
        H_pp = JtJ_p.reshape(P, N, 6, 6).sum(1)
        g_p6 = g_p_m.reshape(P, N, 6).sum(1)
        H_ll = _segsum(JtJ_l.reshape(M, 9)[perm], seg_start,
                       seg_end).reshape(L, 3, 3)
        g_l = _segsum(g_l_m[perm], seg_start, seg_end)
        H_ll_d = H_ll + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_ll))
                         + 1e-8 * jnp.eye(3))
        Hll_inv = ba_ops._inv3x3(H_ll_d)
        A4 = A.reshape(P, N, 6, 3)

        # ---- inertial blocks ----
        r_e, Ji, Jj = edge_parts(R, t, v, bg, ba_)
        We = edge_W                                           # [E,15,15]

        # gauge mask: pose dofs of fixed states
        keep = jnp.ones((P, 15)).at[:, :6].set(
            jnp.broadcast_to((~pose_fixed).astype(jnp.float32)[:, None],
                             (P, 6)))

        # gradient (rhs)
        hg = jnp.einsum('lij,lj->li', Hll_inv, g_l)
        rhs6 = g_p6 - jnp.einsum('pnij,pnj->pni', A4, hg[olm_2d]).sum(1)
        rhs = jnp.zeros((P, 15)).at[:, :6].set(rhs6)
        rhs = rhs.at[:-1].add(jnp.einsum('eki,ekl,el->ei', Ji, We, r_e))
        rhs = rhs.at[1:].add(jnp.einsum('eki,ekl,el->ei', Jj, We, r_e))
        rhs = rhs + prior_diag * jnp.concatenate(
            [jnp.zeros((P, 9)), bg, ba_], axis=1)
        rhs = rhs * keep

        # damped diagonal for the preconditioner + LM damping in matvec
        diag_v = jnp.zeros((P, 15)).at[:, :6].set(
            jax.vmap(jnp.diag)(H_pp))
        diag_i = (jnp.zeros((P, 15))
                  .at[:-1].add(jnp.einsum('eki,ekl,eli->ei', Ji, We, Ji))
                  .at[1:].add(jnp.einsum('eki,ekl,eli->ei', Jj, We, Jj)))
        diag_all = diag_v + diag_i + prior_diag
        diag_damped = diag_all * (1.0 + lam) + 1e-6
        prec = jnp.where(keep > 0, 1.0 / jnp.clip(diag_damped, 1e-8, None),
                         1.0)

        def matvec(x):
            x = x * keep
            x6 = x[:, :6]
            u = jnp.einsum('pnij,pi->pnj', A4, x6)
            y = _segsum(u.reshape(M, 3)[perm], seg_start, seg_end)
            z = jnp.einsum('lij,lj->li', Hll_inv, y)
            w2 = jnp.einsum('pnij,pnj->pni', A4, z[olm_2d]).sum(1)
            Sx6 = jnp.einsum('pij,pj->pi', H_pp, x6) - w2
            Sx = jnp.zeros((P, 15)).at[:, :6].set(Sx6)
            ve = (jnp.einsum('eij,ej->ei', Ji, x[:-1]) +
                  jnp.einsum('eij,ej->ei', Jj, x[1:]))
            wve = jnp.einsum('ekl,el->ek', We, ve)
            Sx = Sx.at[:-1].add(jnp.einsum('eij,ei->ej', Ji, wve))
            Sx = Sx.at[1:].add(jnp.einsum('eij,ei->ej', Jj, wve))
            Sx = Sx + prior_diag * x
            # LM damping on the (approximate) diagonal
            Sx = Sx + (lam * diag_all + 1e-6) * x
            return Sx * keep + x * (1.0 - keep)

        b = -rhs

        def cg_step(_, cg):
            x, rvec, pv, rz = cg
            Ap = matvec(pv)
            pAp = jnp.sum(pv * Ap)
            alpha = jnp.where(pAp > 1e-20, rz / pAp, 0.0)
            x = x + alpha * pv
            rvec = rvec - alpha * Ap
            z = prec * rvec
            rz_new = jnp.sum(rvec * z)
            beta = jnp.where(rz > 1e-20, rz_new / rz, 0.0)
            return (x, rvec, z + beta * pv, rz_new)

        x0 = jnp.zeros((P, 15))
        z0 = prec * b
        dx, *_ = jax.lax.fori_loop(0, cg_iters, cg_step,
                                   (x0, b, z0, jnp.sum(b * z0)))
        dx = dx * keep

        # landmark back-substitution
        u = jnp.einsum('pnij,pi->pnj', A4, dx[:, :6])
        y = _segsum(u.reshape(M, 3)[perm], seg_start, seg_end)
        dl = -jnp.einsum('lij,lj->li', Hll_inv, g_l + y)
        dl = jnp.where(lm_valid[:, None], dl, 0.0)

        dR, dt = lie.se3_exp(dx[:, :6])
        cand = (dR @ R, jnp.einsum('pij,pj->pi', dR, t) + dt,
                v + dx[:, 6:9], bg + dx[:, 9:12], ba_ + dx[:, 12:15],
                lm + dl)
        better = total_cost(*cand) < total_cost(R, t, v, bg, ba_, lm)
        pick = lambda a, b_: jnp.where(better, a, b_)
        out = tuple(pick(a, b_) for a, b_ in zip(
            cand, (R, t, v, bg, ba_, lm)))
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-8, 1e8)
        return (*out, lam)

    carry = (R0, t0, v0, bg0, ba0, lm0, jnp.asarray(1e-4))
    R, t, v, bg, ba_, lm, _ = jax.lax.fori_loop(0, iters, lm_iter, carry)
    from dani_slam_tpu.ops.viba import VIBAResult
    return VIBAResult(R, t, v, bg, ba_, lm,
                      total_cost(R, t, v, bg, ba_, lm))
