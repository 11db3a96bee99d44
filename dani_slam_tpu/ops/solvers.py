"""Motion-only pose optimization: damped Gauss-Newton (LM) on SE(3).

Semantics of the reference's Optimizer::PoseOptimization
(src/Optimizer.cc:814-1110): minimize robust reprojection error of the
current frame's landmark matches over the 6-DoF pose, 4 rounds x 10
iterations, Huber delta = sqrt(5.991) mono / sqrt(7.815) stereo, chi-square
outlier re-classification between rounds (outliers excluded from the next
round but re-tested every round), robust kernel dropped in later rounds.

TPU-first re-design: g2o builds a graph of unary edges and runs sequential
LM; here the normal equations are two reductions over padded fixed-size
arrays — H = sum_i w_i J_i^T J_i (6x6), b = sum_i w_i J_i^T r_i — computed
as batched einsums (MXU), with the LM loop as lax.fori_loop carrying
(pose, lambda). No host round-trips inside the solve; the whole 4-round
schedule is one XLA program. Under vmap this optimizes many frames at once
(used by relocalization candidate ranking).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie
from dani_slam_tpu.ops import linalg as dla

CHI2_MONO = 5.991       # 2-DoF 95% (Optimizer.cc:852)
CHI2_STEREO = 7.815     # 3-DoF 95% (Optimizer.cc:853)


class PoseOptResult(NamedTuple):
    R: jax.Array          # (3,3) optimized T_cw rotation
    t: jax.Array          # (3,)
    inliers: jax.Array    # [N] bool
    n_inliers: jax.Array  # [] int32
    chi2: jax.Array       # [] final robust cost


def _residuals_jac(R, t, cam, pts_w, obs_xy):
    """Reprojection residuals r [N,2] and Jacobian J [N,2,6] wrt a LEFT
    increment xi: T <- exp(xi) T  (d pc/d xi = [I | -hat(pc)])."""
    pc = jnp.einsum('ij,nj->ni', R, pts_w) + t
    proj = _cam.project(cam, pc)
    r = proj - obs_xy
    Jp = _cam.project_jac(cam, pc)                  # [N,2,3]
    Jx = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3), pc.shape[:1] + (3, 3)),
        -lie.hat(pc)], axis=-1)                     # [N,3,6]
    J = jnp.einsum('nij,njk->nik', Jp, Jx)          # [N,2,6]
    return r, J


def _depth_residual(R, t, pts_w, obs_depth):
    """Optional depth residual (RGB-D/stereo): r_z = z - d_obs, J [N,1,6].
    The reference folds RGB-D into a virtual right-coordinate stereo residual
    (u_r = u - fx*b/z, Frame::ComputeStereoFromRGBD src/Frame.cc:918); a
    direct depth residual carries the same information with one fewer
    projection and conditions better on TPU f32. Keypoints with no depth
    reading (inf — common in stereo where matching is partial) contribute a
    zero residual, NOT an infinite one."""
    pc = jnp.einsum('ij,nj->ni', R, pts_w) + t
    have = jnp.isfinite(obs_depth)
    r = jnp.where(have, pc[:, 2] - jnp.where(have, obs_depth, 0.0),
                  0.0)[:, None]
    Jx = jnp.concatenate([jnp.broadcast_to(jnp.eye(3), pc.shape[:1] + (3, 3)),
                          -lie.hat(pc)], axis=-1)
    J = jnp.where(have[:, None, None], Jx[:, 2:3, :], 0.0)
    return r, J


@partial(jax.jit,
         static_argnames=("rounds", "iters_per_round", "use_depth"))
def pose_optimize(R0, t0, cam, pts_w, obs_xy, mask,
                  inv_sigma2=None, obs_depth=None, depth_inv_sigma2=1.0,
                  rounds: int = 4, iters_per_round: int = 10,
                  use_depth: bool = False) -> PoseOptResult:
    """Motion-only LM solve. pts_w [N,3] world landmarks, obs_xy [N,2]
    observations, mask [N] valid-match flags.

    inv_sigma2 [N]: per-observation information (octave-dependent in the
    reference; 1.0 for single-level SuperPoint). obs_depth [N]: measured
    depth (use_depth=True enables the RGB-D residual, chi2 gate moves to
    the 3-DoF threshold as in the reference's stereo edges).
    """
    N = pts_w.shape[0]
    w_info = jnp.ones(N) if inv_sigma2 is None else inv_sigma2
    chi2_th = CHI2_STEREO if use_depth else CHI2_MONO
    delta = jnp.sqrt(chi2_th)

    def chi2_of(R, t, inl, robust=False):
        r, _ = _residuals_jac(R, t, cam, pts_w, obs_xy)
        c = jnp.sum(r * r, axis=-1) * w_info
        if use_depth:
            rd, _ = _depth_residual(R, t, pts_w, obs_depth)
            c = c + rd[:, 0] ** 2 * depth_inv_sigma2
        if robust:
            # Huber rho(c): linearize beyond delta so outliers can't veto a
            # good robust step in the LM accept test
            sq = jnp.sqrt(jnp.maximum(c, 1e-12))
            rho = jnp.where(sq <= delta, c, 2 * delta * sq - delta * delta)
        else:
            rho = c
        return c, jnp.sum(jnp.where(inl, rho, 0.0))

    def lm_iter(carry, robust):
        R, t, lam, inl = carry
        r, J = _residuals_jac(R, t, cam, pts_w, obs_xy)
        c = jnp.sum(r * r, axis=-1) * w_info
        if use_depth:
            rd, Jd = _depth_residual(R, t, pts_w, obs_depth)
            c = c + rd[:, 0] ** 2 * depth_inv_sigma2

        # Huber on the chi2 (matches g2o robust kernel on squared error)
        if robust:
            sqrt_c = jnp.sqrt(jnp.maximum(c, 1e-12))
            w_rob = jnp.where(sqrt_c <= delta, 1.0, delta / sqrt_c)
        else:
            w_rob = jnp.ones_like(c)
        w = jnp.where(inl & mask, w_rob * w_info, 0.0)

        H = jnp.einsum('nik,n,nil->kl', J, w, J)
        b = jnp.einsum('nik,n,ni->k', J, w, r)
        if use_depth:
            wd = jnp.where(inl & mask, w_rob * depth_inv_sigma2, 0.0)
            H = H + jnp.einsum('nik,n,nil->kl', Jd, wd, Jd)
            b = b + jnp.einsum('nik,n,ni->k', Jd, wd, rd)

        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
        # unrolled Cholesky, not linalg.solve: the LU custom call is
        # latency-bound on TPU and this sits in a 4x10-iteration chain
        dx = -dla.chol_solve(Hd, b)
        dR, dt = lie.se3_exp(dx)
        R_new = dR @ R
        t_new = dR @ t + dt

        # cost_old from the residuals already computed at iteration start
        # (a third full residual evaluation per iteration is pure waste)
        if robust:
            sq_c = jnp.sqrt(jnp.maximum(c, 1e-12))
            rho_c = jnp.where(sq_c <= delta, c, 2 * delta * sq_c - delta * delta)
        else:
            rho_c = c
        cost_old = jnp.sum(jnp.where(inl & mask, rho_c, 0.0))
        _, cost_new = chi2_of(R_new, t_new, inl & mask, robust)
        better = cost_new < cost_old
        R = jnp.where(better, R_new, R)
        t = jnp.where(better, t_new, t)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        # converged when an ACCEPTED step barely moved the pose (a rejected
        # step keeps iterating with a stiffer damping)
        done = better & (jnp.sum(dx * dx) < 1e-12)
        return (R, t, lam, inl), done

    R, t = R0, t0
    inl = mask
    for rd_i in range(rounds):
        robust = rd_i < 2  # reference drops the kernel in later rounds

        # early-exit LM loop: the 10-iteration cap is worst-case; typical
        # frames converge in 2-4 steps, and on TPU the loop body is
        # latency-bound (long chain of small fused ops), so exiting early
        # cuts the per-frame solve time proportionally
        def cond_fn(s):
            i, _, done = s
            return (i < iters_per_round) & ~done

        def body_fn(s, robust=robust):
            i, cc, _ = s
            cc2, done = lm_iter(cc, robust)
            return (i + 1, cc2, done)

        carry = (R, t, jnp.asarray(1e-3), inl)
        _, carry, _ = jax.lax.while_loop(
            cond_fn, body_fn, (jnp.asarray(0), carry, jnp.asarray(False)))
        R, t, _, _ = carry
        # re-classify ALL masked obs (outliers can come back)
        c, _ = chi2_of(R, t, mask)
        inl = mask & (c <= chi2_th)

    c, total = chi2_of(R, t, inl)
    return PoseOptResult(R, t, inl, jnp.sum(inl.astype(jnp.int32)), total)


# ---------------------------------------------------------------------------
# Visual-inertial motion-only optimization
# (reference: Optimizer::PoseInertialOptimizationLastKeyFrame
#  src/Optimizer.cc:4491 / ...LastFrame:4875 — optimize the current frame's
#  15-DoF state [pose, velocity, biases] against reprojection edges plus the
#  preintegration edge to the previous (fixed) state and bias random-walk.)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iters", "use_depth"))
def pose_inertial_optimize(R0, t0, v0, bg0, ba0,
                           R_prev, t_prev, v_prev, bg_prev, ba_prev,
                           preint, calib, cam, pts_w, obs_xy, mask,
                           obs_depth=None, use_depth: bool = False,
                           iters: int = 12, info_cap: float = 1e6):
    """Joint 15-DoF solve of the CURRENT frame state; the previous state is
    the fixed anchor (the reference's marginalized prior is approximated by
    anchoring the previous state, whose uncertainty the preintegration edge
    information already reflects). The PRODUCTION tracking refinement is
    pose_inertial_optimize_marginalized (true two-frame Schur prior); this
    anchored variant is retained as the tests' comparison oracle for it.
    Returns (R, t, v, bg, ba, inliers, n_inliers)."""
    from dani_slam_tpu.ops import imu as imu_ops

    delta = jnp.sqrt(CHI2_STEREO if use_depth else CHI2_MONO)
    chi2_th = CHI2_STEREO if use_depth else CHI2_MONO

    # info_cap reflects the ANCHOR's uncertainty: the previous state is an
    # estimate, not ground truth (the reference propagates a marginalized
    # prior; anchoring with the raw preintegration information over-trusts
    # the chain and lets velocity noise drag the pose)
    covs = preint.cov[jnp.arange(9), jnp.arange(9)]
    info9 = jnp.clip(1.0 / jnp.maximum(covs, 1e-8), 0.0, info_cap)
    dtp = jnp.maximum(preint.dt, 1e-3)
    info15 = jnp.concatenate([
        info9,
        jnp.full((3,), 1.0 / jnp.maximum(calib.walk_gyro ** 2 * dtp, 1e-12)),
        jnp.full((3,), 1.0 / jnp.maximum(calib.walk_acc ** 2 * dtp, 1e-12))])
    info15 = jnp.clip(info15, 0.0, info_cap)

    def imu_res(dx, R, t, v, bg, ba_):
        dR, dt_ = lie.se3_exp(dx[:6])
        R2 = dR @ R
        t2 = dR @ t + dt_
        v2 = v + dx[6:9]
        bg2 = bg + dx[9:12]
        ba2 = ba_ + dx[12:15]
        # camera-IMU extrinsics: the inertial residual lives on BODY states
        # (reference: ImuCamPose threads Tbc through every inertial edge,
        # include/G2oTypes.h:130)
        Rw, pw = imu_ops.body_from_camera(calib.R_bc, calib.t_bc, R2, t2)
        Rw_p, pw_p = imu_ops.body_from_camera(calib.R_bc, calib.t_bc,
                                              R_prev, t_prev)
        # the preintegration residual is evaluated at the OPTIMIZED bias
        # (bg2/ba2) via the stored first-order bias Jacobians, so the bias
        # sub-block has real gradient from the IMU chain (the reference gets
        # this by optimizing the window-start bias in
        # PoseInertialOptimizationLastFrame, src/Optimizer.cc:4875); the
        # random-walk rows still pull toward the previous estimate.
        r9 = imu_ops.inertial_residual(preint, Rw_p, pw_p, v_prev, Rw, pw,
                                       v2, bg2, ba2)
        return jnp.concatenate([r9, bg2 - bg_prev, ba2 - ba_prev])

    def vis_parts(R, t):
        r, J = _residuals_jac(R, t, cam, pts_w, obs_xy)
        c = jnp.sum(r * r, axis=-1)
        if use_depth:
            rd, Jd = _depth_residual(R, t, pts_w, obs_depth)
            c = c + rd[:, 0] ** 2
            return r, J, rd, Jd, c
        return r, J, None, None, c

    def total_cost(R, t, v, bg, ba_, inl):
        *_, c = vis_parts(R, t)
        sq = jnp.sqrt(jnp.maximum(c, 1e-12))
        rho = jnp.where(sq <= delta, c, 2 * delta * sq - delta ** 2)
        r15 = imu_res(jnp.zeros(15), R, t, v, bg, ba_)
        return (jnp.sum(jnp.where(inl, rho, 0.0)) +
                jnp.sum(r15 * r15 * info15))

    def gn(_, carry):
        R, t, v, bg, ba_, inl, lam = carry
        r, J, rd, Jd, c = vis_parts(R, t)
        w_rob = jnp.where(jnp.sqrt(jnp.maximum(c, 1e-12)) <= delta, 1.0,
                          delta / jnp.sqrt(jnp.maximum(c, 1e-12)))
        w = jnp.where(inl & mask, w_rob, 0.0)
        H = jnp.zeros((15, 15))
        g = jnp.zeros(15)
        H = H.at[:6, :6].add(jnp.einsum('nik,n,nil->kl', J, w, J))
        g = g.at[:6].add(jnp.einsum('nik,n,ni->k', J, w, r))
        if use_depth:
            H = H.at[:6, :6].add(jnp.einsum('nik,n,nil->kl', Jd, w, Jd))
            g = g.at[:6].add(jnp.einsum('nik,n,ni->k', Jd, w, rd))
        r15 = imu_res(jnp.zeros(15), R, t, v, bg, ba_)
        J15 = jax.jacfwd(lambda dx: imu_res(dx, R, t, v, bg, ba_))(
            jnp.zeros(15))
        H = H + jnp.einsum('ki,k,kj->ij', J15, info15, J15)
        g = g + jnp.einsum('ki,k,k->i', J15, info15, r15)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-6 * jnp.eye(15)
        dx = -dla.chol_solve(Hd, g)
        dR, dt_ = lie.se3_exp(dx[:6])
        cand = (dR @ R, dR @ t + dt_, v + dx[6:9], bg + dx[9:12],
                ba_ + dx[12:15])
        better = total_cost(*cand, inl & mask) < total_cost(R, t, v, bg, ba_,
                                                            inl & mask)
        pick = lambda a, b: jnp.where(better, a, b)
        out = tuple(pick(a, b) for a, b in zip(cand, (R, t, v, bg, ba_)))
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-8, 1e6)
        # chi2 reclassification each iteration (reference does it per round)
        *_, c2 = vis_parts(out[0], out[1])
        inl = mask & (c2 <= chi2_th)
        return (*out, inl, lam)

    carry = (R0, t0, v0, bg0, ba0, mask, jnp.asarray(1e-3))
    R, t, v, bg, ba_, inl, _ = jax.lax.fori_loop(0, iters, gn, carry)
    return (lie.orthonormalize(R), t, v, bg, ba_, inl,
            jnp.sum(inl.astype(jnp.int32)))


@partial(jax.jit, static_argnames=("iters", "use_depth"))
def pose_inertial_optimize_marginalized(
        R0, t0, v0, bg0, ba0,
        R_p, t_p, v_p, bg_p, ba_p, prior_info,
        preint, calib, cam, pts_w, obs_xy, mask,
        obs_depth=None, use_depth: bool = False, iters: int = 10):
    """Two-frame visual-inertial solve with a TRUE marginalized prior
    (reference: Optimizer::PoseInertialOptimizationLastFrame
    src/Optimizer.cc:4875 consuming EdgePriorPoseImu include/G2oTypes.h:732,
    produced by Optimizer::Marginalize src/Optimizer.cc:2960).

    The 30-DoF state is [previous frame (15), current frame (15)], each
    15 = [se3 pose (left-increment on T_cw), velocity, gyro bias, acc bias].
    Edges: robust reprojection (+ optional depth) on the CURRENT pose; the
    9-D preintegration residual between the two BODY states weighted by the
    FULL inverse preintegration covariance (not diagonal); bias random walk
    between the two frames; and the 15-D prior on the PREVIOUS state
    (mean = (R_p..ba_p), information = prior_info) carried from the last
    frame's marginalization.

    After convergence the previous-frame block is Schur-marginalized out of
    the 30x30 Gauss-Newton Hessian:  H_prior' = H_cc - H_cp H_pp^-1 H_pc —
    the information the whole past (through this prior chain) carries about
    the current state. PSD is enforced by symmetric eigenvalue clamping, as
    the reference does after Marginalize.

    Returns (R, t, v, bg, ba, inliers, n_inliers, prior_info_next[15,15]).
    """
    from dani_slam_tpu.ops import imu as imu_ops

    delta = jnp.sqrt(CHI2_STEREO if use_depth else CHI2_MONO)
    chi2_th = CHI2_STEREO if use_depth else CHI2_MONO

    # full 9x9 preintegration information (reference EdgeInertial uses
    # cov.inverse(); the diagonal-only variant loses rotation/velocity
    # cross-terms on fast-rotation segments)
    cov9 = preint.cov[:9, :9]
    cov9 = 0.5 * (cov9 + cov9.T) + 1e-10 * jnp.eye(9)
    info9 = dla.chol_inv(cov9)
    info9 = 0.5 * (info9 + info9.T)
    dtp = jnp.maximum(preint.dt, 1e-3)
    rw_info = jnp.concatenate([
        jnp.full((3,), 1.0 / jnp.maximum(calib.walk_gyro ** 2 * dtp, 1e-12)),
        jnp.full((3,), 1.0 / jnp.maximum(calib.walk_acc ** 2 * dtp, 1e-12))])

    def unpack(x, R_b, t_b, v_b, bg_b, ba_b):
        """Apply a 15-D perturbation to a base state (left se3 on pose)."""
        dR, dt_ = lie.se3_exp(x[:6])
        return (dR @ R_b, dR @ t_b + dt_, v_b + x[6:9], bg_b + x[9:12],
                ba_b + x[12:15])

    def imu_res30(x, Rp, tp, vp, bgp, bap, Rc, tc, vc, bgc, bac):
        """Preintegration (9) + bias random walk (6) residuals of the
        30-D perturbation around the given linearization states. The
        preintegration edge is corrected at the PREVIOUS frame's biases
        (reference: EdgeInertial connects VG1/VA1, src/G2oTypes.cc)."""
        Rp2, tp2, vp2, bgp2, bap2 = unpack(x[:15], Rp, tp, vp, bgp, bap)
        Rc2, tc2, vc2, bgc2, bac2 = unpack(x[15:], Rc, tc, vc, bgc, bac)
        Rwp, pwp = imu_ops.body_from_camera(calib.R_bc, calib.t_bc, Rp2, tp2)
        Rwc, pwc = imu_ops.body_from_camera(calib.R_bc, calib.t_bc, Rc2, tc2)
        r9 = imu_ops.inertial_residual(preint, Rwp, pwp, vp2, Rwc, pwc,
                                       vc2, bgp2, bap2)
        return jnp.concatenate([r9, bgc2 - bgp2, bac2 - bap2])

    def prior_res(x15, Rp, tp, vp, bgp, bap):
        """Previous state minus the prior mean, in perturbation coords."""
        Rp2, tp2, vp2, bgp2, bap2 = unpack(x15, Rp, tp, vp, bgp, bap)
        xi = lie.se3_log(*lie.se3_mul(Rp2, tp2, *lie.se3_inv(R_p, t_p)))
        return jnp.concatenate([xi, vp2 - v_p, bgp2 - bg_p, bap2 - ba_p])

    def vis_parts(R, t):
        r, J = _residuals_jac(R, t, cam, pts_w, obs_xy)
        c = jnp.sum(r * r, axis=-1)
        if use_depth:
            rd, Jd = _depth_residual(R, t, pts_w, obs_depth)
            c = c + rd[:, 0] ** 2
            return r, J, rd, Jd, c
        return r, J, None, None, c

    def build_system(Rp, tp, vp, bgp, bap, Rc, tc, vc, bgc, bac, inl):
        """30x30 GN system at the given linearization point."""
        r, J, rd, Jd, c = vis_parts(Rc, tc)
        w_rob = jnp.where(jnp.sqrt(jnp.maximum(c, 1e-12)) <= delta, 1.0,
                          delta / jnp.sqrt(jnp.maximum(c, 1e-12)))
        w = jnp.where(inl & mask, w_rob, 0.0)
        H = jnp.zeros((30, 30))
        g = jnp.zeros(30)
        H = H.at[15:21, 15:21].add(jnp.einsum('nik,n,nil->kl', J, w, J))
        g = g.at[15:21].add(jnp.einsum('nik,n,ni->k', J, w, r))
        if use_depth:
            H = H.at[15:21, 15:21].add(jnp.einsum('nik,n,nil->kl', Jd, w,
                                                  Jd))
            g = g.at[15:21].add(jnp.einsum('nik,n,ni->k', Jd, w, rd))
        lin = (Rp, tp, vp, bgp, bap, Rc, tc, vc, bgc, bac)
        r15 = imu_res30(jnp.zeros(30), *lin)
        J30 = jax.jacfwd(lambda x: imu_res30(x, *lin))(jnp.zeros(30))
        H = H + J30[:9].T @ info9 @ J30[:9] \
              + jnp.einsum('ki,k,kj->ij', J30[9:], rw_info, J30[9:])
        g = g + J30[:9].T @ info9 @ r15[:9] \
              + jnp.einsum('ki,k,k->i', J30[9:], rw_info, r15[9:])
        rp = prior_res(jnp.zeros(15), Rp, tp, vp, bgp, bap)
        Jp = jax.jacfwd(lambda x: prior_res(x, Rp, tp, vp, bgp, bap))(
            jnp.zeros(15))
        H = H.at[:15, :15].add(Jp.T @ prior_info @ Jp)
        g = g.at[:15].add(Jp.T @ prior_info @ rp)
        return H, g

    def total_cost(states, inl):
        """Returns (cost, per-observation chi2) — callers reuse the chi2
        for inlier reclassification instead of a third vis_parts pass."""
        Rp, tp, vp, bgp, bap, Rc, tc, vc, bgc, bac = states
        *_, c = vis_parts(Rc, tc)
        sq = jnp.sqrt(jnp.maximum(c, 1e-12))
        rho = jnp.where(sq <= delta, c, 2 * delta * sq - delta ** 2)
        lin = (Rp, tp, vp, bgp, bap, Rc, tc, vc, bgc, bac)
        r15 = imu_res30(jnp.zeros(30), *lin)
        rp = prior_res(jnp.zeros(15), Rp, tp, vp, bgp, bap)
        return (jnp.sum(jnp.where(inl & mask, rho, 0.0)) +
                r15[:9] @ info9 @ r15[:9] +
                jnp.sum(r15[9:] ** 2 * rw_info) +
                rp @ prior_info @ rp), c

    def gn(_, carry):
        states, inl, lam = carry
        H, g = build_system(*states, inl)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-6 * jnp.eye(30)
        dx = -dla.chol_solve(Hd, g)
        cand = (*unpack(dx[:15], *states[:5]),
                *unpack(dx[15:], *states[5:]))
        cost_cand, c_cand = total_cost(cand, inl)
        cost_old, c_old = total_cost(states, inl)
        better = cost_cand < cost_old
        pick = lambda a, b: jnp.where(better, a, b)
        states = tuple(pick(a, b) for a, b in zip(cand, states))
        lam = jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-8, 1e6)
        # reclassify on the ACCEPTED state's residuals (already computed)
        c2 = jnp.where(better, c_cand, c_old)
        inl = mask & (c2 <= chi2_th)
        return states, inl, lam

    states0 = (R_p, t_p, v_p, bg_p, ba_p, R0, t0, v0, bg0, ba0)
    states, inl, _ = jax.lax.fori_loop(
        0, iters, gn, (states0, mask, jnp.asarray(1e-3)))

    # --- Schur marginalization of the previous-frame block ----------------
    H, _ = build_system(*states, inl)
    Hpp = H[:15, :15] + 1e-9 * jnp.eye(15)
    Hcp = H[15:, :15]
    H_next = H[15:, 15:] - Hcp @ dla.chol_inv(Hpp) @ Hcp.T
    H_next = 0.5 * (H_next + H_next.T)
    evals, evecs = jnp.linalg.eigh(H_next)
    H_next = (evecs * jnp.maximum(evals, 0.0)) @ evecs.T

    Rc, tc, vc, bgc, bac = states[5:]
    return (lie.orthonormalize(Rc), tc, vc, bgc, bac, inl,
            jnp.sum(inl.astype(jnp.int32)), H_next)


# ---------------------------------------------------------------------------
# Horn alignment (closed-form absolute orientation) — used by Sim3Solver
# RANSAC (src/Sim3Solver.cc:316-380) and by ATE evaluation.
# ---------------------------------------------------------------------------

def horn_align(P: jax.Array, Q: jax.Array, w: jax.Array | None = None,
               with_scale: bool = False):
    """Find (R, t, s) minimizing ||Q - (s R P + t)||^2. P,Q: [N,3].
    Batched-friendly closed form via SVD of the weighted cross-covariance."""
    if w is None:
        w = jnp.ones(P.shape[:-1])
    wsum = jnp.sum(w, axis=-1, keepdims=True).clip(1e-9)
    wp = (w / wsum[..., 0:1])[..., None]
    mu_p = jnp.sum(P * wp, axis=-2)
    mu_q = jnp.sum(Q * wp, axis=-2)
    Pc = P - mu_p[..., None, :]
    Qc = Q - mu_q[..., None, :]
    S = jnp.einsum('...ni,...n,...nj->...ij', Qc, w, Pc)
    U, D, Vt = jnp.linalg.svd(S)
    det = jnp.linalg.det(U @ Vt)
    E = jnp.zeros_like(U).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    E = E.at[..., 2, 2].set(det)
    R = U @ E @ Vt
    if with_scale:
        num = jnp.sum(D * jnp.concatenate(
            [jnp.ones_like(D[..., :2]), det[..., None]], axis=-1), axis=-1)
        den = jnp.einsum('...ni,...n,...ni->...', Pc, w, Pc).clip(1e-12)
        s = num / den
    else:
        s = jnp.ones(P.shape[:-2])
    t = mu_q - s[..., None] * jnp.einsum('...ij,...j->...i', R, mu_p)
    return R, t, s
