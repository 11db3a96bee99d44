"""Bundle adjustment: batched sparse Gauss-Newton/LM with explicit Schur
complement (landmark elimination).

Replaces the reference's g2o Levenberg-Marquardt machinery
(Thirdparty/g2o BlockSolver_6_3 + Schur, core/block_solver.hpp) and its
call sites: Optimizer::LocalBundleAdjustment (src/Optimizer.cc:1116-1499,
covisible window + fixed observers), BundleAdjustment / GlobalBundleAdjustemnt
(src/Optimizer.cc:52-390), with Huber robust kernels
(delta = sqrt(5.991) mono, core/robust_kernel_impl.cpp).

TPU-first formulation: the bipartite pose-landmark sparsity is handled with
dense fixed-size blocks — at SLAM scale (P <= 32 active poses, L <= 8192
local landmarks) the Schur system is tiny:
    H_pp [P,6,6]   (block-diagonal, scatter-add over observations)
    H_ll [L,3,3]   (block-diagonal, invertible 3x3s in closed form)
    H_pl [P,L,6,3] (dense rectangular block matrix; P*L*18 floats ~ MBs)
    S = H_pp_full - H_pl H_ll^-1 H_pl^T   -> dense (6P,6P) solve
    dl = H_ll^-1 (b_l - H_pl^T dp)        -> back-substitution
All reductions are einsums/scatter-adds (MXU/VPU); the LM loop is
lax.fori_loop with no host round-trips. Observations are a flat padded list
(obs_kf, obs_lm, obs_xy, valid) — the reference's edge list, vectorized.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie
from dani_slam_tpu.ops import linalg as dla

CHI2_MONO = 5.991


class BAResult(NamedTuple):
    R: jax.Array          # [P,3,3]
    t: jax.Array          # [P,3]
    lm_pos: jax.Array     # [L,3]
    obs_inlier: jax.Array  # [M] bool — final chi2 classification
    cost: jax.Array       # [] final robust cost


def _residuals(R, t, cam, lm_pos, obs_kf, obs_lm, obs_xy):
    """r [M,2], J_pose [M,2,6] (left-increment on T_cw), J_pt [M,2,3]."""
    Rk = R[obs_kf]
    tk = t[obs_kf]
    X = lm_pos[obs_lm]
    pc = jnp.einsum('mij,mj->mi', Rk, X) + tk
    r = _cam.project(cam, pc) - obs_xy
    Jp = _cam.project_jac(cam, pc)                     # [M,2,3]
    Jpose = jnp.einsum('mij,mjk->mik', Jp, jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3), pc.shape[:1] + (3, 3)),
        -lie.hat(pc)], axis=-1))                       # [M,2,6]
    Jpt = jnp.einsum('mij,mjk->mik', Jp, Rk)           # [M,2,3]
    return r, Jpose, Jpt


def _inv3x3(A):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([jnp.stack([A11, A12, A13], -1),
                     jnp.stack([A21, A22, A23], -1),
                     jnp.stack([A31, A32, A33], -1)], -2)
    return adj / det[..., None, None]


def _robust_w(c, delta):
    sq = jnp.sqrt(jnp.maximum(c, 1e-12))
    return jnp.where(sq <= delta, 1.0, delta / sq)


def _rho(c, delta):
    sq = jnp.sqrt(jnp.maximum(c, 1e-12))
    return jnp.where(sq <= delta, c, 2 * delta * sq - delta * delta)


@partial(jax.jit, static_argnames=("iters", "robust"))
def ba_solve(R0, t0, pose_fixed, lm0, lm_valid, cam,
             obs_kf, obs_lm, obs_xy, obs_valid, obs_info=None,
             iters: int = 10, robust: bool = True,
             huber_delta: float = CHI2_MONO ** 0.5) -> BAResult:
    """Joint pose+landmark LM solve.

    R0,t0: [P,...] initial T_cw poses. pose_fixed [P] bool: gauge/anchor
    poses excluded from the update (reference: fixed observer KFs and KF 0,
    src/Optimizer.cc:1220-1260). lm0 [L,3] initial landmark positions,
    lm_valid [L]. Observations are padded flat lists in KEYFRAME-MAJOR
    order — obs_kf MUST equal repeat(arange(P), N) for some N (the natural
    layout of the MapState observation table). This makes the pose-block
    reductions pure reshape-sums and the landmark-block reductions one-hot
    matmuls on the MXU; TPU scatter-adds (sequential, ~0.5 us/row — 60 ms
    per local-BA solve at SLAM sizes) never appear.
    """
    P = R0.shape[0]
    L = lm0.shape[0]
    M = obs_kf.shape[0]
    N = M // P
    info = jnp.ones(M) if obs_info is None else obs_info
    delta = huber_delta

    obs_kf = jnp.where(obs_valid, obs_kf, 0)
    obs_lm = jnp.where(obs_valid, obs_lm, 0)
    base_valid = obs_valid & jnp.take(lm_valid, obs_lm)

    # Landmark-block reduction strategy: on TPU the Pallas kernel
    # (pallas_kernels.lba_landmark_blocks) generates indicator tiles in
    # VMEM from the [P,N] id table — the XLA one-hot materializes
    # [P,N,L] (~134 MB f32 at production caps) in HBM and streams it
    # every LM iteration, the dominant traffic of the local-BA solve.
    row_lm = obs_lm.reshape(P, N)
    row_ok = base_valid.reshape(P, N)
    use_kernel = (jax.default_backend() == "tpu" and
                  L % 256 == 0 and N % 128 == 0)
    if use_kernel:
        ids2d = jnp.where(row_ok, row_lm, -1).astype(jnp.int32)
    else:
        onehot = ((row_lm[:, :, None] ==
                   jnp.arange(L, dtype=row_lm.dtype)[None, None, :]) &
                  row_ok[:, :, None]).astype(jnp.float32)

    def cost_of(R, t, lm, w_sel):
        r, _, _ = _residuals(R, t, cam, lm, obs_kf, obs_lm, obs_xy)
        c = jnp.sum(r * r, axis=-1) * info
        return c, jnp.sum(jnp.where(w_sel, _rho(c, delta) if robust else c,
                                    0.0))

    def lm_iter(carry):
        # Deferred accept/reject: each iteration evaluates residuals ONCE,
        # at the point proposed by the previous iteration. If the proposal
        # did not reduce the cost, fall back to the previous point's CACHED
        # residuals/Jacobians and retry from there with stiffer damping —
        # one projection+Jacobian pass per LM iteration instead of two
        # (the classic "evaluate-at-next-iterate" LM scheduling).
        (R, t, lm, lam, Rp, tp, lmp, rp, Jpp, Jlp, cp, have_prev) = carry
        r, Jpose, Jpt = _residuals(R, t, cam, lm, obs_kf, obs_lm, obs_xy)
        c = jnp.sum(r * r, axis=-1) * info
        c_tot = jnp.sum(jnp.where(base_valid,
                                  _rho(c, delta) if robust else c, 0.0))
        better = ~have_prev | (c_tot < cp)
        # base point for this iteration's step
        R = jnp.where(better, R, Rp)
        t = jnp.where(better, t, tp)
        lm = jnp.where(better, lm, lmp)
        r = jnp.where(better, r, rp)
        Jpose = jnp.where(better, Jpose, Jpp)
        Jpt = jnp.where(better, Jpt, Jlp)
        c = jnp.sum(r * r, axis=-1) * info
        c_base = jnp.where(better, c_tot, cp)
        lam = jnp.clip(jnp.where(have_prev,
                                 jnp.where(better, lam * 0.5, lam * 4.0),
                                 lam), 1e-8, 1e8)
        w = (_robust_w(c, delta) if robust else jnp.ones_like(c)) * info
        w = jnp.where(base_valid, w, 0.0)

        JtJ_p = jnp.einsum('mik,m,mil->mkl', Jpose, w, Jpose)   # [M,6,6]
        JtJ_l = jnp.einsum('mik,m,mil->mkl', Jpt, w, Jpt)       # [M,3,3]
        JtJ_pl = jnp.einsum('mik,m,mil->mkl', Jpose, w, Jpt)    # [M,6,3]
        b_p = jnp.einsum('mik,m,mi->mk', Jpose, w, r)           # [M,6]
        b_l = jnp.einsum('mik,m,mi->mk', Jpt, w, r)             # [M,3]

        # pose blocks: kf-major layout -> plain reshape-sum over N
        H_pp = JtJ_p.reshape(P, N, 6, 6).sum(1)
        g_p = b_p.reshape(P, N, 6).sum(1)
        if use_kernel:
            from dani_slam_tpu.ops import pallas_kernels as pk
            vals = jnp.concatenate([
                JtJ_l.reshape(P, N, 9), b_l.reshape(P, N, 3),
                JtJ_pl.reshape(P, N, 18)], axis=-1)
            H_ll, g_l, H_pl = pk.lba_landmark_blocks(ids2d, vals, L)
        else:
            # landmark blocks: one-hot matmuls (MXU), no scatter; f32
            # products (one-hot entries are exact 0/1, JtJ stays full
            # precision). HIGH (3-pass bf16, ~f32 accurate) for the big
            # one-hot contractions: at "highest" these 134 MB operands
            # run 6 passes
            hp = jax.lax.Precision.HIGH
            H_ll = jnp.einsum('pnl,pnij->lij', onehot,
                              JtJ_l.reshape(P, N, 3, 3), precision=hp,
                              preferred_element_type=jnp.float32)
            H_pl = jnp.einsum('pnl,pnik->plik', onehot,
                              JtJ_pl.reshape(P, N, 6, 3), precision=hp,
                              preferred_element_type=jnp.float32)
            g_l = jnp.einsum('pnl,pnk->lk', onehot,
                             b_l.reshape(P, N, 3), precision=hp,
                             preferred_element_type=jnp.float32)

        # damping
        H_pp = H_pp + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_pp))
                       + 1e-8 * jnp.eye(6))
        H_ll = H_ll + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_ll))
                       + 1e-8 * jnp.eye(3))

        # landmark block inverse — closed-form adjugate (batched
        # jnp.linalg.inv lowers to LU, orders of magnitude slower on TPU
        # for [L,3,3] stacks)
        Hll_inv = _inv3x3(H_ll)                                 # [L,3,3]

        # Schur: S = H_pp - sum_l H_pl Hll^-1 H_pl^T  (per pose-pair block)
        # W[p,l] = H_pl[p,l] @ Hll_inv[l]   [P,L,6,3]
        W = jnp.einsum('plik,lkj->plij', H_pl, Hll_inv)
        S_off = jnp.einsum('plik,qljk->pqij', W, H_pl)          # [P,P,6,6]
        S = -S_off
        S = S.at[jnp.arange(P), jnp.arange(P)].add(H_pp)
        rhs = g_p - jnp.einsum('plij,lj->pi', W, g_l)           # [P,6]

        # gauge handling: fixed poses -> identity rows/cols
        fixm = pose_fixed.astype(S.dtype)
        keep = 1.0 - fixm
        S = S * keep[:, None, None, None] * keep[None, :, None, None]
        S = S.at[jnp.arange(P), jnp.arange(P)].add(
            fixm[:, None, None] * jnp.eye(6))
        rhs = rhs * keep[:, None]

        Sd = S.transpose(0, 2, 1, 3).reshape(6 * P, 6 * P)
        # unrolled Cholesky (ops/linalg.py), not linalg.solve: the LU
        # custom call is latency-bound on TPU and this runs every LM iter
        dp = -dla.chol_solve(Sd, rhs.reshape(-1)).reshape(P, 6)
        dp = dp * keep[:, None]
        # back-substitute landmarks: dl = -Hll^-1 (g_l + H_pl^T dp)
        Hpl_t_dp = jnp.einsum('plik,pi->lk', H_pl, dp)
        dl = -jnp.einsum('lij,lj->li', Hll_inv, g_l + Hpl_t_dp)
        dl = jnp.where(lm_valid[:, None], dl, 0.0)

        dR, dt = lie.se3_exp(dp)
        R_new = dR @ R
        t_new = jnp.einsum('pij,pj->pi', dR, t) + dt
        lm_new = lm + dl

        # the proposal is evaluated (and accepted/rejected) at the START of
        # the next iteration; the base point + its residuals ride the carry.
        # converged when the last proposal was ACCEPTED and the fresh step
        # barely moves (a rejected step keeps iterating, stiffer damping).
        # 1e-4 (0.1 mm / 0.1 mrad): the window re-solves at EVERY keyframe,
        # so steady-state solves start converged and exit after one
        # iteration — at 1e-6 they burned the full budget polishing
        # micrometers (~2.4 ms/iteration of every keyframe program)
        done = (better & have_prev & (jnp.max(jnp.abs(dp)) < 1e-4) &
                (jnp.max(jnp.abs(dl)) < 1e-4))
        return (R_new, t_new, lm_new, lam, R, t, lm, r, Jpose, Jpt,
                c_base, jnp.asarray(True)), done

    def cond_fn(s):
        i, _, done = s
        return (i < iters) & ~done

    def body_fn(s):
        i, cc, _ = s
        cc2, done = lm_iter(cc)
        return (i + 1, cc2, done)

    zeros_r = jnp.zeros((M, 2))
    carry = (R0, t0, lm0, jnp.asarray(1e-4), R0, t0, lm0,
             zeros_r, jnp.zeros((M, 2, 6)), jnp.zeros((M, 2, 3)),
             jnp.asarray(jnp.inf), jnp.asarray(False))
    _, cc, _ = jax.lax.while_loop(
        cond_fn, body_fn, (jnp.asarray(0), carry, jnp.asarray(False)))
    # final accept check: the last proposal was never evaluated
    (R_new, t_new, lm_new, _, Rb, tb, lmb, _, _, _, c_base, _) = cc
    c, total = cost_of(R_new, t_new, lm_new, base_valid)
    better = total < c_base
    R = jnp.where(better, R_new, Rb)
    t = jnp.where(better, t_new, tb)
    lm = jnp.where(better, lm_new, lmb)
    c = jnp.where(better, c, cost_of(Rb, tb, lmb, base_valid)[0])
    # where, not minimum: a NaN proposal (e.g. all-rejected steps on a
    # poisoned problem) must fall back to the base cost, not propagate
    total = jnp.where(better, total, c_base)
    inlier = base_valid & (c <= CHI2_MONO)
    return BAResult(R, t, lm, inlier, total)
