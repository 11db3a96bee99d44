"""Visual-inertial bundle adjustment: joint poses+velocities+biases+landmarks.

Reference: Optimizer::LocalInertialBA (src/Optimizer.cc:2383 — temporal
window of Nd keyframes with VertexPose/VertexVelocity/VertexGyroBias/
VertexAccBias, EdgeMono reprojection + EdgeInertial preintegration +
EdgeGyroRW/EdgeAccRW bias random-walk, fixed previous-KF anchor) and
Optimizer::FullInertialBA (src/Optimizer.cc:392).

TPU formulation: per-keyframe state is a 15-DoF block
    x_k = [dpose(6) | dv(3) | dbg(3) | dba(3)]
Landmarks are Schur-eliminated exactly as in ops/ba.py (reprojection touches
only the pose sub-block); the inertial chain edges connect consecutive
states WITHOUT touching landmarks, so their Gauss-Newton blocks add directly
into the reduced (15P x 15P) system. One dense solve per LM iteration, all
inside a fori_loop.

Conventions: poses are camera-from-world T_cw with the world gravity-aligned
(g = (0,0,-9.81)); body == camera (identity Tbc; extrinsics fold in
upstream). Preintegrations are ops/imu.Preintegrated stacked over the P-1
consecutive pairs.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.ops import linalg as dla
from dani_slam_tpu.core import lie
from dani_slam_tpu.ops import ba as ba_ops
from dani_slam_tpu.ops import imu as imu_ops

CHI2_MONO = 5.991


class VIBAResult(NamedTuple):
    R: jax.Array       # [P,3,3]
    t: jax.Array       # [P,3]
    v: jax.Array       # [P,3]
    bg: jax.Array      # [P,3]
    ba: jax.Array      # [P,3]
    lm_pos: jax.Array  # [L,3]
    cost: jax.Array


def _imu_edge_residual(dx_i, dx_j, Ri, ti, vi, bgi, bai, Rj, tj, vj, bgj,
                       baj, preint, R_bc=None, t_bc=None):
    """15-D residual of one inertial edge under local increments dx (15 each):
    9 preintegration + 3 gyro-walk + 3 acc-walk (reference: EdgeInertial +
    EdgeGyroRW + EdgeAccRW). R_bc/t_bc: camera-IMU extrinsics (body ==
    camera when omitted)."""
    def apply(dx, R, t, v, bg, ba_):
        dR, dt = lie.se3_exp(dx[:6])
        return (dR @ R, dR @ t + dt, v + dx[6:9], bg + dx[9:12],
                ba_ + dx[12:15])

    Ri2, ti2, vi2, bgi2, bai2 = apply(dx_i, Ri, ti, vi, bgi, bai)
    Rj2, tj2, vj2, bgj2, baj2 = apply(dx_j, Rj, tj, vj, bgj, baj)
    # world-from-body states (through Tbc, reference: ImuCamPose)
    if R_bc is None:
        R_bc = jnp.eye(3)
    if t_bc is None:
        t_bc = jnp.zeros(3)
    Rwi, pwi = imu_ops.body_from_camera(R_bc, t_bc, Ri2, ti2)
    Rwj, pwj = imu_ops.body_from_camera(R_bc, t_bc, Rj2, tj2)
    r9 = imu_ops.inertial_residual(preint, Rwi, pwi, vi2, Rwj, pwj, vj2,
                                   bgi2, bai2)
    return jnp.concatenate([r9, bgj2 - bgi2, baj2 - bai2])


@partial(jax.jit, static_argnames=("iters", "robust", "full_info"))
def viba_solve(R0, t0, v0, bg0, ba0, pose_fixed, lm0, lm_valid, cam,
               obs_lm, obs_xy, obs_valid, preints,
               edge_valid, calib: imu_ops.ImuCalib,
               iters: int = 8, robust: bool = True,
               full_info: bool = True) -> VIBAResult:
    """Joint VI solve over a temporal window.

    R0..ba0: [P,...] states in temporal order (slot i+1 follows slot i).
    preints: stacked Preintegrated with leading dim P-1 (pair i -> i+1);
    edge_valid [P-1] masks absent pairs. Observations are keyframe-major:
    obs_lm [P,N] local landmark ids (-1 none), obs_xy [P,N,2], obs_valid.
    """
    P = R0.shape[0]
    L = lm0.shape[0]
    N = obs_lm.shape[1]
    delta = CHI2_MONO ** 0.5

    okf = jnp.repeat(jnp.arange(P), N)
    olm_flat = jnp.where(obs_valid, obs_lm, 0).reshape(-1)
    ovalid_flat = (obs_valid & (obs_lm >= 0)).reshape(-1)
    oxy_flat = obs_xy.reshape(-1, 2)
    base_valid = ovalid_flat & jnp.take(lm_valid, olm_flat)

    onehot = ((jnp.where(obs_valid, obs_lm, -1)[:, :, None] ==
               jnp.arange(L)[None, None, :])).astype(jnp.float32)

    # inertial edge information: FULL inverse of the 9x9 preintegration
    # covariance block + bias-walk diagonal, as one [E,15,15] matrix per
    # edge (reference EdgeInertial uses cov.inverse(); diag_only reproduces
    # the legacy diagonal approximation for A/B tests)
    edge_W = imu_ops.edge_information(preints, calib,
                                      diag_only=not full_info)
    edge_W = edge_W * edge_valid[:, None, None]              # [P-1,15,15]

    def visual_cost(R, t, lm):
        r, _, _ = ba_ops._residuals(R, t, cam, lm, okf, olm_flat, oxy_flat)
        c = jnp.sum(r * r, axis=-1)
        rho = ba_ops._rho(c, delta) if robust else c
        return c, jnp.sum(jnp.where(base_valid, rho, 0.0))

    def imu_cost(R, t, v, bg, ba_):
        def one(i):
            p = jax.tree_util.tree_map(lambda a: a[i], preints)
            r = _imu_edge_residual(
                jnp.zeros(15), jnp.zeros(15), R[i], t[i], v[i], bg[i],
                ba_[i], R[i + 1], t[i + 1], v[i + 1], bg[i + 1], ba_[i + 1],
                p, calib.R_bc, calib.t_bc)
            return r @ (edge_W[i] @ r)
        return jnp.sum(jax.vmap(one)(jnp.arange(P - 1)))

    def lm_iter(_, carry):
        R, t, v, bg, ba_, lm, lam = carry

        # ---- visual part (identical structure to ba_solve) ----
        r, Jpose, Jpt = ba_ops._residuals(R, t, cam, lm, okf, olm_flat,
                                          oxy_flat)
        c = jnp.sum(r * r, axis=-1)
        w = ba_ops._robust_w(c, delta) if robust else jnp.ones_like(c)
        w = jnp.where(base_valid, w, 0.0)
        JtJ_p = jnp.einsum('mik,m,mil->mkl', Jpose, w, Jpose)
        JtJ_l = jnp.einsum('mik,m,mil->mkl', Jpt, w, Jpt)
        JtJ_pl = jnp.einsum('mik,m,mil->mkl', Jpose, w, Jpt)
        b_p = jnp.einsum('mik,m,mi->mk', Jpose, w, r)
        b_l = jnp.einsum('mik,m,mi->mk', Jpt, w, r)
        H_pp6 = JtJ_p.reshape(P, N, 6, 6).sum(1)
        g_p6 = b_p.reshape(P, N, 6).sum(1)
        H_ll = jnp.einsum('pnl,pnij->lij', onehot,
                          JtJ_l.reshape(P, N, 3, 3),
                          preferred_element_type=jnp.float32)
        H_pl = jnp.einsum('pnl,pnik->plik', onehot,
                          JtJ_pl.reshape(P, N, 6, 3),
                          preferred_element_type=jnp.float32)
        g_l = jnp.einsum('pnl,pnk->lk', onehot, b_l.reshape(P, N, 3),
                         preferred_element_type=jnp.float32)
        H_ll = H_ll + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_ll))
                       + 1e-8 * jnp.eye(3))
        Hll_inv = ba_ops._inv3x3(H_ll)
        W = jnp.einsum('plik,lkj->plij', H_pl, Hll_inv)
        S_off6 = jnp.einsum('plik,qljk->pqij', W, H_pl)       # [P,P,6,6]
        rhs6 = g_p6 - jnp.einsum('plij,lj->pi', W, g_l)

        # embed the reduced visual system into 15-dof blocks
        S = jnp.zeros((P, P, 15, 15))
        S = S.at[:, :, :6, :6].add(-S_off6)
        S = S.at[jnp.arange(P), jnp.arange(P), :6, :6].add(H_pp6)
        rhs = jnp.zeros((P, 15)).at[:, :6].set(rhs6)

        # ---- inertial edges ----
        zero = jnp.zeros(15)

        def edge(i):
            p = jax.tree_util.tree_map(lambda a: a[i], preints)
            args = (R[i], t[i], v[i], bg[i], ba_[i],
                    R[i + 1], t[i + 1], v[i + 1], bg[i + 1], ba_[i + 1], p,
                    calib.R_bc, calib.t_bc)
            r_e = _imu_edge_residual(zero, zero, *args)
            Ji = jax.jacfwd(lambda dx: _imu_edge_residual(dx, zero, *args))(
                zero)
            Jj = jax.jacfwd(lambda dx: _imu_edge_residual(zero, dx, *args))(
                zero)
            return r_e, Ji, Jj

        r_e, Ji, Jj = jax.vmap(edge)(jnp.arange(P - 1))   # [E,15],[E,15,15]
        We = edge_W                                        # [E,15,15]
        ii = jnp.arange(P - 1)
        S = S.at[ii, ii].add(jnp.einsum('eki,ekl,elj->eij', Ji, We, Ji))
        S = S.at[ii + 1, ii + 1].add(jnp.einsum('eki,ekl,elj->eij', Jj, We,
                                                Jj))
        S = S.at[ii, ii + 1].add(jnp.einsum('eki,ekl,elj->eij', Ji, We, Jj))
        S = S.at[ii + 1, ii].add(jnp.einsum('eki,ekl,elj->eij', Jj, We, Ji))
        rhs = rhs.at[ii].add(jnp.einsum('eki,ekl,el->ei', Ji, We, r_e))
        rhs = rhs.at[ii + 1].add(jnp.einsum('eki,ekl,el->ei', Jj, We, r_e))

        # gauge: freeze only the POSE dofs of anchor states — their
        # velocities/biases stay free so the inertial chain can settle them
        # consistently (freezing a perturbed anchor velocity would force its
        # error into the neighboring poses)
        keep_dim = jnp.ones((P, 15)).at[:, :6].set(
            (~pose_fixed).astype(jnp.float32)[:, None])
        S = S * keep_dim[:, None, :, None] * keep_dim[None, :, None, :]
        frozen = 1.0 - keep_dim
        S = S.at[jnp.arange(P), jnp.arange(P)].add(
            jax.vmap(jnp.diag)(frozen))
        rhs = rhs * keep_dim

        # damping + solve
        Sd = S.at[jnp.arange(P), jnp.arange(P)].add(
            lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(
                S[jnp.arange(P), jnp.arange(P)])) + 1e-6 * jnp.eye(15))
        Sm = Sd.transpose(0, 2, 1, 3).reshape(15 * P, 15 * P)
        dx = -dla.chol_solve(Sm, rhs.reshape(-1)).reshape(P, 15)
        dx = dx * keep_dim

        # back-substitute landmarks (visual pose sub-block only)
        Hpl_t_dp = jnp.einsum('plik,pi->lk', H_pl, dx[:, :6])
        dl = -jnp.einsum('lij,lj->li', Hll_inv, g_l + Hpl_t_dp)
        dl = jnp.where(lm_valid[:, None], dl, 0.0)

        dR, dt = lie.se3_exp(dx[:, :6])
        R_n = dR @ R
        t_n = jnp.einsum('pij,pj->pi', dR, t) + dt
        v_n = v + dx[:, 6:9]
        bg_n = bg + dx[:, 9:12]
        ba_n = ba_ + dx[:, 12:15]
        lm_n = lm + dl

        _, c_old = visual_cost(R, t, lm)
        _, c_new = visual_cost(R_n, t_n, lm_n)
        tot_old = c_old + imu_cost(R, t, v, bg, ba_)
        tot_new = c_new + imu_cost(R_n, t_n, v_n, bg_n, ba_n)
        better = tot_new < tot_old
        pick = lambda a, b: jnp.where(better, a, b)
        return (pick(R_n, R), pick(t_n, t), pick(v_n, v), pick(bg_n, bg),
                pick(ba_n, ba_), pick(lm_n, lm),
                jnp.clip(jnp.where(better, lam * 0.5, lam * 4.0), 1e-8, 1e8))

    carry = (R0, t0, v0, bg0, ba0, lm0, jnp.asarray(1e-4))
    R, t, v, bg, ba_, lm, _ = jax.lax.fori_loop(0, iters, lm_iter, carry)
    _, cv = visual_cost(R, t, lm)
    return VIBAResult(R, t, v, bg, ba_, lm,
                      cv + imu_cost(R, t, v, bg, ba_))
