"""Sim(3) pose-graph (essential graph) optimization.

Reference: Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:1501 —
BlockSolver_7_3 over Sim3 vertices with loop edges, spanning-tree edges and
strong-covisibility edges; 4-DoF yaw+translation variant at :5292 for the
inertial case).

TPU-first: the graph is dense fixed-size — nodes are the K keyframe slots
(masked), edges are boolean [K,K] masks with relative Sim3 measurements
computed on the fly from the pre-correction poses. The linearized system is
assembled with scatter-adds into a dense (7K,7K) Hessian; at SLAM scale
(K <= 512) one dense solve on the MXU beats sparse scalar factorization by
orders of magnitude. Iterations are a fixed-count GN loop inside one jit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import lie


def relative_sim3(Ra, ta, sa, Rb, tb, sb):
    """T_ab = T_a * T_b^-1 for camera-from-world sim3s (a,b batched)."""
    Rbi, tbi, sbi = lie.sim3_inv(Rb, tb, sb)
    return lie.sim3_mul(Ra, ta, sa, Rbi, tbi, sbi)


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_essential_graph(R: jax.Array, t: jax.Array, s: jax.Array,
                             edge_mask: jax.Array,
                             R_meas: jax.Array, t_meas: jax.Array,
                             s_meas: jax.Array,
                             fixed: jax.Array, node_mask: jax.Array,
                             iters: int = 12, fix_scale: bool = False):
    """Optimize sim3 nodes so relative transforms match measurements.

    R,t,s: [K,...] current camera-from-world sim3 per node.
    edge_mask: [K,K] bool (i<j convention not required; each True (i,j) adds
    one residual T_meas_ij^-1 * (T_i * T_j^-1) -> log).
    R_meas/t_meas/s_meas: [K,K,...] relative measurements T_ij.
    fixed: [K] bool — gauge anchors (loop KF in the reference).
    """
    K = R.shape[0]
    eidx = jnp.stack(jnp.meshgrid(jnp.arange(K), jnp.arange(K),
                                  indexing='ij'), axis=-1).reshape(-1, 2)
    emask = (edge_mask & node_mask[:, None] & node_mask[None, :]).reshape(-1)

    def residual_edge(xi_i, xi_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
        dRi, dti, dsi = lie.sim3_exp(xi_i)
        dRj, dtj, dsj = lie.sim3_exp(xi_j)
        Ri2, ti2, si2 = lie.sim3_mul(dRi, dti, dsi, Ri, ti, si)
        Rj2, tj2, sj2 = lie.sim3_mul(dRj, dtj, dsj, Rj, tj, sj)
        Rrel, trel, srel = relative_sim3(Ri2, ti2, si2, Rj2, tj2, sj2)
        Rmi, tmi, smi = lie.sim3_inv(Rm, tm, sm)
        Re, te, se = lie.sim3_mul(Rmi, tmi, smi, Rrel, trel, srel)
        return lie.sim3_log(Re, te, se)

    i_all = eidx[:, 0]
    j_all = eidx[:, 1]

    def gn(_, carry):
        R_c, t_c, s_c = carry
        zero = jnp.zeros(7)

        def edge_rJ(i, j):
            Ri, ti, si = R_c[i], t_c[i], s_c[i]
            Rj, tj, sj = R_c[j], t_c[j], s_c[j]
            Rm, tm, sm = R_meas[i, j], t_meas[i, j], s_meas[i, j]
            r = residual_edge(zero, zero, Ri, ti, si, Rj, tj, sj, Rm, tm, sm)
            Ji = jax.jacfwd(lambda x: residual_edge(
                x, zero, Ri, ti, si, Rj, tj, sj, Rm, tm, sm))(zero)
            Jj = jax.jacfwd(lambda x: residual_edge(
                zero, x, Ri, ti, si, Rj, tj, sj, Rm, tm, sm))(zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(edge_rJ)(i_all, j_all)       # [E,7],[E,7,7]x2
        # E is the full KxK meshgrid, so every (i,j) pair appears exactly
        # once: the Hessian assembly is DENSE — reshape + einsum, never
        # scatter-add (index .add over 65k duplicate targets serializes on
        # TPU; it was ~2.1 s of a 2.13 s loop correction at K=256)
        W = emask.reshape(K, K).astype(jnp.float32)
        rK = r.reshape(K, K, 7)
        JiK = Ji.reshape(K, K, 7, 7)
        JjK = Jj.reshape(K, K, 7, 7)
        H = jnp.einsum('ij,ijrk,ijrl->ijkl', W, JiK, JjK)   # off-diag (i,j)
        H = H + H.transpose(1, 0, 3, 2)                     # and (j,i)
        diag = (jnp.einsum('ij,ijrk,ijrl->ikl', W, JiK, JiK) +
                jnp.einsum('ij,ijrk,ijrl->jkl', W, JjK, JjK))
        H = H.at[jnp.arange(K), jnp.arange(K)].add(diag)
        g = (jnp.einsum('ij,ijrk,ijr->ik', W, JiK, rK) +
             jnp.einsum('ij,ijrk,ijr->jk', W, JjK, rK))

        # gauge: zero rows/cols of fixed or invalid nodes
        freeze = fixed | ~node_mask
        keep = (~freeze).astype(jnp.float32)
        H = H * keep[:, None, None, None] * keep[None, :, None, None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            freeze[:, None, None].astype(jnp.float32) * jnp.eye(7))
        g = g * keep[:, None]
        if fix_scale:
            H = H.at[:, :, 6, :].set(0.0).at[:, :, :, 6].set(0.0)
            H = H.at[jnp.arange(K), jnp.arange(K), 6, 6].set(1.0)
            g = g.at[:, 6].set(0.0)

        Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        Hd = Hd + 1e-6 * jnp.eye(7 * K)
        dx = -jnp.linalg.solve(Hd, g.reshape(-1)).reshape(K, 7)
        dx = dx * keep[:, None]
        dR, dt, ds = lie.sim3_exp(dx)
        R_n, t_n, s_n = lie.sim3_mul(dR, dt, ds, R_c, t_c, s_c)
        return (R_n, t_n, s_n)

    R_o, t_o, s_o = jax.lax.fori_loop(0, iters, gn, (R, t, s))
    return R_o, t_o, s_o


@partial(jax.jit, static_argnames=("iters",))
def optimize_essential_graph_4dof(R: jax.Array, t: jax.Array,
                                  edge_mask: jax.Array,
                                  R_meas: jax.Array, t_meas: jax.Array,
                                  fixed: jax.Array, node_mask: jax.Array,
                                  iters: int = 12):
    """Yaw+translation pose graph for gravity-aligned (inertial) maps
    (reference: Optimizer::OptimizeEssentialGraph4DoF src/Optimizer.cc:5292,
    VertexPose4DoF/Edge4DoF include/G2oTypes.h:155,817).

    Nodes are SE3 camera-from-world; the per-node update is a WORLD-frame
    yaw rotation (about gravity) + world translation (ImuCamPose::UpdateW),
    so pitch/roll — fixed by the IMU — are never disturbed. Edge residual
    matches Edge4DoF: rotation log + camera-origin difference.
    """
    K = R.shape[0]
    eidx = jnp.stack(jnp.meshgrid(jnp.arange(K), jnp.arange(K),
                                  indexing='ij'), axis=-1).reshape(-1, 2)
    emask = (edge_mask & node_mask[:, None] & node_mask[None, :]).reshape(-1)
    i_all = eidx[:, 0]
    j_all = eidx[:, 1]

    def apply(xi, Rn, tn):
        Rz = lie.so3_exp(jnp.concatenate([jnp.zeros(2), xi[:1]]))
        Rwc = Rn.T
        C = -Rwc @ tn
        Rwc2 = Rz @ Rwc
        C2 = C + xi[1:4]
        R2 = Rwc2.T
        return R2, -R2 @ C2

    def residual_edge(xi_i, xi_j, Ri, ti, Rj, tj, Rm, tm):
        Ri2, ti2 = apply(xi_i, Ri, ti)
        Rj2, tj2 = apply(xi_j, Rj, tj)
        er = lie.so3_log(Ri2 @ Rj2.T @ Rm.T)
        et = Ri2 @ (-Rj2.T @ tj2) + ti2 - tm
        return jnp.concatenate([er, et])

    def gn(_, carry):
        R_c, t_c = carry
        zero = jnp.zeros(4)

        def edge_rJ(i, j):
            args = (R_c[i], t_c[i], R_c[j], t_c[j], R_meas[i, j],
                    t_meas[i, j])
            r = residual_edge(zero, zero, *args)
            Ji = jax.jacfwd(lambda x: residual_edge(x, zero, *args))(zero)
            Jj = jax.jacfwd(lambda x: residual_edge(zero, x, *args))(zero)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(edge_rJ)(i_all, j_all)
        # dense assembly over the full KxK meshgrid — no scatter-adds on
        # TPU (see optimize_essential_graph)
        W = emask.reshape(K, K).astype(jnp.float32)
        rK = r.reshape(K, K, 6)
        JiK = Ji.reshape(K, K, 6, 4)
        JjK = Jj.reshape(K, K, 6, 4)
        H = jnp.einsum('ij,ijrk,ijrl->ijkl', W, JiK, JjK)
        H = H + H.transpose(1, 0, 3, 2)
        diag = (jnp.einsum('ij,ijrk,ijrl->ikl', W, JiK, JiK) +
                jnp.einsum('ij,ijrk,ijrl->jkl', W, JjK, JjK))
        H = H.at[jnp.arange(K), jnp.arange(K)].add(diag)
        g = (jnp.einsum('ij,ijrk,ijr->ik', W, JiK, rK) +
             jnp.einsum('ij,ijrk,ijr->jk', W, JjK, rK))

        freeze = fixed | ~node_mask
        keep = (~freeze).astype(jnp.float32)
        H = H * keep[:, None, None, None] * keep[None, :, None, None]
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            freeze[:, None, None].astype(jnp.float32) * jnp.eye(4))
        g = g * keep[:, None]

        Hd = H.transpose(0, 2, 1, 3).reshape(4 * K, 4 * K)
        Hd = Hd + 1e-6 * jnp.eye(4 * K)
        dx = -jnp.linalg.solve(Hd, g.reshape(-1)).reshape(K, 4)
        dx = dx * keep[:, None]
        R_n, t_n = jax.vmap(apply)(dx, R_c, t_c)
        return (lie.orthonormalize(R_n), t_n)

    R_o, t_o = jax.lax.fori_loop(0, iters, gn, (R, t))
    return R_o, t_o


def build_essential_edges(covis: jax.Array, spanning_parent: jax.Array,
                          loop_edges: jax.Array, kf_mask: jax.Array,
                          covis_th: int = 100):
    """Edge mask for the essential graph (reference rule set,
    src/Optimizer.cc:1563-1650): spanning tree + loop edges + covisibility
    over threshold."""
    K = covis.shape[0]
    e = (covis >= covis_th)
    par_valid = spanning_parent >= 0
    rows = jnp.arange(K)
    par = jnp.where(par_valid, spanning_parent, 0)
    e = e.at[rows, par].max(par_valid)
    e = e.at[par, rows].max(par_valid)
    e = e | loop_edges | loop_edges.T
    e = e & kf_mask[:, None] & kf_mask[None, :]
    return e.at[rows, rows].set(False)
