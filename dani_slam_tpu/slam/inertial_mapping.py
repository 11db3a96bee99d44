"""Temporal-window visual-inertial local BA over the MapState.

Reference: once the IMU is initialized, LocalMapping switches from the
covisibility-window LocalBundleAdjustment to the TEMPORAL-window
LocalInertialBA (src/LocalMapping.cc:150-151 -> src/Optimizer.cc:2383,
Nd = 10 keyframes, fixed previous-KF anchor). This module gathers that
window from the MapState and runs ops/viba.viba_solve.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import state as mstate
from dani_slam_tpu.ops import imu as imu_ops
from dani_slam_tpu.ops import viba


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def full_inertial_ba_map(st: mstate.MapState, cam, kf_slots: jax.Array,
                         slot_valid: jax.Array, preints,
                         edge_valid: jax.Array, calib: imu_ops.ImuCalib,
                         prior_g: float = 0.0, prior_a: float = 0.0,
                         iters: int = 8, cg_iters: int = 50):
    """Whole-map VI BA over the temporal keyframe chain (reference:
    Optimizer::FullInertialBA src/Optimizer.cc:392, invoked by
    LocalMapping::InitializeIMU with staged priors and by the VIBA1/VIBA2
    timers, src/LocalMapping.cc:183-233).

    kf_slots [P]: ALL alive keyframes in temporal order (padded);
    preints [P-1] KF-to-KF preintegrations (windows merged across culled
    keyframes); prior_g/prior_a: staged bias-prior weights. Landmarks are
    passed at FULL capacity — the PCG solver never materializes per-pair
    blocks, so whole-map scale is fine."""
    from dani_slam_tpu.ops import ba_large

    P = kf_slots.shape[0]
    K, N = st.obs_lm.shape
    safe = jnp.where(slot_valid, kf_slots, 0)
    alive = slot_valid & st.kf_mask[safe]

    obs_lm_rows = jnp.where(
        (st.obs_lm[safe] >= 0) & st.kf_kp_mask[safe] & alive[:, None],
        st.obs_lm[safe], -1)
    obs_xy = st.kf_kp[safe]

    first_pos = jnp.argmax(alive)
    pose_fixed = (jnp.arange(P) == first_pos) | ~alive

    res = ba_large.full_inertial_ba(
        st.kf_R[safe], st.kf_t[safe], st.kf_vel[safe], st.kf_bias_g[safe],
        st.kf_bias_a[safe], pose_fixed, st.lm_pos, st.lm_mask, cam,
        obs_lm_rows, obs_xy, obs_lm_rows >= 0,
        preints, edge_valid & alive[:-1] & alive[1:], calib,
        prior_g=prior_g, prior_a=prior_a, iters=iters, cg_iters=cg_iters)

    upd = alive & ~pose_fixed
    widx = jnp.where(upd, safe, K - 1)
    vidx = jnp.where(alive, safe, K - 1)       # vel/bias update incl. anchor
    st2 = dataclasses.replace(
        st,
        kf_R=st.kf_R.at[widx].set(
            jnp.where(upd[:, None, None], res.R, st.kf_R[widx])),
        kf_t=st.kf_t.at[widx].set(
            jnp.where(upd[:, None], res.t, st.kf_t[widx])),
        kf_vel=st.kf_vel.at[vidx].set(
            jnp.where(alive[:, None], res.v, st.kf_vel[vidx])),
        kf_bias_g=st.kf_bias_g.at[vidx].set(
            jnp.where(alive[:, None], res.bg, st.kf_bias_g[vidx])),
        kf_bias_a=st.kf_bias_a.at[vidx].set(
            jnp.where(alive[:, None], res.ba, st.kf_bias_a[vidx])),
        lm_pos=jnp.where(st.lm_mask[:, None], res.lm_pos, st.lm_pos),
    )
    return st2


@partial(jax.jit, static_argnames=("L_loc", "iters"))
def local_inertial_ba(st: mstate.MapState, cam, kf_slots: jax.Array,
                      slot_valid: jax.Array, preints, edge_valid: jax.Array,
                      calib: imu_ops.ImuCalib, L_loc: int = 1024,
                      iters: int = 6):
    """kf_slots [P]: temporal window of keyframe slots (oldest first);
    slot_valid [P]; preints: stacked Preintegrated [P-1]; edge_valid [P-1].
    The oldest valid slot is the fixed anchor (reference fixes the previous
    KF outside the window, src/Optimizer.cc:2436-2445)."""
    P = kf_slots.shape[0]
    K, N = st.obs_lm.shape
    safe = jnp.where(slot_valid, kf_slots, 0)
    alive = slot_valid & st.kf_mask[safe]

    # landmarks observed by the window
    kf_sel = jnp.zeros((K,), bool).at[jnp.where(alive, safe, K - 1)].max(alive)
    lm_sel = mstate.local_map_landmark_mask(st, kf_sel)
    lkey = jnp.where(lm_sel, jnp.arange(st.caps.L),
                     st.caps.L + jnp.arange(st.caps.L))
    loc_lm = jnp.argsort(lkey)[:L_loc]
    loc_valid = lm_sel[loc_lm]
    inv = jnp.full((st.caps.L,), -1, jnp.int32).at[loc_lm].set(
        jnp.arange(L_loc, dtype=jnp.int32))
    inv = jnp.where(lm_sel, inv, -1)

    obs_lm_rows = st.obs_lm[safe]                     # [P,N]
    row_valid = (obs_lm_rows >= 0) & st.kf_kp_mask[safe] & alive[:, None]
    row_loc = jnp.take(inv, jnp.where(obs_lm_rows >= 0, obs_lm_rows, 0))
    row_valid &= row_loc >= 0
    obs_xy = st.kf_kp[safe]

    # anchor: oldest alive slot
    first_pos = jnp.argmax(alive)
    pose_fixed = (jnp.arange(P) == first_pos) | ~alive

    res = viba.viba_solve(
        st.kf_R[safe], st.kf_t[safe], st.kf_vel[safe], st.kf_bias_g[safe],
        st.kf_bias_a[safe], pose_fixed, st.lm_pos[loc_lm], loc_valid, cam,
        jnp.where(row_valid, row_loc, -1), obs_xy, row_valid,
        preints, edge_valid & alive[:-1] & alive[1:], calib, iters=iters)

    upd = alive & ~pose_fixed
    widx = jnp.where(upd, safe, K - 1)
    st2 = dataclasses.replace(
        st,
        kf_R=st.kf_R.at[widx].set(
            jnp.where(upd[:, None, None], res.R, st.kf_R[widx])),
        kf_t=st.kf_t.at[widx].set(
            jnp.where(upd[:, None], res.t, st.kf_t[widx])),
        kf_vel=st.kf_vel.at[widx].set(
            jnp.where(upd[:, None], res.v, st.kf_vel[widx])),
        kf_bias_g=st.kf_bias_g.at[widx].set(
            jnp.where(upd[:, None], res.bg, st.kf_bias_g[widx])),
        kf_bias_a=st.kf_bias_a.at[widx].set(
            jnp.where(upd[:, None], res.ba, st.kf_bias_a[widx])),
        lm_pos=st.lm_pos.at[loc_lm].set(
            jnp.where(loc_valid[:, None], res.lm_pos, st.lm_pos[loc_lm])),
    )
    return st2
