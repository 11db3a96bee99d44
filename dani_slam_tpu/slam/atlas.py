"""Atlas: multi-map management and map merging.

Reference: src/Atlas.cc (multi-map container, CreateNewMap on tracking loss
— Tracking::CreateMapInAtlas src/Tracking.cc:2682 —, ChangeMap on merge) and
src/LoopClosing.cc MergeLocal:1216/MergeLocal2:1784 (weld a newly created
map back into a stored one when place recognition finds the overlap:
Sim3 alignment, pose/point transform, welding BA, essential graph).

TPU re-design: a "map" is one MapState pytree; the Atlas is a host list of
device pytrees (swapping maps = swapping pytree references — the reference's
ChangeMap + mutex dance disappears). Merging is two fused device programs:
(1) sim3-transform every pose/landmark of the source map, (2) scatter-copy
them into the free slots of the target map with an id-translation table.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import lie, state as mstate


@jax.jit
def transform_map(st: mstate.MapState, R, t, s) -> mstate.MapState:
    """Apply a world-frame sim3 to a whole map: x_new = s R x_old + t.

    Poses (camera-from-world) update as T_cw' = T_cw * T^-1 with the scale
    folded into translations (reference: Map::ApplyScaledRotation
    src/Map.cc — used after IMU init and during merges)."""
    # landmark positions
    lm = lie.sim3_apply(R, t, s, st.lm_pos)
    # camera poses: x_c = R_k x_old + t_k;  x_old = (1/s) R^T (x_new - t)
    # => R_k' = R_k R^T (rigid), t_k' = t_k - (1/s) R_k' t ... with the
    # 1/s factor folded into t so that depths scale consistently:
    # x_c' = R_k' x_new + t_k'  where x_c' = s * x_c (map-wide rescale of
    # camera-frame depth, consistent with landmark rescale).
    Rk = st.kf_R @ R.T[None]
    tk = s * st.kf_t - jnp.einsum('kij,j->ki', Rk, t)
    # distances scale by s
    return dataclasses.replace(
        st, lm_pos=jnp.where(st.lm_mask[:, None], lm, st.lm_pos),
        kf_R=jnp.where(st.kf_mask[:, None, None],
                       lie.orthonormalize(Rk), st.kf_R),
        kf_t=jnp.where(st.kf_mask[:, None], tk, st.kf_t),
        lm_dist_min=st.lm_dist_min * s, lm_dist_max=st.lm_dist_max * s)


@jax.jit
def merge_into(target: mstate.MapState, source: mstate.MapState):
    """Copy all keyframes/landmarks of `source` into free slots of `target`.

    Assumes `source` was already transformed into target world coordinates.
    Returns (merged_state, kf_slot_map [K], lm_slot_map [L], ok) — ok False
    if the target lacks capacity (caller keeps the maps separate then).
    """
    K, L = target.caps.K, target.caps.L
    n_kf_src = jnp.sum(source.kf_mask.astype(jnp.int32))
    n_lm_src = jnp.sum(source.lm_mask.astype(jnp.int32))
    kf_free = K - jnp.sum(target.kf_mask.astype(jnp.int32))
    lm_free = L - jnp.sum(target.lm_mask.astype(jnp.int32))
    ok = (n_kf_src <= kf_free) & (n_lm_src <= lm_free)

    # slot maps: src slot -> dst slot (-1 for unused src slots)
    kf_slots = mstate.free_slots(target.kf_mask, K)      # ranked free slots
    src_rank = jnp.cumsum(source.kf_mask.astype(jnp.int32)) - 1
    kf_map = jnp.where(source.kf_mask, kf_slots[jnp.clip(src_rank, 0, K - 1)],
                       -1)
    lm_slots = mstate.free_slots(target.lm_mask, L)
    lm_rank = jnp.cumsum(source.lm_mask.astype(jnp.int32)) - 1
    lm_map = jnp.where(source.lm_mask, lm_slots[jnp.clip(lm_rank, 0, L - 1)],
                       -1)

    dst_kf = jnp.where(source.kf_mask, kf_map, K - 1)    # safe scatter idx
    dst_lm = jnp.where(source.lm_mask, lm_map, L - 1)

    def scat(dst_arr, src_arr, idx, mask):
        upd = jnp.where(mask.reshape(mask.shape + (1,) * (src_arr.ndim - 1)),
                        src_arr, dst_arr[idx])
        return dst_arr.at[idx].set(upd)

    # translate obs table landmark ids
    obs_src = source.obs_lm
    obs_valid = obs_src >= 0
    obs_new = jnp.where(obs_valid,
                        jnp.take(lm_map, jnp.where(obs_valid, obs_src, 0)),
                        -1)

    t2 = dataclasses.replace(
        target,
        kf_mask=target.kf_mask.at[dst_kf].set(
            source.kf_mask | target.kf_mask[dst_kf]),
        kf_R=scat(target.kf_R, source.kf_R, dst_kf, source.kf_mask),
        kf_t=scat(target.kf_t, source.kf_t, dst_kf, source.kf_mask),
        kf_time=scat(target.kf_time, source.kf_time, dst_kf, source.kf_mask),
        kf_frame_id=scat(target.kf_frame_id, source.kf_frame_id, dst_kf,
                         source.kf_mask),
        kf_kp=scat(target.kf_kp, source.kf_kp, dst_kf, source.kf_mask),
        kf_kp_mask=scat(target.kf_kp_mask, source.kf_kp_mask, dst_kf,
                        source.kf_mask),
        kf_desc=scat(target.kf_desc, source.kf_desc, dst_kf, source.kf_mask),
        kf_depth=scat(target.kf_depth, source.kf_depth, dst_kf,
                      source.kf_mask),
        kf_octave=scat(target.kf_octave, source.kf_octave, dst_kf,
                       source.kf_mask),
        obs_lm=scat(target.obs_lm, obs_new, dst_kf, source.kf_mask),
        kf_vel=scat(target.kf_vel, source.kf_vel, dst_kf, source.kf_mask),
        kf_bias_g=scat(target.kf_bias_g, source.kf_bias_g, dst_kf,
                       source.kf_mask),
        kf_bias_a=scat(target.kf_bias_a, source.kf_bias_a, dst_kf,
                       source.kf_mask),
        lm_mask=target.lm_mask.at[dst_lm].set(
            source.lm_mask | target.lm_mask[dst_lm]),
        lm_pos=scat(target.lm_pos, source.lm_pos, dst_lm, source.lm_mask),
        lm_desc=scat(target.lm_desc, source.lm_desc, dst_lm, source.lm_mask),
        lm_normal=scat(target.lm_normal, source.lm_normal, dst_lm,
                       source.lm_mask),
        lm_dist_min=scat(target.lm_dist_min, source.lm_dist_min, dst_lm,
                         source.lm_mask),
        lm_dist_max=scat(target.lm_dist_max, source.lm_dist_max, dst_lm,
                         source.lm_mask),
        lm_ref_kf=scat(target.lm_ref_kf,
                       jnp.where(source.lm_ref_kf >= 0,
                                 jnp.take(kf_map,
                                          jnp.clip(source.lm_ref_kf, 0,
                                                   K - 1)), -1),
                       dst_lm, source.lm_mask),
        lm_n_obs=scat(target.lm_n_obs, source.lm_n_obs, dst_lm,
                      source.lm_mask),
        lm_found=scat(target.lm_found, source.lm_found, dst_lm,
                      source.lm_mask),
        lm_visible=scat(target.lm_visible, source.lm_visible, dst_lm,
                        source.lm_mask),
        # lm_first_kf is the monotone creation COUNTER (not a slot): shift
        # source counters past the target's so the merged counter timeline
        # (target + source, below) keeps relative ages consistent
        lm_first_kf=scat(target.lm_first_kf,
                         jnp.where(source.lm_first_kf >= 0,
                                   source.lm_first_kf +
                                   target.next_kf_counter, -1),
                         dst_lm, source.lm_mask),
        # covisibility: scatter the source block; cross-map links grow later
        # through fuse (reference: merge runs SearchAndFuse + rebuilds links)
        covis=target.covis.at[dst_kf[:, None], dst_kf[None, :]].set(
            jnp.where(source.kf_mask[:, None] & source.kf_mask[None, :],
                      source.covis, target.covis[dst_kf[:, None],
                                                 dst_kf[None, :]])),
        spanning_parent=scat(
            target.spanning_parent,
            jnp.where(source.spanning_parent >= 0,
                      jnp.take(kf_map, jnp.clip(source.spanning_parent, 0,
                                                K - 1)), -1),
            dst_kf, source.kf_mask),
        next_kf_counter=target.next_kf_counter + source.next_kf_counter,
    )
    # observer bitmask: slot ids moved for every source KF/landmark —
    # rebuild exactly from the merged obs table (rare path)
    t2 = mstate.rebuild_obs_bits(t2)
    return t2, kf_map, lm_map, ok


class Atlas:
    """Host-side multi-map container (reference: src/Atlas.cc)."""

    def __init__(self, caps: mstate.MapCaps):
        self.caps = caps
        self.stored: List[dict] = []      # [{"st":..., "bow":...}]

    def stash(self, st: mstate.MapState, bow=None):
        """Store the active map (called when tracking is lost beyond
        recovery and a fresh map starts — reference: CreateMapInAtlas)."""
        self.stored.append(dict(st=st, bow=bow))

    def n_maps(self) -> int:
        return len(self.stored)

    def try_merge(self, active_st: mstate.MapState, cam, active_kf: int,
                  qbow, key, verify_fn, min_inliers: int = 25):
        """Look for the active keyframe in stored maps; on a verified hit,
        transform + weld the ACTIVE map into the stored one and return the
        merged state (reference: LoopClosing merge branch
        src/LoopClosing.cc:133-190 -> MergeLocal).

        qbow: BoW vector of the active keyframe (selects the candidate KF
        inside each stored map); verify_fn(st_a, st_b, kf_a, kf_b, key) ->
        (T12, n, ok) is the cross-map geometric verifier.
        """
        from dani_slam_tpu.models import vocab as vocab_mod

        for i, entry in enumerate(self.stored):
            stored_st = entry["st"]
            bow = entry.get("bow")
            if bow is None or qbow is None:
                cand_kf = int(jnp.argmax(
                    jnp.where(stored_st.kf_mask,
                              jnp.arange(self.caps.K), -1)))
            else:
                scores = jnp.where(stored_st.kf_mask,
                                   vocab_mod.bow_l1_score(bow, qbow[None]),
                                   -1.0)
                cand_kf = int(jnp.argmax(scores))
                if float(scores[cand_kf]) <= 0.0:
                    continue
            T12, n, ok = verify_fn(active_st, stored_st,
                                   jnp.asarray(active_kf),
                                   jnp.asarray(cand_kf), key)
            if not bool(ok):
                continue
            last_kf = cand_kf
            R, t, s = T12
            # T12 maps stored-map camera coords of last_kf ... the verifier
            # returns the relative sim3 between the two KFs; convert to a
            # world-frame alignment: T_world = T_cand_cw^-1 * T12^-1 * T_cur_cw
            Rc = stored_st.kf_R[last_kf]
            tc = stored_st.kf_t[last_kf]
            Ra = active_st.kf_R[active_kf]
            ta = active_st.kf_t[active_kf]
            # x_stored_world <- x_active_world
            Ri, ti, si = lie.sim3_inv(R, t, s)
            Rw, tw, sw = lie.sim3_mul(*lie.sim3_inv(Rc, tc, jnp.ones(())),
                                      *lie.sim3_mul(Ri, ti, si, Ra, ta,
                                                    jnp.ones(())))
            src_t = transform_map(active_st, Rw, tw, sw)
            merged, kf_map, lm_map, cap_ok = merge_into(stored_st, src_t)
            if not bool(cap_ok):
                continue
            del self.stored[i]
            new_active_kf = int(kf_map[active_kf])
            # cand_kf (the stored-map keyframe of the weld) and the stored
            # map's BoW rows let the caller run the welding fuse/BA and
            # restore the place-recognition database
            return dict(st=merged, new_active_kf=new_active_kf,
                        kf_map=kf_map, lm_map=lm_map, cand_kf=last_kf,
                        stored_bow=bow)
        return None
