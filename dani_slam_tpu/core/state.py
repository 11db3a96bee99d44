"""Functional SLAM map state: fixed-capacity padded arrays + masks.

This single pytree replaces the reference's entire mutable pointer graph —
MapPoint (src/MapPoint.cc), KeyFrame (src/KeyFrame.cc), Map (src/Map.cc),
Atlas (src/Atlas.cc) — and with it the ~20 mutexes and the Boost
serialization machinery (SURVEY.md §2.4): "culling/erasing" becomes mask
updates, checkpointing becomes saving the pytree, and the tracking/mapping
"map update lock" (Map::mMutexMapUpdate, taken at src/Tracking.cc:1905)
becomes an atomic functional swap between steps.

Capacities are static (compile-time) so every device program is fixed-shape:
  K  keyframes   (reference has no hard cap; KF culling bounds growth,
                  src/LocalMapping.cc:904)
  L  landmarks   (MapPoints)
  N  keypoints per frame (config nFeatures=2000, Examples/RGB-D/TUM3.yaml:41)
  D  descriptor dim (SuperPoint = 256)

Conventions:
  * Poses are world-from-camera? NO — we follow the reference: T_cw (camera
    from world), stored as (R: [.,3,3], t: [.,3]). A landmark x_w projects
    into keyframe k as cam.project(R_k x_w + t_k).
  * Free slots are identified by mask==False; allocation scans for the first
    free slot on device via argmin over the mask.
  * The observation table is keyframe-major: obs_lm[K, N] holds the landmark
    id seen by keypoint n of keyframe k (-1 = none). This is the dense,
    TPU-shaped inversion of the reference's per-MapPoint observation maps
    (include/MapPoint.h:122-129) and per-KeyFrame mvpMapPoints.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


class MapCaps(NamedTuple):
    """Static capacities (hashable; part of jit cache key)."""
    K: int = 256          # max keyframes per map
    L: int = 32768        # max landmarks per map
    N: int = 1024         # max keypoints per frame
    D: int = 256          # descriptor dim


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapState:
    """One map of the Atlas (reference: src/Map.cc)."""
    # -- keyframes --------------------------------------------------------
    kf_mask: jax.Array        # [K] bool, slot occupied
    kf_R: jax.Array           # [K,3,3] T_cw rotation
    kf_t: jax.Array           # [K,3]   T_cw translation
    kf_time: jax.Array        # [K] timestamps
    kf_frame_id: jax.Array    # [K] source frame id (mnFrameId analogue)
    # visual features of each keyframe
    kf_kp: jax.Array          # [K,N,2] undistorted pixel coords
    kf_kp_mask: jax.Array     # [K,N] bool, keypoint valid
    kf_desc: jax.Array        # [K,N,D] descriptors (unit L2 norm)
    kf_depth: jax.Array       # [K,N] stereo/RGB-D depth (inf = mono)
    kf_octave: jax.Array      # [K,N] int8 pyramid level of each keypoint
    # observation table: landmark id per (kf, keypoint), -1 = none
    obs_lm: jax.Array         # [K,N] int32
    # inertial state (reference: KeyFrame velocity/bias, ImuTypes)
    kf_vel: jax.Array         # [K,3]
    kf_bias_g: jax.Array      # [K,3]
    kf_bias_a: jax.Array      # [K,3]
    # -- landmarks --------------------------------------------------------
    lm_mask: jax.Array        # [L] bool
    lm_pos: jax.Array         # [L,3] world position
    lm_desc: jax.Array        # [L,D] representative descriptor
    lm_normal: jax.Array      # [L,3] mean viewing direction
    lm_dist_min: jax.Array    # [L] scale-invariance band (PredictScale)
    lm_dist_max: jax.Array    # [L]
    lm_ref_kf: jax.Array      # [L] int32 reference keyframe
    lm_n_obs: jax.Array       # [L] int32 observation count
    lm_found: jax.Array       # [L] found count   (MapPoint::IncreaseFound)
    lm_visible: jax.Array     # [L] visible count (IncreaseVisible)
    lm_first_kf: jax.Array    # [L] int32 kf id at creation (for culling)
    # -- graph ------------------------------------------------------------
    covis: jax.Array          # [K,K] int32 shared-observation counts
    spanning_parent: jax.Array  # [K] int32 parent kf (-1 root)
    loop_edges: jax.Array     # [K,K] bool, loop closure edges
    # -- scalars ----------------------------------------------------------
    next_kf_counter: jax.Array  # [] int32 monotone kf id counter
    imu_initialized: jax.Array  # [] bool (mbImuInitialized analogue)
    imu_ba1: jax.Array          # [] bool (GetIniertialBA1)
    imu_ba2: jax.Array          # [] bool (GetIniertialBA2)

    # static capacity record
    caps: MapCaps = dataclasses.field(metadata=dict(static=True),
                                      default=MapCaps())


def empty_map(caps: MapCaps = MapCaps(), dtype=jnp.float32) -> MapState:
    K, L, N, D = caps
    f = lambda *s: jnp.zeros(s, dtype)
    return MapState(
        kf_mask=jnp.zeros((K,), bool),
        kf_R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3)).copy(),
        kf_t=f(K, 3),
        kf_time=f(K),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_kp=f(K, N, 2),
        kf_kp_mask=jnp.zeros((K, N), bool),
        kf_desc=f(K, N, D),
        kf_depth=jnp.full((K, N), jnp.inf, dtype),
        kf_octave=jnp.zeros((K, N), jnp.int8),
        obs_lm=jnp.full((K, N), -1, jnp.int32),
        kf_vel=f(K, 3),
        kf_bias_g=f(K, 3),
        kf_bias_a=f(K, 3),
        lm_mask=jnp.zeros((L,), bool),
        lm_pos=f(L, 3),
        lm_desc=f(L, D),
        lm_normal=f(L, 3),
        lm_dist_min=f(L),
        lm_dist_max=f(L),
        lm_ref_kf=jnp.full((L,), -1, jnp.int32),
        lm_n_obs=jnp.zeros((L,), jnp.int32),
        lm_found=jnp.zeros((L,), jnp.int32),
        lm_visible=jnp.zeros((L,), jnp.int32),
        lm_first_kf=jnp.full((L,), -1, jnp.int32),
        covis=jnp.zeros((K, K), jnp.int32),
        spanning_parent=jnp.full((K,), -1, jnp.int32),
        loop_edges=jnp.zeros((K, K), bool),
        next_kf_counter=jnp.zeros((), jnp.int32),
        imu_initialized=jnp.zeros((), bool),
        imu_ba1=jnp.zeros((), bool),
        imu_ba2=jnp.zeros((), bool),
        caps=caps,
    )


# ---------------------------------------------------------------------------
# Slot allocation (device-side)
# ---------------------------------------------------------------------------

def first_free_slot(mask: jax.Array) -> jax.Array:
    """Index of the first False in mask; caps-1 if full (callers must also
    check `is_full`)."""
    free = jnp.logical_not(mask)
    return jnp.where(jnp.any(free), jnp.argmax(free), mask.shape[0] - 1)


def free_slots(mask: jax.Array, count: int) -> jax.Array:
    """Indices of the first `count` free slots (padded with last index).

    NB: argsort, NOT lax.top_k — XLA's TPU sort is fast (~0.15 ms at
    L=2^15) while top_k lowers to a sequential selection that measures
    ~12-16 ms at the same size. Full sort + slice wins by two orders of
    magnitude for any non-tiny k."""
    free = jnp.logical_not(mask)
    idx = jnp.arange(mask.shape[0], dtype=jnp.int32)
    key = jnp.where(free, idx, mask.shape[0] + idx)
    return jnp.argsort(key)[:count]


def num_keyframes(st: MapState) -> jax.Array:
    return jnp.sum(st.kf_mask.astype(jnp.int32))


def num_landmarks(st: MapState) -> jax.Array:
    return jnp.sum(st.lm_mask.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Keyframe insertion
# ---------------------------------------------------------------------------

def insert_keyframe(st: MapState, R, t, time, frame_id, kp, kp_mask, desc,
                    depth, octave, obs_lm, vel=None, bias_g=None,
                    bias_a=None):
    """Insert a keyframe into the first free slot. Returns (state, slot).

    obs_lm: [N] landmark ids already associated with the frame's keypoints
    (tracking's map-point matches), -1 for none. Covisibility and landmark
    observation counts are updated in one shot (reference:
    KeyFrame::UpdateConnections src/KeyFrame.cc + MapPoint::AddObservation).
    """
    k = first_free_slot(st.kf_mask)
    caps = st.caps

    # landmark observation counts += 1 for each valid obs
    valid = obs_lm >= 0
    lm_idx = jnp.where(valid, obs_lm, 0)
    dn = jnp.zeros((caps.L,), jnp.int32).at[lm_idx].add(valid.astype(jnp.int32))
    # covisibility: count landmarks shared with every other keyframe.
    # seen[l] = 1 if this frame observes landmark l
    seen = jnp.zeros((caps.L,), bool).at[lm_idx].max(valid)
    # other_sees[K, L] via obs table: for each kf, does it observe l?
    kf_lm = jnp.where(st.obs_lm >= 0, st.obs_lm, 0)           # [K,N]
    kf_valid = st.obs_lm >= 0
    shared = jnp.sum(
        jnp.take(seen, kf_lm, axis=0) & kf_valid, axis=1).astype(jnp.int32)
    shared = jnp.where(st.kf_mask, shared, 0)

    new_covis = st.covis.at[k, :].set(shared).at[:, k].set(shared)
    new_covis = new_covis.at[k, k].set(0)

    # spanning tree: parent = most covisible existing keyframe
    parent = jnp.where(jnp.any(shared > 0), jnp.argmax(shared), -1)

    st2 = dataclasses.replace(
        st,
        kf_mask=st.kf_mask.at[k].set(True),
        kf_R=st.kf_R.at[k].set(R),
        kf_t=st.kf_t.at[k].set(t),
        kf_time=st.kf_time.at[k].set(time),
        kf_frame_id=st.kf_frame_id.at[k].set(frame_id),
        kf_kp=st.kf_kp.at[k].set(kp),
        kf_kp_mask=st.kf_kp_mask.at[k].set(kp_mask),
        kf_desc=st.kf_desc.at[k].set(desc),
        kf_depth=st.kf_depth.at[k].set(depth),
        kf_octave=st.kf_octave.at[k].set(octave.astype(jnp.int8)),
        obs_lm=st.obs_lm.at[k].set(jnp.where(kp_mask, obs_lm, -1)),
        kf_vel=st.kf_vel.at[k].set(vel if vel is not None else jnp.zeros(3)),
        kf_bias_g=st.kf_bias_g.at[k].set(
            bias_g if bias_g is not None else jnp.zeros(3)),
        kf_bias_a=st.kf_bias_a.at[k].set(
            bias_a if bias_a is not None else jnp.zeros(3)),
        lm_n_obs=st.lm_n_obs + dn,
        covis=new_covis,
        spanning_parent=st.spanning_parent.at[k].set(parent),
        next_kf_counter=st.next_kf_counter + 1,
    )
    return st2, k


# ---------------------------------------------------------------------------
# Landmark insertion / culling
# ---------------------------------------------------------------------------

def insert_landmarks(st: MapState, pos, desc, normal, dist_min, dist_max,
                     ref_kf, first_kf, valid):
    """Insert up to B new landmarks (B static). Returns (state, slots).

    valid: [B] bool — which candidate rows are real (others are padding).
    """
    B = pos.shape[0]
    slots = free_slots(st.lm_mask, B)
    # If a slot is already occupied (map full), drop the candidate.
    can = valid & ~st.lm_mask[slots]
    st2 = dataclasses.replace(
        st,
        lm_mask=st.lm_mask.at[slots].set(can | st.lm_mask[slots]),
        lm_pos=st.lm_pos.at[slots].set(
            jnp.where(can[:, None], pos, st.lm_pos[slots])),
        lm_desc=st.lm_desc.at[slots].set(
            jnp.where(can[:, None], desc, st.lm_desc[slots])),
        lm_normal=st.lm_normal.at[slots].set(
            jnp.where(can[:, None], normal, st.lm_normal[slots])),
        lm_dist_min=st.lm_dist_min.at[slots].set(
            jnp.where(can, dist_min, st.lm_dist_min[slots])),
        lm_dist_max=st.lm_dist_max.at[slots].set(
            jnp.where(can, dist_max, st.lm_dist_max[slots])),
        lm_ref_kf=st.lm_ref_kf.at[slots].set(
            jnp.where(can, ref_kf, st.lm_ref_kf[slots])),
        lm_first_kf=st.lm_first_kf.at[slots].set(
            jnp.where(can, first_kf, st.lm_first_kf[slots])),
        lm_n_obs=st.lm_n_obs.at[slots].set(
            jnp.where(can, 0, st.lm_n_obs[slots])),
        lm_found=st.lm_found.at[slots].set(
            jnp.where(can, 1, st.lm_found[slots])),
        lm_visible=st.lm_visible.at[slots].set(
            jnp.where(can, 1, st.lm_visible[slots])),
    )
    return st2, jnp.where(can, slots, -1)


def add_observations(st: MapState, kf: jax.Array, kp_idx: jax.Array,
                     lm_idx: jax.Array, valid: jax.Array) -> MapState:
    """Bind keypoints kp_idx of keyframe kf to landmarks lm_idx."""
    kp_safe = jnp.where(valid, kp_idx, 0)
    lm_safe = jnp.where(valid, lm_idx, 0)
    new_row = st.obs_lm[kf]
    new_row = new_row.at[kp_safe].set(
        jnp.where(valid, lm_safe, new_row[kp_safe]))
    dn = jnp.zeros((st.caps.L,), jnp.int32).at[lm_safe].add(
        valid.astype(jnp.int32))
    return dataclasses.replace(
        st, obs_lm=st.obs_lm.at[kf].set(new_row), lm_n_obs=st.lm_n_obs + dn)


def cull_landmarks(st: MapState, kill: jax.Array) -> MapState:
    """Remove landmarks where kill[l] (reference: MapPoint::SetBadFlag +
    LocalMapping::MapPointCulling src/LocalMapping.cc:348)."""
    keep = st.lm_mask & ~kill
    # detach from observation table
    obs_valid = st.obs_lm >= 0
    obs_safe = jnp.where(obs_valid, st.obs_lm, 0)
    dead_obs = obs_valid & jnp.take(kill, obs_safe)
    return dataclasses.replace(
        st, lm_mask=keep, obs_lm=jnp.where(dead_obs, -1, st.obs_lm))


def replace_landmarks(st: MapState, kill: jax.Array, keep: jax.Array,
                      valid: jax.Array) -> MapState:
    """Merge duplicate landmarks: every observation of kill[i] is redirected
    to keep[i], counters are combined, and kill[i] is removed (reference:
    MapPoint::Replace src/MapPoint.cc — used by Fuse and the loop-closing
    SearchAndFuse, src/LoopClosing.cc:2116).

    kill/keep: [B] landmark ids; valid: [B] active pairs. Assumes each kill
    id appears at most once (keep ids may repeat).
    """
    L = st.caps.L
    kill_s = jnp.where(valid, kill, L - 1)
    keep_s = jnp.where(valid, keep, L - 1)
    redirect = jnp.arange(L, dtype=jnp.int32).at[kill_s].set(
        jnp.where(valid, keep_s, kill_s).astype(jnp.int32))
    obs_valid = st.obs_lm >= 0
    new_obs = jnp.where(obs_valid,
                        jnp.take(redirect, jnp.where(obs_valid, st.obs_lm,
                                                     0)),
                        st.obs_lm)
    # combine counters onto the kept landmark
    dn = jnp.zeros((L,), jnp.int32).at[keep_s].add(
        jnp.where(valid, st.lm_n_obs[kill_s], 0))
    df = jnp.zeros((L,), jnp.int32).at[keep_s].add(
        jnp.where(valid, st.lm_found[kill_s], 0))
    dv = jnp.zeros((L,), jnp.int32).at[keep_s].add(
        jnp.where(valid, st.lm_visible[kill_s], 0))
    kill_mask = jnp.zeros((L,), bool).at[kill_s].set(valid)
    return dataclasses.replace(
        st, obs_lm=new_obs,
        lm_mask=st.lm_mask & ~kill_mask,
        lm_n_obs=st.lm_n_obs + dn,
        lm_found=st.lm_found + df,
        lm_visible=st.lm_visible + dv)


def cull_keyframe(st: MapState, k: jax.Array) -> MapState:
    """Remove keyframe k (reference: KeyFrame::SetBadFlag;
    LocalMapping::KeyFrameCulling src/LocalMapping.cc:904)."""
    obs = st.obs_lm[k]
    valid = obs >= 0
    lm_safe = jnp.where(valid, obs, 0)
    dn = jnp.zeros((st.caps.L,), jnp.int32).at[lm_safe].add(
        valid.astype(jnp.int32))
    # re-parent children of k to k's parent
    parent_of_k = st.spanning_parent[k]
    new_parents = jnp.where(st.spanning_parent == k, parent_of_k,
                            st.spanning_parent)
    return dataclasses.replace(
        st,
        kf_mask=st.kf_mask.at[k].set(False),
        obs_lm=st.obs_lm.at[k].set(jnp.full_like(obs, -1)),
        lm_n_obs=st.lm_n_obs - dn,
        covis=st.covis.at[k, :].set(0).at[:, k].set(0),
        spanning_parent=new_parents.at[k].set(-1),
    )


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------

def best_covisible(st: MapState, k: jax.Array, n: int):
    """Top-n covisible keyframes of k by shared-observation count
    (reference: KeyFrame::GetBestCovisibilityKeyFrames)."""
    w = jnp.where(st.kf_mask, st.covis[k], -1)
    w = w.at[k].set(-1)
    idx = jnp.argsort(-w)[:n]          # argsort >> lax.top_k on TPU
    return idx, w[idx]


def local_map_landmark_mask(st: MapState, kf_sel: jax.Array) -> jax.Array:
    """Bool [L]: landmarks observed by any keyframe in kf_sel (bool [K])
    (reference: Tracking::UpdateLocalPoints)."""
    obs_valid = (st.obs_lm >= 0) & kf_sel[:, None] & st.kf_mask[:, None]
    lm_safe = jnp.where(obs_valid, st.obs_lm, 0)
    out = jnp.zeros((st.caps.L,), bool)
    return out.at[lm_safe.reshape(-1)].max(obs_valid.reshape(-1)) & st.lm_mask
