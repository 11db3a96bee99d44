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

from dani_slam_tpu.core import scatterless as sless


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
    # observer bitmask: bit k of lm_obs_bits[l, k//32] set when keyframe
    # slot k observes landmark l. A conservative SUPERSET of the obs table
    # (stale bits can linger after outlier-edge drops); used only for
    # local-map candidate selection, where a superset costs nothing
    # (searches are fixed-shape and masked) but the O(L*K/32) elementwise
    # test replaces a 262k-row scatter (see local_map_landmark_mask).
    lm_obs_bits: jax.Array    # [L, ceil(K/32)] int32
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
        lm_obs_bits=jnp.zeros((L, (K + 31) // 32), jnp.int32),
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

def _kf_bit_words(k: jax.Array, n_words: int) -> jax.Array:
    """[n_words] int32: word vector with bit k set (k may be traced)."""
    return jnp.where(jnp.arange(n_words) == k // 32,
                     jnp.left_shift(jnp.asarray(1, jnp.int32), k % 32), 0)


def _set_obs_bits(bits: jax.Array, k: jax.Array, lm_mask_rows: jax.Array):
    """Set bit k on the rows selected by lm_mask_rows [L]."""
    words = _kf_bit_words(k, bits.shape[1])
    return jnp.where(lm_mask_rows[:, None], bits | words[None, :], bits)


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

    # landmark observation counts += 1 for each valid obs (scatter-free)
    valid = obs_lm >= 0
    lm_idx = jnp.where(valid, obs_lm, 0)
    dn = sless.id_count(lm_idx, valid, caps.L)
    # covisibility: count landmarks shared with every other keyframe.
    # seen[l] = 1 if this frame observes landmark l
    seen = sless.id_mask(lm_idx, valid, caps.L)
    # observer bits: clear the (possibly reused) column k, set for this obs
    bits = st.lm_obs_bits & ~_kf_bit_words(k, st.lm_obs_bits.shape[1])[None]
    bits = _set_obs_bits(bits, k, seen)
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
        lm_obs_bits=bits,
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

    Scatter-free: candidate r lands in the r-th free slot (same placement
    as free_slots), expressed as a cumsum-rank + gather per field — 11
    scatters at ~1 ms each would otherwise dominate the keyframe program.
    """
    B = pos.shape[0]
    L = st.caps.L
    free = ~st.lm_mask
    recv, src, placed = sless.scatter_rows_dense(free, valid, B)

    def put(old, cand, fill=None):
        r = recv.reshape((L,) + (1,) * (old.ndim - 1))
        return jnp.where(r, jnp.take(cand, src, axis=0), old)

    const = lambda v, dt: jnp.full((B,), v, dt)
    st2 = dataclasses.replace(
        st,
        lm_mask=st.lm_mask | recv,
        lm_pos=put(st.lm_pos, pos),
        lm_desc=put(st.lm_desc, desc),
        lm_normal=put(st.lm_normal, normal),
        lm_dist_min=put(st.lm_dist_min, dist_min),
        lm_dist_max=put(st.lm_dist_max, dist_max),
        lm_ref_kf=put(st.lm_ref_kf, ref_kf),
        lm_first_kf=put(st.lm_first_kf, first_kf),
        lm_n_obs=put(st.lm_n_obs, const(0, jnp.int32)),
        lm_found=put(st.lm_found, const(1, jnp.int32)),
        lm_visible=put(st.lm_visible, const(1, jnp.int32)),
        # fresh landmark in a reused slot: no observers yet
        lm_obs_bits=jnp.where(recv[:, None], 0, st.lm_obs_bits),
    )
    # slot id per candidate: inverse of the rank->slot placement
    rank = jnp.cumsum(free.astype(jnp.int32)) - free.astype(jnp.int32)
    slots = sless.id_lookup(
        jnp.where(free, rank, B), free, jnp.arange(L, dtype=jnp.int32),
        B, jnp.full((B,), L - 1, jnp.int32))
    return st2, jnp.where(placed, slots, -1)


def add_observations(st: MapState, kf: jax.Array, kp_idx: jax.Array,
                     lm_idx: jax.Array, valid: jax.Array) -> MapState:
    """Bind keypoints kp_idx of keyframe kf to landmarks lm_idx.
    (kp_idx must be duplicate-free among valid rows — matching guarantees
    one query per target keypoint.)"""
    N = st.obs_lm.shape[1]
    lm_safe = jnp.where(valid, lm_idx, 0)
    row = st.obs_lm[kf]
    new_row = sless.id_lookup(kp_idx, valid, lm_safe, N, row)
    dn = sless.id_count(lm_safe, valid, st.caps.L)
    bits = _set_obs_bits(st.lm_obs_bits, kf,
                         sless.id_mask(lm_safe, valid, st.caps.L))
    return dataclasses.replace(
        st, obs_lm=st.obs_lm.at[kf].set(new_row), lm_n_obs=st.lm_n_obs + dn,
        lm_obs_bits=bits)


def add_observations_multi(st: MapState, kfs: jax.Array, kp_idx: jax.Array,
                           lm_idx: jax.Array, valid: jax.Array) -> MapState:
    """Bind observations in SEVERAL keyframes at once: keypoint kp_idx[i,j]
    of keyframe kfs[i] observes landmark lm_idx[j] where valid[i,j].

    Contract: kfs entries are distinct slots (rows are written wholesale).
    A landmark j MAY be bound by several keyframes i (the fuse pass binds
    the same map point into every neighbor that sees it): observation
    counts accumulate one per binding and every binder's observer bit is
    set — exactly what a chain of per-keyframe add_observations would do,
    but as ONE fused update instead of nn sequential full-landmark-table
    passes (each a [L,N] compare-reduce; the chain was the dominant cost
    of fuse_into_neighbors)."""
    nn, N = kp_idx.shape
    L = st.caps.L
    lm_safe = jnp.where(lm_idx >= 0, lm_idx, 0)
    rows = jax.vmap(
        lambda kpi, v, old: sless.id_lookup(kpi, v, lm_safe, N, old)
    )(kp_idx, valid, st.obs_lm[kfs])
    # one count per (keyframe, landmark) binding
    dn = sless.id_count(jnp.broadcast_to(lm_safe, (nn, N)).reshape(-1),
                        valid.reshape(-1), L)
    # observer bits: OR of every binding keyframe's bit word (nn is small
    # and static — an unrolled OR fold fuses into one elementwise pass)
    words = jax.vmap(_kf_bit_words, in_axes=(0, None))(
        kfs, st.lm_obs_bits.shape[1])                           # [nn,W]
    masks = jax.vmap(lambda v: sless.id_mask(lm_safe, v, L))(valid)  # [nn,L]
    delta = jnp.zeros_like(st.lm_obs_bits)
    for i in range(nn):
        delta = delta | jnp.where(masks[i][:, None], words[i][None, :], 0)
    return dataclasses.replace(
        st, obs_lm=st.obs_lm.at[kfs].set(rows), lm_n_obs=st.lm_n_obs + dn,
        lm_obs_bits=st.lm_obs_bits | delta)


def cull_landmarks(st: MapState, kill: jax.Array) -> MapState:
    """Remove landmarks where kill[l] (reference: MapPoint::SetBadFlag +
    LocalMapping::MapPointCulling src/LocalMapping.cc:348)."""
    keep = st.lm_mask & ~kill
    # detach from observation table
    obs_valid = st.obs_lm >= 0
    obs_safe = jnp.where(obs_valid, st.obs_lm, 0)
    dead_obs = obs_valid & jnp.take(kill, obs_safe)
    return dataclasses.replace(
        st, lm_mask=keep, obs_lm=jnp.where(dead_obs, -1, st.obs_lm),
        lm_obs_bits=jnp.where(kill[:, None], 0, st.lm_obs_bits))


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
    iota = jnp.arange(L, dtype=jnp.int32)
    redirect = sless.id_lookup(kill_s, valid, keep_s.astype(jnp.int32),
                               L, iota)
    obs_valid = st.obs_lm >= 0
    new_obs = jnp.where(obs_valid,
                        jnp.take(redirect, jnp.where(obs_valid, st.obs_lm,
                                                     0)),
                        st.obs_lm)
    # combine counters onto the kept landmark
    dn = sless.id_sum(keep_s, valid, st.lm_n_obs[kill_s], L)
    df = sless.id_sum(keep_s, valid, st.lm_found[kill_s], L)
    dv = sless.id_sum(keep_s, valid, st.lm_visible[kill_s], L)
    kill_mask = sless.id_mask(kill_s, valid, L)
    # kept landmark inherits the killed one's observer bits. Invalid
    # (padding) rows are DROPPED from the scatter via an out-of-range
    # index — routing them to slot L-1 would overwrite a real merge into
    # that slot with its stale pre-merge value. NB with REPEATED keep ids
    # only the last pair's bits land — an undercount that only narrows the
    # local-map candidate superset (rare loop-closing path; the obs table
    # stays exact).
    keep_w = jnp.where(valid, keep_s, L)           # L = out of bounds
    bits = st.lm_obs_bits.at[keep_w].set(
        st.lm_obs_bits[keep_s] | st.lm_obs_bits[kill_s], mode="drop")
    return dataclasses.replace(
        st, obs_lm=new_obs,
        lm_mask=st.lm_mask & ~kill_mask,
        lm_n_obs=st.lm_n_obs + dn,
        lm_found=st.lm_found + df,
        lm_visible=st.lm_visible + dv,
        lm_obs_bits=jnp.where(kill_mask[:, None], 0, bits))


def cull_keyframe(st: MapState, k: jax.Array) -> MapState:
    """Remove keyframe k (reference: KeyFrame::SetBadFlag;
    LocalMapping::KeyFrameCulling src/LocalMapping.cc:904)."""
    obs = st.obs_lm[k]
    valid = obs >= 0
    lm_safe = jnp.where(valid, obs, 0)
    dn = sless.id_count(lm_safe, valid, st.caps.L)
    # re-parent children of k to k's parent
    parent_of_k = st.spanning_parent[k]
    new_parents = jnp.where(st.spanning_parent == k, parent_of_k,
                            st.spanning_parent)
    return dataclasses.replace(
        st,
        kf_mask=st.kf_mask.at[k].set(False),
        obs_lm=st.obs_lm.at[k].set(jnp.full_like(obs, -1)),
        lm_n_obs=st.lm_n_obs - dn,
        lm_obs_bits=st.lm_obs_bits &
        ~_kf_bit_words(k, st.lm_obs_bits.shape[1])[None],
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
    (reference: Tracking::UpdateLocalPoints).

    Answered from the observer bitmask in O(L*K/32) elementwise ops —
    the obs-table formulation is a 262k-row scatter (~2.3 ms/frame on
    TPU). The bitmask is a conservative superset of the obs table (see
    MapState.lm_obs_bits), which only widens the candidate set."""
    K = st.caps.K
    sel = kf_sel & st.kf_mask
    n_words = st.lm_obs_bits.shape[1]
    pad = n_words * 32 - K
    selp = jnp.pad(sel, (0, pad)) if pad else sel
    words = jnp.sum(
        jnp.where(selp.reshape(n_words, 32),
                  jnp.left_shift(jnp.asarray(1, jnp.int32),
                                 jnp.arange(32))[None, :], 0),
        axis=1).astype(jnp.int32)
    hit = jnp.any((st.lm_obs_bits & words[None, :]) != 0, axis=1)
    return hit & st.lm_mask


def rebuild_obs_bits(st: MapState) -> MapState:
    """Recompute lm_obs_bits exactly from the obs table (used after atlas
    merges / checkpoint loads where incremental maintenance is impractical;
    O(K * L * N) — rare-path only)."""
    L = st.caps.L

    def body(k, bits):
        row = st.obs_lm[k]
        valid = (row >= 0) & st.kf_mask[k]
        m = sless.id_mask(jnp.where(valid, row, 0), valid, L)
        return _set_obs_bits(bits, k, m)

    bits = jax.lax.fori_loop(0, st.caps.K, body,
                             jnp.zeros_like(st.lm_obs_bits))
    return dataclasses.replace(st, lm_obs_bits=bits)
