"""Local mapping: keyframe processing, landmark creation, local BA, culling.

The keyframe-rate back-end, mirroring the reference's LocalMapping thread
pipeline (src/LocalMapping.cc:66-300): ProcessNewKeyFrame -> MapPointCulling
-> CreateNewMapPoints -> SearchInNeighbors(Fuse) -> LocalBundleAdjustment ->
KeyFrameCulling. TPU re-design: the whole pipeline is a handful of jitted
fixed-shape programs over the functional MapState; instead of a concurrent
thread with queues and stop-flags, the System interleaves a mapping step
after each keyframe insertion (two-rate loop, SURVEY.md §7), and BA is
bounded-iteration rather than interruptible.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie, scatterless as sless, state as mstate
from dani_slam_tpu.ops import ba as ba_ops
from dani_slam_tpu.ops import matching

CHI2_MONO = 5.991


# ---------------------------------------------------------------------------
# Landmark creation (reference: LocalMapping::CreateNewMapPoints
# src/LocalMapping.cc:390-715 — per covisible neighbor: SearchForTriangulation
# then per-match triangulation with parallax/reprojection/scale checks)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_neighbors", "matcher_model"))
def create_new_landmarks(st: mstate.MapState, cam, kf_new: jax.Array,
                         n_neighbors: int = 5,
                         th_desc: float = 0.7, reproj_px: float = 2.0,
                         min_parallax_cos: float = 0.99995,
                         matcher_model=None, matcher_params=None):
    """Triangulate new landmarks between kf_new and its best covisible
    neighbors — fully batched: match + triangulate + gate for ALL pairs at
    once, pick one winning neighbor per keypoint, then ONE masked insert.
    (The earlier per-neighbor loop paid n_neighbors sequential
    insert_landmarks chains, each a cumsum-rank placement over L slots —
    the dominant latency chain of the keyframe program.)

    When a trained LightGlue is supplied (matcher_model/params), the
    wide-baseline association runs through it instead of descriptor
    mutual-NN — the reference's PRIMARY matcher for this search
    (LGmatcher::SearchForTriangulation calls LightGlue per keyframe pair,
    src/LGmatcher.cpp:856-1095, forward at :983). All n_neighbors pairs run
    as ONE batched forward (the reference loops pairs on the GPU; batching
    is the TPU-shaped equivalent). The reference binds each feature to at
    most one new point (first pair wins, via the GetMapPoint guard in
    CreateNewMapPoints); here the BEST-scoring pair wins — same invariant,
    order-free."""
    nn = n_neighbors
    neigh, w = mstate.best_covisible(st, kf_new, nn)

    R1 = st.kf_R[kf_new]
    t1 = st.kf_t[kf_new]
    kp1 = st.kf_kp[kf_new]
    d1 = st.kf_desc[kf_new]
    N = kp1.shape[0]
    unb1 = (st.obs_lm[kf_new] < 0) & st.kf_kp_mask[kf_new]
    unb2 = (st.obs_lm[neigh] < 0) & st.kf_kp_mask[neigh]       # [nn,N]
    pair_ok = (w > 0) & st.kf_mask[neigh]                      # [nn]

    if matcher_model is not None:
        from dani_slam_tpu.models import lightglue as lg
        # Compact both sides to their UNBOUND keypoints before the matcher:
        # LightGlue attention is quadratic in tokens and bound/invalid slots
        # are dead weight (the reference likewise only matches features
        # without MapPoints in SearchForTriangulation, LGmatcher.cpp:856).
        # Half the slots cover the live unbound population in practice
        # (RGB-D binds close points from depth first); overflow keypoints
        # simply wait for a later keyframe / fuse pass.
        Nc = max(N // 2, 256)
        perm1 = jnp.argsort(~unb1, stable=True).astype(jnp.int32)
        sel1 = perm1[:Nc]
        inv1 = jnp.argsort(perm1).astype(jnp.int32)             # [N] pos
        v1c = unb1[sel1]
        kp1c, d1c = kp1[sel1], d1[sel1]
        sel2 = jnp.argsort(~unb2, axis=1, stable=True)[:, :Nc] \
            .astype(jnp.int32)                                  # [nn,Nc]
        v2c = jnp.take_along_axis(unb2, sel2, 1)
        kp2c = jnp.take_along_axis(st.kf_kp[neigh], sel2[..., None], 1)
        d2c = jnp.take_along_axis(st.kf_desc[neigh], sel2[..., None], 1)
        idxc, scorec, okc = lg.match_pairs(
            matcher_model, matcher_params,
            jnp.broadcast_to(kp1c, (nn,) + kp1c.shape),
            jnp.broadcast_to(d1c, (nn,) + d1c.shape),
            jnp.broadcast_to(v1c, (nn,) + v1c.shape),
            kp2c, d2c, v2c, cam.width, cam.height)
        # expand back to FULL indexing: neighbor ids via sel2, query rows
        # via each keypoint's position in the unbound-first permutation
        idx_fullc = jnp.take_along_axis(sel2, jnp.maximum(idxc, 0), 1)
        g = jnp.minimum(inv1, Nc - 1)                           # [N]
        in1 = (inv1 < Nc) & unb1
        idxb = idx_fullc[:, g]                                  # [nn,N]
        okb = okc[:, g] & in1[None, :]
        quality = jnp.where(okb, scorec[:, g], -jnp.inf)        # higher best
    else:
        # batched mutual NN (no window: wide-baseline pairs)
        def one_nn(d2, u2):
            dmat = matching.desc_distance_matrix(d1, d2)
            m = matching.masked_match(dmat, unb1[:, None] & u2[None, :],
                                      th=th_desc, mutual=True)
            return m.idx, m.dist, m.ok
        idxb, distb, okb = jax.vmap(one_nn)(st.kf_desc[neigh], unb2)
        quality = -distb

    # --- batched two-view triangulation + gates over all pairs -----------
    r1 = _cam.unproject(cam, kp1)                               # [N,3]
    R1i, t1i = lie.se3_inv(R1, t1)

    def tri(R2, t2, kp2, idx):
        # relative pose: cam2-from-cam1
        R21, t21 = lie.se3_mul(R2, t2, R1i, t1i)
        r2 = _cam.unproject(cam, kp2)[idx]
        X1 = _cam.triangulate_midpoint(r1, r2, R21, t21)        # cam1 frame
        X2 = lie.se3_apply(R21, t21, X1)
        # reprojection checks in both views
        e1 = _cam.project(cam, X1) - kp1
        e2 = _cam.project(cam, X2) - kp2[idx]
        ok_rep = ((jnp.sum(e1 * e1, -1) < reproj_px ** 2 * CHI2_MONO) &
                  (jnp.sum(e2 * e2, -1) < reproj_px ** 2 * CHI2_MONO))
        # parallax
        C2 = -jnp.einsum('ji,j->i', R21, t21)
        dir2 = X1 - C2
        cosp = jnp.einsum('ni,ni->n', X1, dir2) / (
            jnp.linalg.norm(X1, axis=-1) *
            jnp.linalg.norm(dir2, axis=-1)).clip(1e-9)
        good = ((X1[:, 2] > 0) & (X2[:, 2] > 0) & ok_rep &
                (cosp < min_parallax_cos))
        return good, X1

    goodb, X1b = jax.vmap(tri)(st.kf_R[neigh], st.kf_t[neigh],
                               st.kf_kp[neigh], idxb)           # [nn,N],...
    goodb &= okb & pair_ok[:, None]

    # --- one winning neighbor per keypoint --------------------------------
    q = jnp.where(goodb, quality, -jnp.inf)                     # [nn,N]
    winner = jnp.argmax(q, axis=0)                              # [N]
    win_ok = jnp.any(goodb, axis=0)
    arange = jnp.arange(N, dtype=jnp.int32)
    X1w = X1b[winner, arange]                                   # [N,3]

    # world position + normal/dist band from the creating view
    Xw = lie.se3_apply(R1i, t1i, X1w)
    C1w = -jnp.einsum('ji,j->i', R1, t1)
    vnorm = Xw - C1w
    dist = jnp.linalg.norm(vnorm, axis=-1).clip(1e-9)
    normal = vnorm / dist[:, None]

    # lm_first_kf records the MONOTONE keyframe counter (not the slot:
    # slots are reused after culling, which silently corrupts the
    # recency gate in cull_bad_landmarks)
    st, slots = mstate.insert_landmarks(
        st, Xw, d1, normal, dist * 0.8, dist * 1.3,
        jnp.full((N,), kf_new, jnp.int32),
        jnp.broadcast_to(st.next_kf_counter, (N,)), win_ok)
    bound = win_ok & (slots >= 0)
    st = mstate.add_observations(st, kf_new, arange, slots, bound)
    # neighbor-side observations: all nn keyframe rows in one update
    sel = bound[None, :] & (winner[None, :] == jnp.arange(nn)[:, None])
    st = mstate.add_observations_multi(st, neigh, idxb, slots, sel)
    return st


@partial(jax.jit, static_argnames=("max_create",))
def create_depth_landmarks(st: mstate.MapState, cam, kf_new: jax.Array,
                           max_depth: jax.Array | float = 1e9,
                           close_depth: jax.Array | float = 3.0,
                           max_create: int = 100):
    """RGB-D/stereo: create landmarks from measured depth for unbound
    keypoints — capped like the reference: every point closer than the
    close threshold, plus the CLOSEST remaining until max_create total
    (reference: CreateNewKeyFrame sorts by depth and stops at 100 points,
    src/Tracking.cc:3320-3390). Without the cap every keyframe mints
    hundreds of duplicates of merely-unmatched existing landmarks; the map
    bloats, found/visible ratios crater, and MapPointCulling then guts it."""
    kp = st.kf_kp[kf_new]
    depth = st.kf_depth[kf_new]
    unb = (st.obs_lm[kf_new] < 0) & st.kf_kp_mask[kf_new]
    good = unb & jnp.isfinite(depth) & (depth > 0) & (depth < max_depth)
    order = jnp.argsort(jnp.where(good, depth, jnp.inf))
    # inverse permutation via double argsort (scatter-free)
    rank = jnp.argsort(order).astype(jnp.int32)
    good &= (depth < close_depth) | (rank < max_create)
    R1 = st.kf_R[kf_new]
    t1 = st.kf_t[kf_new]
    rays = _cam.unproject(cam, kp)
    Xc = rays * depth[:, None]
    Xw = lie.se3_apply(*lie.se3_inv(R1, t1), Xc)
    C1w = -jnp.einsum('ji,j->i', R1, t1)
    vnorm = Xw - C1w
    dist = jnp.linalg.norm(vnorm, axis=-1).clip(1e-9)
    st, slots = mstate.insert_landmarks(
        st, Xw, st.kf_desc[kf_new], vnorm / dist[:, None],
        dist * 0.8, dist * 1.3,
        jnp.full((kp.shape[0],), kf_new, jnp.int32),
        jnp.broadcast_to(st.next_kf_counter, (kp.shape[0],)), good)
    arange = jnp.arange(kp.shape[0], dtype=jnp.int32)
    st = mstate.add_observations(st, kf_new, arange, slots,
                                 good & (slots >= 0))
    return st


# ---------------------------------------------------------------------------
# Fuse duplicated landmarks into neighbor keyframes
# (reference: LocalMapping::SearchInNeighbors src/LocalMapping.cc:716-900)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_neighbors", "n_neighbors2"))
def fuse_into_neighbors(st: mstate.MapState, cam, kf_new: jax.Array,
                        n_neighbors: int = 5, radius: float = 3.0,
                        n_neighbors2: int = 0):
    """Both fuse directions of the reference's SearchInNeighbors
    (src/LocalMapping.cc:716-900): project kf_new's landmarks into neighbor
    KFs AND the neighbors' landmarks back into kf_new. Forward matches
    carry the reference's full Fuse semantics (LGmatcher::Fuse,
    src/LGmatcher.cpp:1096-1288): an unassociated target keypoint gains an
    observation; a target keypoint already bound to a DIFFERENT landmark
    triggers MapPoint::Replace — the better-observed landmark absorbs the
    other (observations redirected, counters combined). Without the
    replace arm, revisit-created duplicates keep observation counts split
    across copies forever and keyframe redundancy never crosses the cull
    bar (round-4 red test: sustained-revisit KF backlog).

    n_neighbors2 > 0 extends the target set with up to n_neighbors2 best
    covisible KFs of EACH one-hop neighbor (the reference's
    covisible-of-covisible extension, src/LocalMapping.cc:735-748;
    duplicates and already-selected targets deduped the way its
    mnFuseTargetForKF stamp does)."""
    K = st.caps.K
    neigh, w = mstate.best_covisible(st, kf_new, n_neighbors)
    pair_ok = (w > 0) & st.kf_mask[neigh]                      # [nn]

    if n_neighbors2:
        # second-hop candidates: best covisibles of each one-hop target,
        # excluding kf_new, the one-hop set, and dead keyframes
        excl = sless.id_mask(jnp.concatenate([neigh, kf_new[None]]),
                             jnp.concatenate([pair_ok, jnp.ones(1, bool)]),
                             K)
        rows = jnp.where((st.kf_mask & ~excl)[None, :], st.covis[neigh], -1)
        rows = jnp.where(pair_ok[:, None], rows, -1)           # [nn,K]
        idx2 = jnp.argsort(-rows, axis=1)[:, :n_neighbors2]
        w2 = jnp.take_along_axis(rows, idx2, 1)
        cand = idx2.reshape(-1).astype(jnp.int32)
        cok = w2.reshape(-1) > 0
        # first-occurrence dedupe across the flattened candidate list
        keys = jnp.where(cok, cand, K)
        order = jnp.argsort(keys, stable=True)
        ks = keys[order]
        first = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
        cok &= first[jnp.argsort(order)]
        neigh = jnp.concatenate([neigh, cand])
        pair_ok = jnp.concatenate([pair_ok, cok])

    obs_new = st.obs_lm[kf_new]
    has_lm = obs_new >= 0
    lm_ids = jnp.where(has_lm, obs_new, 0)
    lm_pos = st.lm_pos[lm_ids]
    lm_desc = st.lm_desc[lm_ids]
    base_mask = has_lm & st.lm_mask[lm_ids]

    # forward: batched projection + window match over all neighbors —
    # against ALL valid keypoints (bound targets feed the replace arm)
    def one(kc, ok_i):
        xy, vis, _, _ = matching.project_landmarks(
            st.kf_R[kc], st.kf_t[kc], cam, lm_pos, base_mask & ok_i)
        m = matching.fuse_candidates(xy, vis, lm_desc, st.kf_kp[kc],
                                     st.kf_kp_mask[kc], st.kf_desc[kc],
                                     radius=radius)
        tgt = st.obs_lm[kc][m.idx]          # landmark at the matched kp
        return m.idx, m.ok, tgt

    idxs, oks, tgts = jax.vmap(one)(neigh, pair_ok)
    tgt_free = tgts < 0
    tgt_live = (tgts >= 0) & jnp.take(st.lm_mask, jnp.maximum(tgts, 0))
    # all nn neighbor rows in ONE fused update (multi-binder semantics:
    # the same landmark may fuse into several neighbors)
    st = mstate.add_observations_multi(st, neigh, idxs, lm_ids,
                                       oks & tgt_free)
    # replace arm: target keypoint bound to a different landmark — keep the
    # better-observed of the pair, absorb the other (MapPoint::Replace)
    nn_f = neigh.shape[0]
    src_f = jnp.broadcast_to(lm_ids, (nn_f, lm_ids.shape[0])).reshape(-1)
    tgt_f = jnp.maximum(tgts, 0).reshape(-1)
    pair_valid = (oks & tgt_live & (tgts != src_f.reshape(tgts.shape))
                  ).reshape(-1)
    n_src = jnp.take(st.lm_n_obs, src_f)
    n_tgt = jnp.take(st.lm_n_obs, tgt_f)
    keep_f = jnp.where(n_src >= n_tgt, src_f, tgt_f)
    kill_f = jnp.where(n_src >= n_tgt, tgt_f, src_f)
    L = st.caps.L
    # each kill id at most once (replace_landmarks contract): stable
    # first-occurrence dedupe on the kill id
    keys = jnp.where(pair_valid, kill_f, L)
    order = jnp.argsort(keys, stable=True)
    ks = keys[order]
    first = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    pair_valid &= first[jnp.argsort(order)]
    # no kill-keep chains in one pass: drop pairs whose keep id is itself
    # being absorbed (its observations would redirect to a dead slot); the
    # next fuse pass catches the transitive merge
    killed_mask = sless.id_mask(jnp.where(pair_valid, kill_f, L - 1),
                                pair_valid, L)
    pair_valid &= ~jnp.take(killed_mask, keep_f)
    st = mstate.replace_landmarks(st, kill_f, keep_f, pair_valid)

    # reverse: the targets' landmarks projected into kf_new — binds the
    # new keyframe's still-unbound keypoints to EXISTING map points before
    # they'd be re-triangulated as duplicates (reference: the second Fuse
    # pass over vpFuseCandidates gathered from ALL targets incl. second
    # hops, src/LocalMapping.cc:778-870)
    nn, N = neigh.shape[0], st.obs_lm.shape[1]
    obs_n = st.obs_lm[neigh]                                   # [nn,N]
    has_n = (obs_n >= 0) & st.kf_kp_mask[neigh] & pair_ok[:, None]
    lm2 = jnp.where(has_n, obs_n, 0).reshape(-1)               # [nn*N]
    has2 = has_n.reshape(-1) & st.lm_mask[lm2]
    # skip landmarks kf_new already observes (observer-bit test)
    word = st.lm_obs_bits[lm2, kf_new // 32]
    seen_by_new = (word >> (kf_new % 32)) & 1
    has2 &= seen_by_new == 0
    # first-occurrence dedupe: a landmark bound in several neighbors keeps
    # one candidate row (duplicates soak up mutual-best slots). Stable
    # sort-by-id + neighbor-difference instead of an O(M^2) equality
    # matrix; among equal ids the stable sort keeps the lowest row first,
    # matching first-occurrence semantics.
    L = st.caps.L
    keys = jnp.where(has2, lm2, L)
    order = jnp.argsort(keys, stable=True)
    ks = keys[order]
    first_sorted = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    has2 &= first_sorted[jnp.argsort(order)]
    xy2, vis2, _, _ = matching.project_landmarks(
        st.kf_R[kf_new], st.kf_t[kf_new], cam, st.lm_pos[lm2], has2)
    unb_new = (obs_new < 0) & st.kf_kp_mask[kf_new]
    m2 = matching.fuse_candidates(xy2, vis2, st.lm_desc[lm2],
                                  st.kf_kp[kf_new], unb_new,
                                  st.kf_desc[kf_new], radius=radius)
    return mstate.add_observations(st, kf_new, m2.idx, lm2, m2.ok)


# ---------------------------------------------------------------------------
# Local BA window gather + solve
# (reference: Optimizer::LocalBundleAdjustment src/Optimizer.cc:1116-1499)
# ---------------------------------------------------------------------------


def _lba_window_select(st: mstate.MapState, center_kf: jax.Array,
                       P_opt: int, L_loc: int):
    """Shared window/landmark selection of the local BA (used by the solver
    AND lba_window_stats — one definition keeps the coverage numbers honest
    about the window the solver actually optimizes).

    Returns (opt_idx [P_opt], opt_real [P_opt], win_cnt [L], lm_sel [L],
    loc_lm [L_loc], loc_lm_valid [L_loc], inv [L])."""
    # --- select optimized keyframes ---
    wrow = jnp.where(st.kf_mask, st.covis[center_kf], -1).at[center_kf].set(-1)
    top_idx = jnp.argsort(-wrow)[:P_opt - 1]
    top_w = wrow[top_idx]
    opt_idx = jnp.concatenate([center_kf[None], top_idx])      # [P_opt]
    opt_real = jnp.concatenate([jnp.ones(1, bool), top_w > 0])
    opt_real &= st.kf_mask[opt_idx]

    # --- landmarks observed by the optimized set ---
    # window observation count doubles as the selection mask (scatter-free
    # equivalent of local_map_landmark_mask over the window KFs), ranked by
    # how many WINDOW keyframes observe each landmark — when the local map
    # overflows the cap, the multi-view-constrained points carry the solve
    # (picking by slot id skews to the oldest keyframe's points and can
    # leave the center pose nearly unconstrained).
    # Counted from the landmark observer BITMASKS: win_cnt[l] =
    # popcount(lm_obs_bits[l] & window_bits) — [L, K/32] word ops instead
    # of the dense [L, P_opt*N] id_count compare (268M lane-ops, ~2 ms of
    # every keyframe program). The bitmask is a conservative superset of
    # the obs table (LBA outlier drops don't clear bits), which can only
    # rank a stale landmark a little high / admit it into unused slots —
    # its zero live observations contribute nothing to the solve.
    obs_w = st.obs_lm[opt_idx]                                 # [P_opt,N]
    valid_w = ((obs_w >= 0) & st.kf_kp_mask[opt_idx] &
               opt_real[:, None])
    from dani_slam_tpu.core import scatterless as sless
    n_words = st.lm_obs_bits.shape[1]
    opt_words = jax.vmap(mstate._kf_bit_words,
                         in_axes=(0, None))(opt_idx, n_words)  # [P_opt,nw]
    win_bits = jnp.sum(jnp.where(opt_real[:, None], opt_words, 0),
                       axis=0).astype(st.lm_obs_bits.dtype)    # disjoint
    win_cnt = jnp.sum(jax.lax.population_count(
        st.lm_obs_bits & win_bits[None, :]), axis=1).astype(jnp.int32)
    lm_sel = st.lm_mask & (win_cnt > 0)
    # argsort not lax.top_k: TPU top_k is ~100x slower at L=2^15 (see
    # core/state.free_slots)
    lkey = jnp.where(lm_sel, win_cnt, -1)
    loc_lm = jnp.argsort(-lkey)[:L_loc]              # [L_loc] global ids
    loc_lm_valid = lm_sel[loc_lm]
    inv = sless.id_lookup(loc_lm, loc_lm_valid,
                          jnp.arange(L_loc, dtype=jnp.int32), st.caps.L,
                          jnp.full((st.caps.L,), -1, jnp.int32))
    inv = jnp.where(lm_sel, inv, -1)   # only selected map to local
    return opt_idx, opt_real, win_cnt, lm_sel, loc_lm, loc_lm_valid, inv


@partial(jax.jit, static_argnames=("P_opt", "P_fix", "L_loc", "iters"))
def local_bundle_adjustment(st: mstate.MapState, cam, center_kf: jax.Array,
                            P_opt: int = 8, P_fix: int = 8,
                            L_loc: int = 2048, iters: int = 5):
    # iters=5 matches the reference's first LBA phase (5 iterations, then
    # 10 more only when not interrupted, src/Optimizer.cc:1350-1365); the
    # window re-solves at every keyframe, so truncation self-corrects
    """Optimize the covisibility window around center_kf.

    Window: center + its (P_opt-1) best covisible KFs are optimized; the
    P_fix next-best observers of the window's landmarks are fixed anchors
    (gauge). Landmarks: up to L_loc observed by the optimized set.
    """
    K, N = st.obs_lm.shape
    from dani_slam_tpu.core import scatterless as sless
    (opt_idx, opt_real, win_cnt, lm_sel, loc_lm, loc_lm_valid,
     inv) = _lba_window_select(st, center_kf, P_opt, L_loc)

    # --- fixed keyframes: other observers of the selected landmarks ---
    obs_valid = st.obs_lm >= 0
    obs_safe = jnp.where(obs_valid, st.obs_lm, 0)
    sees_local = obs_valid & (jnp.take(inv, obs_safe) >= 0)    # [K,N]
    observer_cnt = jnp.sum(sees_local, axis=1).astype(jnp.int32)
    kf_sel = sless.id_mask(opt_idx, opt_real, K)
    observer_cnt = jnp.where(st.kf_mask & ~kf_sel, observer_cnt, 0)
    fix_idx = jnp.argsort(-observer_cnt)[:P_fix]
    fix_real = observer_cnt[fix_idx] > 0

    all_idx = jnp.concatenate([opt_idx, fix_idx])              # [P]
    all_real = jnp.concatenate([opt_real, fix_real])
    P = P_opt + P_fix
    # Gauge: out-of-window observers are fixed anchors (reference fixes
    # observer KFs + the map-origin KF, src/Optimizer.cc:1220-1260).
    # Keyframe slots are allocated in creation order, so the smallest
    # occupied slot index over the whole map is the origin; when it falls
    # inside the optimized window it is pinned like the reference pins
    # mnId==0. When NO real external anchors exist (fresh-map regime: every
    # KF is in the window) the oldest window slot is pinned instead so the
    # solve remains gauged. Pinning the oldest window slot unconditionally
    # is wrong: with real anchors present it can pin the very pose the solve
    # must correct (round-4 red test: center was the smallest window slot).
    oldest_pos = jnp.argmin(jnp.where(opt_real, opt_idx, st.caps.K + 1))
    origin_kf = jnp.argmax(st.kf_mask)  # smallest occupied slot (creation 0)
    origin_in_win = opt_real & (opt_idx == origin_kf)
    no_anchor = jnp.sum(fix_real.astype(jnp.int32)) == 0
    pose_fixed = jnp.concatenate([jnp.zeros(P_opt, bool),
                                  jnp.ones(P_fix, bool)])
    pose_fixed = pose_fixed | jnp.pad(origin_in_win, (0, P_fix))
    pose_fixed = pose_fixed.at[oldest_pos].set(
        pose_fixed[oldest_pos] | no_anchor)
    # Monocular scale gauge: ONE fixed pose pins 6 DoF but NOT scale — with
    # no out-of-window observers (early map: every KF is in the window) the
    # whole window can shrink/grow freely and the map scale random-walks per
    # BA. Anchor the second-oldest window KF too when there are no real
    # external anchors; the fixed BASELINE between two poses pins scale.
    second_key = jnp.where(opt_real, opt_idx, st.caps.K + 1).at[
        oldest_pos].set(st.caps.K + 1)
    second_pos = jnp.argmin(second_key)
    pose_fixed = pose_fixed.at[second_pos].set(
        pose_fixed[second_pos] | no_anchor)

    # --- observations from the window ---
    # rows: P x N flattened
    okf = jnp.repeat(jnp.arange(P), N)
    row_lm = st.obs_lm[all_idx].reshape(-1)
    row_xy = st.kf_kp[all_idx].reshape(-1, 2)
    row_valid = ((row_lm >= 0) & st.kf_kp_mask[all_idx].reshape(-1) &
                 jnp.repeat(all_real, N))
    row_loc = jnp.take(inv, jnp.where(row_lm >= 0, row_lm, 0))
    row_valid &= row_loc >= 0
    # per-observation information by pyramid level (reference: invSigma2 on
    # every LBA edge, src/Optimizer.cc:1320-1350)
    row_info = 1.2 ** (-2.0 * st.kf_octave[all_idx].reshape(-1)
                       .astype(jnp.float32))

    res = ba_ops.ba_solve(
        st.kf_R[all_idx], st.kf_t[all_idx], pose_fixed | ~all_real,
        st.lm_pos[loc_lm], loc_lm_valid, cam,
        okf, jnp.where(row_valid, row_loc, 0), row_xy, row_valid,
        obs_info=row_info, iters=iters)

    # --- write back ---
    upd = all_real & ~pose_fixed
    safe_idx = jnp.where(upd, all_idx, K - 1)
    new_R = st.kf_R.at[safe_idx].set(
        jnp.where(upd[:, None, None], res.R, st.kf_R[safe_idx]))
    new_t = st.kf_t.at[safe_idx].set(
        jnp.where(upd[:, None], res.t, st.kf_t[safe_idx]))
    # gather-side writeback via the inverse map (no 2048-row scatter)
    upd_lm = (inv >= 0) & jnp.take(loc_lm_valid, jnp.maximum(inv, 0))
    new_lm = jnp.where(upd_lm[:, None],
                       res.lm_pos[jnp.maximum(inv, 0)], st.lm_pos)
    # drop observations classified as outliers (reference erases high-chi2
    # edges after LBA, src/Optimizer.cc:1391-1420) — whole-row writes (a
    # flat 16k-element scatter serializes on TPU; P row updates don't)
    out_rows = (row_valid & ~res.obs_inlier).reshape(P, N)
    obs_upd = st.obs_lm.at[all_idx].set(
        jnp.where(out_rows, -1, st.obs_lm[all_idx]))
    return dataclasses.replace(st, kf_R=new_R, kf_t=new_t, lm_pos=new_lm,
                               obs_lm=obs_upd)


@partial(jax.jit, static_argnames=("P_opt", "P_fix", "L_loc"))
def lba_window_stats(st: mstate.MapState, center_kf: jax.Array,
                     P_opt: int = 8, P_fix: int = 8, L_loc: int = 2048):
    """Measure local-BA window coverage (how much the fixed-shape window
    drops vs the reference's optimize-everything semantics,
    src/Optimizer.cc:1116-1260). Returns int32 [4]:
      [0] landmarks observed by the optimized-KF window,
      [1] of those, landmarks admitted into the L_loc slots,
      [2] window observations total,
      [3] window observations retained after the landmark cap.
    Mirrors local_bundle_adjustment's selection exactly (observation-count
    ranking); used by tests and the stage profiler to keep the overflow
    honest rather than silent."""
    K, N = st.obs_lm.shape
    (opt_idx, opt_real, win_cnt, lm_sel, loc_lm, loc_lm_valid,
     _inv) = _lba_window_select(st, center_kf, P_opt, L_loc)
    kept = jnp.zeros((st.caps.L,), bool).at[loc_lm].set(loc_lm_valid)
    obs_w = st.obs_lm[opt_idx]
    valid_w = (obs_w >= 0) & st.kf_kp_mask[opt_idx] & opt_real[:, None]

    n_window_lm = jnp.sum(lm_sel.astype(jnp.int32))
    n_kept_lm = jnp.sum(kept.astype(jnp.int32))
    obs_flat = jnp.where(valid_w, obs_w, 0).reshape(-1)
    n_obs = jnp.sum(valid_w.astype(jnp.int32))
    n_obs_kept = jnp.sum((valid_w.reshape(-1) &
                          jnp.take(kept, obs_flat)).astype(jnp.int32))
    return jnp.stack([n_window_lm, n_kept_lm, n_obs, n_obs_kept])


# ---------------------------------------------------------------------------
# Keyframe culling (reference: LocalMapping::KeyFrameCulling
# src/LocalMapping.cc:904 — erase local keyframes whose landmarks are >=90%
# observed by >=3 other keyframes; Nd=21 temporal window)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_check", "max_kills", "inertial",
                                   "close_only"))
def cull_redundant_keyframes(st: mstate.MapState, center_kf: jax.Array,
                             n_check: int = 10,
                             redundancy: float = 0.9,
                             max_kills: int = 2,
                             inertial: bool = False,
                             close_only: bool = False,
                             close_depth: float = 3.0,
                             nd_window: int = 21):
    """Check the covisible neighbors of center_kf; remove up to `max_kills`
    redundant KFs per call (the reference erases every redundant KF in the
    local window per pass; a small cap per keyframe keeps up in practice,
    and the queue re-runs culling every cycle). One fused pass: each
    subsequent candidate is scored with the previous kills' observations
    already discounted (sequential-cull semantics), and the state update —
    the expensive whole-map select — is applied once.

    Sensor-aware policy (reference: LocalMapping::KeyFrameCulling,
    src/LocalMapping.cc:904-1056):
      * `redundancy` — 0.9 visual / mono-inertial, 0.5 stereo/RGB-D-inertial
        (the caller picks; src/LocalMapping.cc:914-920);
      * `close_only` — stereo/RGB-D count only CLOSE points (measured depth
        in (0, close_depth)) toward the redundancy fraction
        (src/LocalMapping.cc:962-965);
      * `inertial` — temporal-chain guards: no culling until the map
        exceeds `nd_window` keyframes, never the two newest, both temporal
        neighbors must exist, and the post-kill time gap t = t_next-t_prev
        must satisfy (imu_initialized AND older than the Nd most recent AND
        t<3s) OR t<0.5s, with the pre-VIBA2 small-displacement branch
        (<2 cm and t<3 s; camera-center displacement approximates the
        reference's IMU-frame positions — the lever-arm delta is
        second-order at 2 cm scale) (src/LocalMapping.cc:1012-1045).
        Preintegration-window merging across the cull is the System's job
        (Preintegrated::MergePrevious analogue, slam/system.py).

    The reference additionally scale-gates the observer count (observers
    must see the point at octave <= candidate octave+1); that needs a
    per-landmark octave histogram this state does not maintain — with the
    production RGB-D pyramid at 1 level it is a no-op, and for deep mono
    pyramids it only makes culling LESS eager (deliberate cut, PARITY.md).
    """
    K = st.caps.K
    neigh, w = mstate.best_covisible(st, center_kf, n_check)

    obs_valid = st.obs_lm >= 0                        # [K,N]
    if close_only:
        d = st.kf_depth
        count_valid = obs_valid & jnp.isfinite(d) & (d > 0) & (d < close_depth)
    else:
        count_valid = obs_valid
    obs_safe = jnp.where(obs_valid, st.obs_lm, 0)
    origin = jnp.argmax(st.kf_mask)
    arangeK = jnp.arange(K, dtype=jnp.int32)

    def redundancy_of(k, n_obs_adj, killed):
        row_valid = count_valid[k]
        lm = obs_safe[k]
        n_obs = jnp.take(st.lm_n_obs, lm) - jnp.take(n_obs_adj, lm)
        redundant = row_valid & (n_obs >= 4)   # seen by >=3 others + itself
        n_total = jnp.sum(row_valid.astype(jnp.int32))
        n_red = jnp.sum(redundant.astype(jnp.int32))
        frac = n_red.astype(jnp.float32) / jnp.maximum(n_total, 1)
        # never cull the newest KF, the map origin, or near-empty KFs
        protected = ((k == center_kf) | (k == origin) | (n_total < 30))
        alive = st.kf_mask[k] & ~killed[k]
        return jnp.where(alive & ~protected & (w[0] >= 0), frac, -1.0)

    def inertial_gate(k, killed):
        """Temporal-chain guards for one candidate given the kills so far."""
        alive = st.kf_mask & ~killed
        t_all = st.kf_time
        t_k = t_all[k]
        others = alive & (arangeK != k)
        prev_key = jnp.where(others & (t_all < t_k), t_all, -jnp.inf)
        next_key = jnp.where(others & (t_all > t_k), t_all, jnp.inf)
        t_prev = jnp.max(prev_key)
        t_next = jnp.min(next_key)
        has_chain = jnp.isfinite(t_prev) & jnp.isfinite(t_next)
        tgap = t_next - t_prev
        # Nd-th most recent alive time + second-newest (descending sort)
        sorted_t = -jnp.sort(jnp.where(alive, -t_all, jnp.inf))
        not_newest2 = t_k < sorted_t[jnp.minimum(1, K - 1)]
        older_than_window = t_k < sorted_t[jnp.minimum(nd_window, K - 1)]
        ok_t = ((st.imu_initialized & older_than_window & (tgap < 3.0)) |
                (tgap < 0.5))
        # pre-VIBA2 barely-moved branch (reference uses IMU positions)
        prev_slot = jnp.argmax(prev_key)
        C_k = -jnp.einsum('ji,j->i', st.kf_R[k], st.kf_t[k])
        C_p = -jnp.einsum('ji,j->i', st.kf_R[prev_slot], st.kf_t[prev_slot])
        ok_d = (~st.imu_ba2 & (jnp.linalg.norm(C_k - C_p) < 0.02) &
                (tgap < 3.0))
        n_alive = jnp.sum(alive.astype(jnp.int32))
        return ((n_alive > nd_window) & not_newest2 & has_chain &
                (ok_t | ok_d))

    # --- sequential candidate selection (unrolled; max_kills is small) ---
    adj = jnp.zeros((st.caps.L,), jnp.int32)
    killed = jnp.zeros((K,), bool)
    kills, kflags = [], []
    for _ in range(max_kills):
        fracs = jax.vmap(redundancy_of, in_axes=(0, None, None))(
            neigh, adj, killed)
        i = jnp.argmax(fracs)
        k_i = neigh[i]
        kill = fracs[i] >= redundancy
        if inertial:
            kill &= inertial_gate(k_i, killed)
        adj = adj + sless.id_count(obs_safe[k_i], obs_valid[k_i] & kill,
                                   st.caps.L)
        killed = killed | (kill & (arangeK == k_i))
        kills.append(k_i)
        kflags.append(kill)

    # --- combined removal (cull_keyframe semantics x max_kills) ---
    kills = jnp.stack(kills)
    kflag = jnp.stack(kflags)
    kill_mask = killed
    n_words = st.lm_obs_bits.shape[1]
    words = jax.vmap(mstate._kf_bit_words, in_axes=(0, None))(kills, n_words)
    clear = jnp.zeros_like(words[0])
    for i in range(max_kills):
        clear = clear | jnp.where(kflag[i], words[i], 0)
    # re-parent children of each killed KF to its parent (sequentially, so
    # a k1->k2 parent chain resolves like successive cull_keyframe calls)
    parents = st.spanning_parent
    for i in range(max_kills):
        p_of_k = parents[kills[i]]
        parents = jnp.where(kflag[i] & (parents == kills[i]), p_of_k,
                            parents)
        parents = jnp.where(kflag[i] & (arangeK == kills[i]), -1, parents)
    return dataclasses.replace(
        st,
        kf_mask=st.kf_mask & ~kill_mask,
        obs_lm=jnp.where(kill_mask[:, None], -1, st.obs_lm),
        lm_n_obs=st.lm_n_obs - adj,
        lm_obs_bits=st.lm_obs_bits & ~clear[None, :],
        covis=jnp.where(kill_mask[:, None] | kill_mask[None, :], 0,
                        st.covis),
        spanning_parent=parents,
    )


# ---------------------------------------------------------------------------
# Fused keyframe step — ONE device program per keyframe: insert + landmark
# creation + fuse + local BA + culling (the whole LocalMapping::Run pipeline,
# src/LocalMapping.cc:85-107, as a single XLA program).
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("use_depth", "do_ba", "do_aux",
                                   "n_neighbors", "matcher_model",
                                   "ba_iters", "cull_inertial",
                                   "cull_max_kills", "cull_close_only",
                                   "fuse_two_hop"))
def keyframe_step(st: mstate.MapState, cam, feat_xy, feat_valid, feat_desc,
                  feat_depth, bind, R, t, time, frame_id,
                  use_depth: bool = False, do_ba: bool = True,
                  do_aux: bool = True,
                  max_depth: float = 40.0, n_neighbors: int = 5,
                  feat_octave=None, matcher_model=None, matcher_params=None,
                  chain=None, ba_iters: int = 5,
                  cull_redundancy: float = 0.9, cull_inertial: bool = False,
                  cull_max_kills: int = 2, cull_close_only: bool = False,
                  cull_close_depth: float = 3.0, fuse_two_hop: int = 0):
    """Insert a keyframe and run the full mapping pipeline. Returns
    (st, kf_slot, n_tracked, chain') where chain'/(corr) re-anchor the
    tracker's pose chain onto the BA-refined keyframe pose (reference:
    Tracking re-reads the BA-updated map, src/Tracking.cc:1909-1915) —
    folded into this program so the keyframe costs one dispatch.

    do_aux gates the non-critical maintenance passes (fuse-into-neighbors +
    culling): the System alternates them across keyframes to halve their
    average device cost — the reference's LocalMapping thread similarly
    skips Fuse/culling when its queue backs up (CheckNewKeyFrames guards,
    src/LocalMapping.cc:85-107), trading maintenance latency for
    throughput, not correctness (both are idempotent catch-up passes).

    chain: optional (R_cur, t_cur, R_last, t_last) tracker poses; chain'
    is (R_cur', t_cur', R_last', t_last', corr_R, corr_t) or None."""
    N = feat_xy.shape[0]
    octave = (feat_octave if feat_octave is not None
              else jnp.zeros((N,), jnp.int8))
    st, k = mstate.insert_keyframe(
        st, R, t, time, frame_id, feat_xy, feat_valid, feat_desc, feat_depth,
        octave, bind)
    if use_depth:
        st = create_depth_landmarks(st, cam, k, max_depth=max_depth)
    st = create_new_landmarks(st, cam, k, n_neighbors=n_neighbors,
                              matcher_model=matcher_model,
                              matcher_params=matcher_params)
    if do_aux:
        st = fuse_into_neighbors(st, cam, k, n_neighbors=n_neighbors,
                                 n_neighbors2=fuse_two_hop)
    if do_ba:
        st = local_bundle_adjustment(st, cam, k, iters=ba_iters)
    if do_aux:
        st = cull_bad_landmarks(st, st.next_kf_counter)
        # a few redundant neighbors culled per keyframe (the reference
        # erases every redundant KF in the local window per pass) — one
        # fused multi-kill pass with sensor-aware policy
        st = cull_redundant_keyframes(st, k, redundancy=cull_redundancy,
                                      max_kills=cull_max_kills,
                                      inertial=cull_inertial,
                                      close_only=cull_close_only,
                                      close_depth=cull_close_depth)
    chain_out = None
    if chain is not None:
        R_cur, t_cur, R_last, t_last = chain
        corr = lie.se3_mul(*lie.se3_inv(R, t), st.kf_R[k], st.kf_t[k])
        R_c, t_c = lie.se3_mul(R_cur, t_cur, *corr)
        R_l, t_l = lie.se3_mul(R_last, t_last, *corr)
        chain_out = (R_c, t_c, R_l, t_l, corr[0], corr[1])
    return st, k, jnp.sum((bind >= 0).astype(jnp.int32)), chain_out


# ---------------------------------------------------------------------------
# Culling (reference: LocalMapping::MapPointCulling src/LocalMapping.cc:348)
# ---------------------------------------------------------------------------

@jax.jit
def cull_bad_landmarks(st: mstate.MapState, current_kf_counter: jax.Array,
                       min_found_ratio: float = 0.25):
    """Remove landmarks with poor track record: found/visible < 0.25, or
    still < 2 observations several keyframes after creation (mono rule)."""
    ratio = st.lm_found.astype(jnp.float32) / jnp.maximum(
        st.lm_visible.astype(jnp.float32), 1.0)
    # lm_first_kf holds the monotone keyframe COUNTER at creation (never
    # reused, unlike slots), so ages stay correct across KF culling.
    age = current_kf_counter - st.lm_first_kf
    # Only RECENT landmarks are candidates (the reference walks
    # mlpRecentAddedMapPoints and drops a point from the list — i.e. it
    # graduates permanently — after ~3 keyframes). Counter 0 marks
    # init-map points (created before the first keyframe), exempt.
    recent = (age <= 3) & (st.lm_first_kf > 0)
    kill = st.lm_mask & recent & ((ratio < min_found_ratio) |
                                  ((age >= 2) & (st.lm_n_obs < 2)))
    return mstate.cull_landmarks(st, kill)
