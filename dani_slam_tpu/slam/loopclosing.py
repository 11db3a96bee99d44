"""Loop closing and relocalization.

Reference: src/LoopClosing.cc — place-recognition candidates
(NewDetectCommonRegions:325 via KeyFrameDatabase), Sim3 verification
(DetectCommonRegionsFromBoW:579 -> Sim3Solver RANSAC:699 -> OptimizeSim3:768),
loop correction (CorrectLoop:970 — propagate the corrective Sim3 over the
covisible group, fuse duplicates, OptimizeEssentialGraph:1179, spawn GBA);
Tracking::Relocalization (src/Tracking.cc:3666 — BoW candidates ->
per-candidate matching -> MLPnP RANSAC -> pose optimization).

TPU re-design: the detector is the dense BoW database (models/vocab.py); the
candidate verification is one fused device program per candidate (landmark
descriptor matching -> batched Horn Sim3 RANSAC -> GN refinement); loop
correction transforms ALL keyframes/landmarks with gathered per-node
corrections in one program, then runs the dense Sim3 pose-graph optimizer.
Instead of a transient GBA thread, global BA is TIME-SLICED: bounded
chunks of LM iterations run over a map snapshot at subsequent keyframes and
the result is welded back with spanning-tree/reference-KF propagation
(gba_chunk/apply_gba) — the single-device equivalent of the reference's
concurrent GBA + mbStopGBA abort.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie, state as mstate
from dani_slam_tpu.models import vocab
from dani_slam_tpu.utils import verbose
from dani_slam_tpu.ops import ba as ba_ops
from dani_slam_tpu.ops import matching, pnp, posegraph, sim3 as sim3_ops


# ---------------------------------------------------------------------------
# Loop candidate verification
# ---------------------------------------------------------------------------

@jax.jit
def match_kf_landmarks(st: mstate.MapState, kf_a: jax.Array,
                       kf_b: jax.Array, th: float = 0.7):
    """Mutual-NN match between the landmark descriptors bound in two KFs.
    Returns camera-frame point pairs + pixel observations for Sim3 solving
    (reference gathers mvpMapPoints1/2 + mvX3Dc1/2, Sim3Solver.cc:84-112)."""
    obs_a = st.obs_lm[kf_a]
    obs_b = st.obs_lm[kf_b]
    has_a = (obs_a >= 0) & st.kf_kp_mask[kf_a]
    has_b = (obs_b >= 0) & st.kf_kp_mask[kf_b]
    la = jnp.where(has_a, obs_a, 0)
    lb = jnp.where(has_b, obs_b, 0)
    da = st.lm_desc[la]
    db = st.lm_desc[lb]
    d = matching.desc_distance_matrix(da, db)
    m = matching.masked_match(d, has_a[:, None] & has_b[None, :], th=th,
                              mutual=True)
    # camera-frame 3D points of matched landmarks
    pa = lie.se3_apply(st.kf_R[kf_a], st.kf_t[kf_a], st.lm_pos[la])
    pb_ids = lb[m.idx]
    pb = lie.se3_apply(st.kf_R[kf_b], st.kf_t[kf_b], st.lm_pos[pb_ids])
    return pa, pb, m.ok, st.kf_kp[kf_a], st.kf_kp[kf_b][m.idx], la, pb_ids


def _window_landmarks(st: mstate.MapState, kf: jax.Array, cam,
                      n_window: int):
    """Gather the landmarks observed by `kf` and its top covisible
    neighbors — the weld-window local map (reference: the merge/loop
    verification widens KF-to-KF matches with SearchByProjection over the
    candidate's covisible window, src/LoopClosing.cc:579-768). Returns
    (lm_ids [W*N], camera-frame points in kf's frame, pixel projections,
    valid mask) with duplicates across window keyframes masked out."""
    cov = jnp.where(st.kf_mask, st.covis[kf], -1)
    cov = cov.at[kf].set(jnp.iinfo(jnp.int32).max)   # anchor first
    order = jnp.argsort(-cov)[:n_window]
    ok_kf = cov[order] > 0
    obs = st.obs_lm[order]                            # [W,N]
    has = (obs >= 0) & st.kf_kp_mask[order] & ok_kf[:, None]
    lm = jnp.where(has, obs, -1).reshape(-1)
    has = has.reshape(-1) & st.lm_mask[jnp.maximum(lm, 0)]
    # first-occurrence mask: a landmark seen by several window KFs keeps
    # one row (duplicates would soak up mutual-NN slots). Stable
    # sort-by-id + neighbor-difference — O(M log M) instead of an O(M^2)
    # equality matrix; the stable sort keeps the lowest row per id,
    # matching first-occurrence semantics.
    Lcap = st.caps.L
    keys = jnp.where(has, lm, Lcap)
    order = jnp.argsort(keys, stable=True)
    ks = keys[order]
    first_sorted = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
    has = has & first_sorted[jnp.argsort(order)]
    lid = jnp.where(has, lm, 0)
    p_c = lie.se3_apply(st.kf_R[kf], st.kf_t[kf], st.lm_pos[lid])
    px = _cam.project(cam, p_c)
    in_img = ((p_c[:, 2] > 0.2) & (px[:, 0] >= 0) & (px[:, 1] >= 0)
              & (px[:, 0] < cam.width) & (px[:, 1] < cam.height))
    return lid, p_c, px, has & in_img


@partial(jax.jit, static_argnames=("fix_scale", "n_window"))
def verify_cross_map_candidate(st_a: mstate.MapState, st_b: mstate.MapState,
                               cam, kf_a: jax.Array, kf_b: jax.Array, key,
                               fix_scale: bool = False,
                               min_inliers: int = 25, n_window: int = 4):
    """Geometric verification between keyframes of two DIFFERENT maps
    (reference: the merge branch runs the same Sim3 machinery across maps,
    src/LoopClosing.cc:133-190; matches are widened over the covisible
    weld windows of both anchors as in DetectCommonRegionsFromBoW:579-768).
    Returns (T_ab sim3 from b-camera coords to a-camera coords, n_inliers,
    ok)."""
    la, pa, pxa, has_a = _window_landmarks(st_a, kf_a, cam, n_window)
    lb, pb_all, pxb, has_b = _window_landmarks(st_b, kf_b, cam, n_window)
    d = matching.desc_distance_matrix(st_a.lm_desc[la], st_b.lm_desc[lb])
    m = matching.masked_match(d, has_a[:, None] & has_b[None, :], th=0.7,
                              mutual=True)
    pb = pb_all[m.idx]
    res = sim3_ops.sim3_ransac(key, cam, cam, pa, pb, m.ok,
                               fix_scale=fix_scale, min_inliers=min_inliers)
    # refinement measurements: each side's own projection of the matched
    # landmark — a reprojection-weighted 3D-3D alignment (the reference
    # uses the keypoint observations; window landmarks unseen by the
    # anchor KF carry their predicted pixel instead)
    R, t, s, inl, n = sim3_ops.optimize_sim3(
        cam, cam, res.R, res.t, res.s, pa, pxa, pb,
        pxb[m.idx], m.ok & res.inliers, fix_scale=fix_scale)
    return (R, t, s), n, res.ok & (n >= min_inliers)


@partial(jax.jit, static_argnames=("fix_scale", "n_window"))
def refine_loop_from_hypothesis(st: mstate.MapState, cam,
                                kf_new: jax.Array, kf_cand: jax.Array,
                                T12, fix_scale: bool = False,
                                min_inliers: int = 20, n_window: int = 4,
                                radius: float = 8.0):
    """Projection-guided re-verification of an EXISTING loop hypothesis at
    a newer keyframe (reference: DetectAndReffineSim3FromLastKF,
    src/LoopClosing.cc:376-430/536-578 — each temporal 'coincidence' is a
    geometric hit through the propagated Sim3, not a fresh BoW match).

    T12 = (R,t,s) maps candidate-camera coords into kf_new-camera coords
    (the caller propagates the stored hypothesis through odometry).
    Projects the candidate's covisible-window landmarks into kf_new via
    T12, window-matches descriptors, then re-optimizes the Sim3 on pairs
    whose kf_new keypoint is bound to a landmark. Returns (T12', n, ok)."""
    lb, pb, _, has_b = _window_landmarks(st, kf_cand, cam, n_window)
    R12, t12, s12 = T12
    p_new = lie.sim3_apply(R12, t12, s12, pb)
    px_new = _cam.project(cam, p_new)
    vis = (has_b & (p_new[:, 2] > 0.2) &
           (px_new[:, 0] >= 0) & (px_new[:, 1] >= 0) &
           (px_new[:, 0] < cam.width) & (px_new[:, 1] < cam.height))
    m = matching.search_by_projection(
        px_new, vis, st.lm_desc[lb], st.kf_kp[kf_new],
        st.kf_kp_mask[kf_new], st.kf_desc[kf_new], radius=radius)
    # pairs where the matched kf_new keypoint is itself bound to a live
    # landmark: both 3D sets exist, as OptimizeSim3 needs
    obs_new = st.obs_lm[kf_new]
    la = jnp.where(m.ok, obs_new[m.idx], 0)
    pair_ok = m.ok & (obs_new[m.idx] >= 0) & st.lm_mask[la]
    pa = lie.se3_apply(st.kf_R[kf_new], st.kf_t[kf_new], st.lm_pos[la])
    pxa = st.kf_kp[kf_new][m.idx]
    # candidate-side observed pixel: the window landmark's projection into
    # the CANDIDATE keyframe (its own view)
    pxb = _cam.project(cam, pb)
    R, t, s, inl, n = sim3_ops.optimize_sim3(
        cam, cam, R12, t12, s12, pa, pxa, pb, pxb, pair_ok,
        fix_scale=fix_scale)
    return (R, t, s), n, n >= min_inliers


@jax.jit
def propagate_hypothesis(st: mstate.MapState, kf_new: jax.Array,
                         kf_prev: jax.Array, T12):
    """Carry a loop hypothesis forward through odometry:
    T_{new<-cand} = T_new_w o T_prev_w^-1 o T_{prev<-cand}
    (reference: gScw propagation, src/LoopClosing.cc:383-397)."""
    one = jnp.ones(())
    Rr, tr_, sr = lie.sim3_mul(st.kf_R[kf_new], st.kf_t[kf_new], one,
                               *lie.sim3_inv(st.kf_R[kf_prev],
                                             st.kf_t[kf_prev], one))
    return lie.sim3_mul(Rr, tr_, sr, *T12)


@partial(jax.jit, static_argnames=("fix_scale",))
def verify_loop_candidate(st: mstate.MapState, cam, kf_cur: jax.Array,
                          kf_cand: jax.Array, key, fix_scale: bool = False,
                          min_inliers: int = 20):
    """Full geometric verification of one loop candidate. Returns
    (T12 = (R,t,s) mapping candidate-camera coords into current-camera
    coords, n_inliers, ok)."""
    pa, pb, ok, kpa, kpb, la, lb = match_kf_landmarks(st, kf_cur, kf_cand)
    res = sim3_ops.sim3_ransac(key, cam, cam, pa, pb, ok,
                               fix_scale=fix_scale, min_inliers=min_inliers)
    R, t, s, inl, n = sim3_ops.optimize_sim3(
        cam, cam, res.R, res.t, res.s, pa, kpa, pb, kpb, ok & res.inliers,
        fix_scale=fix_scale)
    ok_final = res.ok & (n >= min_inliers)
    return (R, t, s), n, ok_final


# ---------------------------------------------------------------------------
# Loop correction
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iters", "fix_scale", "four_dof"))
def loop_pg_chunk(st: mstate.MapState, kf_cur: jax.Array,
                  kf_cand: jax.Array, T12, carry, iters: int = 3,
                  fix_scale: bool = False, four_dof: bool = False):
    """Run `iters` GN iterations of the loop essential graph over the
    SNAPSHOT map `st` and return the updated pose iterate carry
    (R [K,3,3], t [K,3], s [K]). Edges + relative measurements are rebuilt
    deterministically from the snapshot's PRE-correction poses each call
    (cheap einsum; carrying them would pin [K,K,3,3] buffers), so chunks
    compose exactly like one long optimize_essential_graph run. Bounded
    device time per call — dispatched across subsequent keyframes so a loop
    correction never stalls the frame loop (reference: all of CorrectLoop
    runs in the LoopClosing THREAD while Tracking continues at frame rate,
    src/LoopClosing.cc:970-1207; the time-sliced chunks are the
    single-device equivalent, like gba_chunk for the GBA)."""
    K = st.caps.K
    R12, t12, s12 = T12
    R_all, t_all = st.kf_R, st.kf_t
    s_all = jnp.ones((K,))
    R_c, t_c, s_c = carry

    loop_edges = st.loop_edges.at[kf_cur, kf_cand].set(True)
    edges = posegraph.build_essential_edges(
        st.covis, st.spanning_parent, loop_edges, st.kf_mask, covis_th=30)
    fixed = jnp.zeros((K,), bool).at[kf_cand].set(True)

    if four_dof:
        # relative SE3 measurements (scale forced to 1 by the caller's
        # yaw-only clamp); Edge4DoF convention: dR = Ri Rj^T, dt = origin of
        # cam j in cam i
        Rm = jnp.einsum('iab,jcb->ijac', R_all, R_all)         # Ri Rj^T
        Cj_in_i = (-jnp.einsum('ijab,jb->ija', Rm, t_all) +
                   t_all[:, None, :])                          # Ri(-Rj^T tj)+ti
        Rm = Rm.at[kf_cur, kf_cand].set(R12)
        Cj_in_i = Cj_in_i.at[kf_cur, kf_cand].set(t12)
        Ri12, ti12, _ = lie.sim3_inv(R12, t12, jnp.ones(()))
        Rm = Rm.at[kf_cand, kf_cur].set(Ri12)
        Cj_in_i = Cj_in_i.at[kf_cand, kf_cur].set(ti12)
        R_new, t_new = posegraph.optimize_essential_graph_4dof(
            R_c, t_c, edges, Rm, Cj_in_i, fixed, st.kf_mask,
            iters=iters)
        s_new = jnp.ones((K,))
    else:
        Rm, tm, sm = jax.vmap(lambda Ri, ti, si: jax.vmap(
            lambda Rj, tj, sj: posegraph.relative_sim3(Ri, ti, si, Rj, tj,
                                                       sj))(
            R_all, t_all, s_all))(R_all, t_all, s_all)
        # overwrite the loop edge measurement with the verified T12:
        # T_cur_corrected = T12 * T_cand  =>  T_rel(cur,cand) measured = T12
        Rm = Rm.at[kf_cur, kf_cand].set(R12)
        tm = tm.at[kf_cur, kf_cand].set(t12)
        sm = sm.at[kf_cur, kf_cand].set(s12)
        Ri12, ti12, si12 = lie.sim3_inv(R12, t12, s12)
        Rm = Rm.at[kf_cand, kf_cur].set(Ri12)
        tm = tm.at[kf_cand, kf_cur].set(ti12)
        sm = sm.at[kf_cand, kf_cur].set(si12)
        R_new, t_new, s_new = posegraph.optimize_essential_graph(
            R_c, t_c, s_c, edges, Rm, tm, sm, fixed, st.kf_mask,
            iters=iters, fix_scale=fix_scale)
    return R_new, t_new, s_new


@jax.jit
def loop_correction_apply(st: mstate.MapState, carry):
    """Turn a finished pose-graph iterate into the corrected SNAPSHOT map
    arrays: landmark correction via each landmark's reference keyframe
    (X' = S_k'^-1 * (T_k X), the exact per-KF Sim3 write-back,
    src/LoopClosing.cc:1009-1120) and the SE3 pose write-back
    T_k = [R_k, t_k / s_k] (CorrectedSim3 -> SetPose with eigt *= 1/s).
    Returns (R_out, t_out, lm_pos, dist_min, dist_max)."""
    K = st.caps.K
    R_new, t_new, s_new = carry
    ref = jnp.clip(st.lm_ref_kf, 0, K - 1)
    Xc = jnp.einsum('lij,lj->li', st.kf_R[ref], st.lm_pos) + st.kf_t[ref]
    Rki, tki, ski = lie.sim3_inv(R_new[ref], t_new[ref], s_new[ref])
    X_new = lie.sim3_apply(Rki, tki, ski, Xc)
    lm_pos = jnp.where(st.lm_mask[:, None], X_new, st.lm_pos)
    R_out = lie.orthonormalize(R_new)
    t_out = t_new / jnp.maximum(s_new[:, None], 1e-9)
    # scale-invariance bands of landmarks follow their reference KF's scale
    inv_s = 1.0 / jnp.maximum(s_new[ref], 1e-9)
    dist_min = jnp.where(st.lm_mask, st.lm_dist_min * inv_s, st.lm_dist_min)
    dist_max = jnp.where(st.lm_mask, st.lm_dist_max * inv_s, st.lm_dist_max)
    return R_out, t_out, lm_pos, dist_min, dist_max


@partial(jax.jit, static_argnames=("pg_iters", "fix_scale", "four_dof"))
def correct_loop(st: mstate.MapState, cam, kf_cur: jax.Array,
                 kf_cand: jax.Array, T12, pg_iters: int = 10,
                 fix_scale: bool = False, four_dof: bool = False):
    """Apply a verified loop closure SYNCHRONOUSLY (reference: CorrectLoop
    src/LoopClosing.cc:970-1215).

    Steps, all on device:
      1. corrected current pose: T_cur' = T12 * T_cand  (sim3)
      2. essential-graph optimization with the loop edge added; relative
         measurements are the PRE-correction relative poses (odometry), the
         loop edge carries T12, and the candidate side is the gauge anchor.
         four_dof selects the yaw+translation graph for gravity-aligned
         inertial maps (reference: OptimizeEssentialGraph4DoF,
         src/LoopClosing.cc:1179-1184).
      3. landmarks re-expressed through their reference keyframe's
         correction: X' = S_k'^-1 * (T_k X) — the exact per-KF Sim3
         write-back (src/LoopClosing.cc:1009-1120).

    Composed from loop_pg_chunk + loop_correction_apply, so the time-sliced
    path (LoopCloser.corr_async) computes bit-identical corrections when no
    keyframes interleave."""
    K = st.caps.K
    carry = (st.kf_R, st.kf_t, jnp.ones((K,)))
    carry = loop_pg_chunk(st, kf_cur, kf_cand, T12, carry, iters=pg_iters,
                          fix_scale=fix_scale, four_dof=four_dof)
    R_out, t_out, lm_pos, dist_min, dist_max = loop_correction_apply(
        st, carry)
    return dataclasses.replace(
        st, kf_R=R_out, kf_t=t_out, lm_pos=lm_pos,
        lm_dist_min=dist_min, lm_dist_max=dist_max,
        loop_edges=st.loop_edges.at[kf_cur, kf_cand].set(True))


@partial(jax.jit, static_argnames=("n_neighbors",))
def search_and_fuse(st: mstate.MapState, cam, kf_cur: jax.Array,
                    kf_cand: jax.Array, n_neighbors: int = 4,
                    radius: float = 4.0):
    """After loop correction: project the current KF's landmarks into the
    candidate side and merge duplicates (reference: SearchAndFuse
    src/LoopClosing.cc:2116 — corrected map points replace their loop-side
    twins; MapPoint::Replace keeps the better-observed one)."""
    from dani_slam_tpu.ops import matching as m_ops

    obs_cur = st.obs_lm[kf_cur]
    has_cur = (obs_cur >= 0) & st.kf_kp_mask[kf_cur]
    lm_ids = jnp.where(has_cur, obs_cur, 0)
    neigh, w = mstate.best_covisible(st, kf_cand, n_neighbors - 1)

    targets = jnp.concatenate([kf_cand[None], neigh])
    target_ok = jnp.concatenate([jnp.ones(1, bool), w > 0])

    for i in range(n_neighbors):
        kc = targets[i]
        ok_i = target_ok[i] & st.kf_mask[kc]
        xy, vis, _, _ = m_ops.project_landmarks(
            st.kf_R[kc], st.kf_t[kc], cam, st.lm_pos[lm_ids],
            has_cur & ok_i & st.lm_mask[lm_ids])
        m = m_ops.fuse_candidates(xy, vis, st.lm_desc[lm_ids],
                                  st.kf_kp[kc], st.kf_kp_mask[kc],
                                  st.kf_desc[kc], radius=radius)
        tgt_lm = st.obs_lm[kc][m.idx]            # landmark at matched kp
        same = tgt_lm == lm_ids
        bound = (tgt_lm >= 0) & ~same & m.ok
        free = (tgt_lm < 0) & m.ok
        # duplicates: keep the better-observed landmark
        n_cur = st.lm_n_obs[lm_ids]
        n_tgt = jnp.where(bound, st.lm_n_obs[jnp.maximum(tgt_lm, 0)], 0)
        keep = jnp.where(n_cur >= n_tgt, lm_ids, tgt_lm)
        kill = jnp.where(n_cur >= n_tgt, tgt_lm, lm_ids)
        st = mstate.replace_landmarks(st, jnp.maximum(kill, 0),
                                      jnp.maximum(keep, 0), bound)
        # unbound targets: new observation of the current landmark
        st = mstate.add_observations(st, kc, m.idx, lm_ids, free)
    return st


@partial(jax.jit, static_argnames=("iters",))
def global_bundle_adjustment(st: mstate.MapState, cam, iters: int = 10):
    """Full-map BA (reference: RunGlobalBundleAdjustment
    src/LoopClosing.cc:2269 -> Optimizer::BundleAdjustment:60, 10 iters).
    Optimizes all keyframes (first fixed) + all landmarks. Uses the
    Schur-free PCG solver (ops/ba_large.py): the explicit-Schur local solver
    cannot allocate its one-hot/H_pl tensors at whole-map capacities."""
    from dani_slam_tpu.ops import ba_large
    pose_fixed, okf, olm, oxy, ovalid, obs_info = _gba_problem(st)
    res = ba_large.ba_solve_pcg(st.kf_R, st.kf_t, pose_fixed, st.lm_pos,
                                st.lm_mask, cam, okf, olm,
                                oxy, ovalid, obs_info=obs_info, iters=iters)
    return dataclasses.replace(
        st, kf_R=jnp.where(st.kf_mask[:, None, None], res.R, st.kf_R),
        kf_t=jnp.where(st.kf_mask[:, None], res.t, st.kf_t),
        lm_pos=jnp.where(st.lm_mask[:, None], res.lm_pos, st.lm_pos))


# ---------------------------------------------------------------------------
# Time-sliced (async) global BA: the single-device equivalent of the
# reference's CONCURRENT GBA thread (RunGlobalBundleAdjustment runs while
# tracking/mapping continue; mbStopGBA aborts it; the result is welded back
# with spanning-tree / reference-KF propagation, src/LoopClosing.cc:1199-1380)
# ---------------------------------------------------------------------------

def _gba_problem(st_snap: mstate.MapState):
    """Observation problem of global_bundle_adjustment, factored so the
    time-sliced chunks rebuild it identically each call."""
    K, N = st_snap.obs_lm.shape
    first = jnp.argmax(st_snap.kf_mask)
    # two anchors: the origin KF and its strongest covisible partner — a
    # single fixed pose leaves the monocular SCALE gauge free, letting GBA
    # drift the whole map's scale (the reference fixes only the init KF and
    # relies on staying near the initialization; pinning the second anchor
    # makes the gauge explicit)
    cov_row = jnp.where(st_snap.kf_mask, st_snap.covis[first],
                        -1).at[first].set(-1)
    second = jnp.argmax(cov_row)
    pose_fixed = ((~st_snap.kf_mask) | (jnp.arange(K) == first) |
                  ((jnp.arange(K) == second) & (cov_row[second] > 0)))
    okf = jnp.repeat(jnp.arange(K), N)
    olm = st_snap.obs_lm.reshape(-1)
    oxy = st_snap.kf_kp.reshape(-1, 2)
    ovalid = (olm >= 0) & st_snap.kf_kp_mask.reshape(-1)
    obs_info = 1.2 ** (-2.0 *
                       st_snap.kf_octave.reshape(-1).astype(jnp.float32))
    return pose_fixed, okf, jnp.where(ovalid, olm, 0), oxy, ovalid, obs_info


@partial(jax.jit, static_argnames=("iters",))
def gba_chunk(st_snap: mstate.MapState, cam, carry, iters: int = 2):
    """Run `iters` LM iterations of global BA over the SNAPSHOT map and
    return the updated carry (R, t, lm, lam). Bounded device time per call
    (~iters x one PCG LM iteration) — dispatched between keyframes so a loop
    closure never stalls the frame loop for a whole inline GBA."""
    from dani_slam_tpu.ops import ba_large
    pose_fixed, okf, olm, oxy, ovalid, obs_info = _gba_problem(st_snap)
    return ba_large.ba_pcg_chunk(carry, pose_fixed, st_snap.lm_mask, cam,
                                 okf, olm, oxy, ovalid, obs_info=obs_info,
                                 iters=iters)


@jax.jit
def apply_gba(st: mstate.MapState, snap_kf_mask, snap_kf_fid, snap_lm_mask,
              snap_lm_first, R_gba, t_gba, lm_gba, chain_ref):
    """Weld a finished time-sliced GBA into the LIVE map (reference:
    LoopClosing.cc:1240-1380 — participant keyframes take their GBA poses;
    keyframes created DURING GBA are corrected through their spanning-tree
    parent, T_child_w' = T_child_parent o T_parent_w'; map points take their
    GBA positions or, if created during GBA, re-express through their
    reference keyframe's correction).

    Slot-reuse safety: a participant row must still hold the SAME keyframe
    (kf_frame_id match) / landmark (lm_first_kf creation-counter match) —
    culled-and-reused slots are treated as new. Returns (st', corr_R,
    corr_t): the pose correction of `chain_ref` (old^-1 o new) for the
    tracker's pose-chain re-anchoring."""
    K = st.caps.K
    part = snap_kf_mask & st.kf_mask & (st.kf_frame_id == snap_kf_fid)
    R_new = jnp.where(part[:, None, None], R_gba, st.kf_R)
    t_new = jnp.where(part[:, None], t_gba, st.kf_t)
    corrected = part
    # spanning-tree propagation to keyframes created during the GBA window.
    # The weld fires gba_iters/gba_chunk_iters keyframes after the loop
    # closure (default 5) and keyframes can be minted on consecutive frames,
    # so parent chains of depth ~window-length exist; 8 passes cover them
    # with margin (each pass is a cheap [K]-wide batched composition)
    for _ in range(8):
        par = jnp.clip(st.spanning_parent, 0, K - 1)
        fix = (st.spanning_parent >= 0) & st.kf_mask & ~corrected
        fix &= jnp.take(corrected, par)
        # T_child_parent from the LIVE (pre-weld) poses
        Rp_old, tp_old = st.kf_R[par], st.kf_t[par]
        Rrel = jnp.einsum('kij,klj->kil', st.kf_R, Rp_old)       # R Rp^T
        trel = st.kf_t - jnp.einsum('kij,kj->ki', Rrel, tp_old)
        Rc = jnp.einsum('kij,kjl->kil', Rrel, R_new[par])
        tc = jnp.einsum('kij,kj->ki', Rrel, t_new[par]) + trel
        R_new = jnp.where(fix[:, None, None], Rc, R_new)
        t_new = jnp.where(fix[:, None], tc, t_new)
        corrected |= fix
    # landmarks: participants take GBA positions; new ones re-express
    # through their (corrected) reference keyframe
    lm_part = snap_lm_mask & st.lm_mask & (st.lm_first_kf == snap_lm_first)
    ref = jnp.clip(st.lm_ref_kf, 0, K - 1)
    ref_ok = st.lm_mask & ~lm_part & jnp.take(corrected, ref)
    Xc = (jnp.einsum('lij,lj->li', st.kf_R[ref], st.lm_pos) +
          st.kf_t[ref])                                          # old cam
    Xw = jnp.einsum('lji,lj->li', R_new[ref], Xc - t_new[ref])   # new world
    lm_new = jnp.where(lm_part[:, None], lm_gba,
                       jnp.where(ref_ok[:, None], Xw, st.lm_pos))
    # tracker chain correction: old_ref^-1 o new_ref
    cR, ct = lie.se3_mul(*lie.se3_inv(st.kf_R[chain_ref],
                                      st.kf_t[chain_ref]),
                         R_new[chain_ref], t_new[chain_ref])
    st2 = dataclasses.replace(st, kf_R=R_new, kf_t=t_new, lm_pos=lm_new)
    return st2, cR, ct


@jax.jit
def apply_loop_weld(st: mstate.MapState, snap_kf_mask, snap_kf_fid,
                    snap_lm_mask, snap_lm_first, R_corr, t_corr, lm_corr,
                    dmin_corr, dmax_corr, kf_cur, kf_cand, cur_fid,
                    cand_fid, chain_ref):
    """Weld a finished TIME-SLICED loop correction into the LIVE map: the
    same spanning-tree / reference-KF propagation as apply_gba (keyframes
    and landmarks created during the sliced window follow their corrected
    parent / reference KF), plus the loop-specific extras — the corrected
    scale-invariance bands of participant landmarks and the loop edge
    (slot-reuse guarded by frame ids). Returns (st', corr_R, corr_t).

    Mono caveat: keyframes minted DURING the sliced window compose their
    relative SE3 onto the rescaled parent without rescaling the relative
    translation — a second-order error at typical per-window drift that the
    following sliced GBA absorbs (the reference avoids it by holding the
    map mutex during CorrectLoop, src/LoopClosing.cc:1000-1007)."""
    st2, cR, ct = apply_gba(st, snap_kf_mask, snap_kf_fid, snap_lm_mask,
                            snap_lm_first, R_corr, t_corr, lm_corr,
                            chain_ref)
    lm_part = snap_lm_mask & st.lm_mask & (st.lm_first_kf == snap_lm_first)
    dmin = jnp.where(lm_part, dmin_corr, st.lm_dist_min)
    dmax = jnp.where(lm_part, dmax_corr, st.lm_dist_max)
    edge_ok = ((st.kf_frame_id[kf_cur] == cur_fid) &
               (st.kf_frame_id[kf_cand] == cand_fid))
    loop_edges = st.loop_edges.at[kf_cur, kf_cand].set(
        st.loop_edges[kf_cur, kf_cand] | edge_ok)
    return (dataclasses.replace(st2, lm_dist_min=dmin, lm_dist_max=dmax,
                                loop_edges=loop_edges), cR, ct)


# ---------------------------------------------------------------------------
# Relocalization (reference: Tracking::Relocalization src/Tracking.cc:3666)
# ---------------------------------------------------------------------------

def _reloc_refine(st: mstate.MapState, cam, kf, feat_xy, feat_desc,
                  feat_valid, R0, t0, bind0, pnp_ok):
    """Iterative relocalization refinement (reference:
    src/Tracking.cc:3751-3835): pose-optimize the PnP solution, then a WIDE
    (10 px) projection search over the candidate keyframe's landmarks for
    additional matches + re-optimize, then a NARROW (3 px) pass + final
    optimize. The reference runs the extra passes only when the inlier
    count is short of 50; here both passes are always part of the one
    fused program (masked work is cheap) and the final count gates
    acceptance. The 50-inlier bar assumes the reference's ~1000-feature
    budget; it scales with this frame's budget. Returns (R, t, bind,
    n_good, ok)."""
    from dani_slam_tpu.ops import solvers

    N = feat_xy.shape[0]
    obs = st.obs_lm[kf]
    has = (obs >= 0) & st.kf_kp_mask[kf]
    lm_ids = jnp.where(has, obs, 0)
    pts_all = st.lm_pos[lm_ids]

    def opt(R, t, bind):
        has_b = bind >= 0
        pts = st.lm_pos[jnp.where(has_b, bind, 0)]
        out = solvers.pose_optimize(R, t, cam, pts, feat_xy,
                                    has_b & feat_valid)
        return out.R, out.t, jnp.where(out.inliers, bind, -1), out.n_inliers

    def widen(R, t, bind, radius):
        """Project candidate-KF landmarks, window-search UNBOUND keypoints
        (reference SearchByProjection third overload, LGmatcher.cpp)."""
        pc = jnp.einsum('ij,nj->ni', R, pts_all) + t
        xy = _cam.project(cam, pc)
        vis = has & (pc[:, 2] > 0.05)
        ci, _, cok = matching.search_by_projection_bind(
            xy, vis, st.lm_desc[lm_ids], feat_xy,
            feat_valid & (bind < 0), feat_desc, radius=radius)
        return jnp.where(bind >= 0, bind,
                         jnp.where(cok, lm_ids[ci], -1))

    R1, t1, bind1, _ = opt(R0, t0, bind0)
    bind1w = widen(R1, t1, bind1, 10.0)
    R2, t2, bind2, _ = opt(R1, t1, bind1w)
    bind2n = widen(R2, t2, bind2, 3.0)
    R3, t3, bind3, n3 = opt(R2, t2, bind2n)
    th_accept = max(int(0.05 * N), 20)    # reference: nGood >= 50 @ ~1000
    ok = pnp_ok & (n3 >= th_accept)
    return R3, t3, bind3, n3, ok


@jax.jit
def relocalize_against_kf(st: mstate.MapState, cam, kf: jax.Array,
                          feat_xy, feat_desc, feat_valid, key):
    """Match the lost frame against one candidate KF's landmarks, solve
    PnP RANSAC, then refine with the iterative wider-search passes
    (reference: src/Tracking.cc:3666-3835). Returns (R, t, bindings,
    n_inliers, ok)."""
    from dani_slam_tpu.core import scatterless as sless

    obs = st.obs_lm[kf]
    has = (obs >= 0) & st.kf_kp_mask[kf]
    lm_ids = jnp.where(has, obs, 0)
    lm_desc = st.lm_desc[lm_ids]
    d = matching.desc_distance_matrix(lm_desc, feat_desc)
    m = matching.masked_match(d, has[:, None] & feat_valid[None, :],
                              th=matching.TH_HIGH, ratio=0.9, mutual=True)
    m = matching.resolve_duplicate_targets(m, feat_xy.shape[0])
    # 2D-3D pairs indexed by candidate-KF keypoint rows
    pts_w = st.lm_pos[lm_ids]
    obs_xy = feat_xy[m.idx]
    res = pnp.pnp_ransac(key, cam, pts_w, obs_xy, m.ok & has,
                         min_inliers=15)
    # bindings for the frame
    okrow = m.ok & res.inliers
    bind = sless.id_max(m.idx, okrow, lm_ids, feat_xy.shape[0],
                        jnp.asarray(-1, jnp.int32))
    return _reloc_refine(st, cam, kf, feat_xy, feat_desc, feat_valid,
                         res.R, res.t, bind, res.ok)


def relocalize_against_kf_lightglue(st: mstate.MapState, cam, kf: jax.Array,
                                    feat_xy, feat_desc, feat_valid, key,
                                    matcher):
    """Relocalization matching via the learned LightGlue matcher instead of
    mutual-NN, then the same iterative wider-search refinement (reference:
    Relocalization uses the LightGlue-BoW matcher, src/Tracking.cc:3700;
    matcher = models/lightglue.MatcherState)."""
    from dani_slam_tpu.core import scatterless as sless
    from dani_slam_tpu.models import lightglue as lg
    from dani_slam_tpu.ops import pnp

    obs = st.obs_lm[kf]
    has = (obs >= 0) & st.kf_kp_mask[kf]
    lm_ids = jnp.where(has, obs, 0)
    idx, score, ok = lg.match(matcher, st.kf_kp[kf], st.lm_desc[lm_ids],
                              has, feat_xy, feat_desc, feat_valid)
    pts_w = st.lm_pos[lm_ids]
    obs_xy = feat_xy[idx]
    res = pnp.pnp_ransac(key, cam, pts_w, obs_xy, ok & has, min_inliers=15)
    okrow = ok & res.inliers
    bind = sless.id_max(idx, okrow, lm_ids, feat_xy.shape[0],
                        jnp.asarray(-1, jnp.int32))
    return _reloc_refine(st, cam, kf, feat_xy, feat_desc, feat_valid,
                         res.R, res.t, bind, res.ok)


def inertial_loop_gate(st: mstate.MapState, kf: int, cand: int, T12,
                       ba2: bool = False,
                       max_tilt: float = 0.008, max_yaw: float = 0.349):
    """Gravity-consistency gate for loops on inertial maps (reference:
    src/LoopClosing.cc:236-262). The loop's implied world correction
    S_ww = T_wc_cur * (T12 * T_cand) must not tilt a gravity-aligned map:
    |pitch|,|roll| < 0.008 rad and |yaw| < 0.349 — else BAD LOOP. Once
    VIBA2 refined the map (ba2), the correction is clamped to yaw-only with
    scale 1 and the caller should use the 4-DoF essential graph.

    Returns (T12', four_dof, good)."""
    R12, t12, s12 = T12
    one = jnp.ones(())
    Scw = lie.sim3_mul(R12, t12, s12, st.kf_R[cand], st.kf_t[cand], one)
    Twc = lie.sim3_inv(st.kf_R[kf], st.kf_t[kf], one)
    Rww, tww, sww = lie.sim3_mul(*Twc, *Scw)
    phi = np.asarray(lie.so3_log(Rww))
    if not (abs(phi[0]) < max_tilt and abs(phi[1]) < max_tilt and
            abs(phi[2]) < max_yaw):
        return T12, False, False
    if ba2:
        yaw_only = jnp.asarray([0.0, 0.0, float(phi[2])])
        Rww_c = lie.so3_exp(yaw_only)
        Scw_c = lie.sim3_mul(st.kf_R[kf], st.kf_t[kf], one, Rww_c, tww, one)
        T12 = lie.sim3_mul(*Scw_c, *lie.sim3_inv(st.kf_R[cand],
                                                 st.kf_t[cand], one))
        return T12, True, True
    return T12, False, True


@jax.jit
def _verify_stats_fresh(st: mstate.MapState, n, ok, cand, kfv):
    """Bundle a fresh verification's host-decision scalars into ONE
    transfer: [n_inliers, ok, frame_id(cand), frame_id(kfv)]. The frame ids
    seed the hypothesis's slot-reuse guards."""
    return jnp.stack([n.astype(jnp.int32), ok.astype(jnp.int32),
                      st.kf_frame_id[cand].astype(jnp.int32),
                      st.kf_frame_id[kfv].astype(jnp.int32)])


@jax.jit
def _verify_stats_refine(st: mstate.MapState, n, ok, cand, kfv, kf_prev,
                         cand_fid, prev_fid):
    """Refine-pass stats with the slot-reuse guard folded in ON DEVICE:
    ok only if the hypothesis's candidate/chain keyframes still hold the
    frame ids recorded when the hypothesis was stored (culling frees slots
    that insert_keyframe reuses)."""
    g = ((st.kf_frame_id[cand] == cand_fid) &
         (st.kf_frame_id[kf_prev] == prev_fid))
    return jnp.stack([n.astype(jnp.int32), (ok & g).astype(jnp.int32),
                      st.kf_frame_id[cand].astype(jnp.int32),
                      st.kf_frame_id[kfv].astype(jnp.int32)])


class LoopCloser:
    """Host orchestration of place recognition + loop closing.

    Keeps the dense BoW database in device memory; invoked by the System
    after each keyframe step (reference: the LoopClosing thread drains its
    keyframe queue, src/LoopClosing.cc:91-320).
    """

    def __init__(self, cam, caps: mstate.MapCaps, codebook=None, seed=0,
                 min_kf_gap: int = 10, min_inliers: int = 25,
                 run_gba: bool = True, fix_scale: bool = False):
        self.cam = cam
        key = jax.random.PRNGKey(seed)
        live = isinstance(codebook, str) and codebook == "live"
        if live:
            # force the live-vocabulary path even when a shipped vocabulary
            # exists — for synthetic-descriptor workloads (random unit
            # vectors) where the SuperPoint-domain vocabulary quantizes
            # degenerately (e.g. the on-device loop bench)
            self.codebook = vocab.random_codebook(key, 512, caps.D)
            codebook = None
        elif codebook is None:
            # shipped pre-trained vocabulary (reference loads
            # superpoint_voc.yml before tracking, src/System.cc:117-127)
            codebook = vocab.load_default_codebook(caps.D)
            if codebook is not None:
                self.codebook = codebook
            else:
                self.codebook = vocab.random_codebook(key, 512, caps.D)
        else:
            self.codebook = codebook
        self.bow = jnp.zeros((caps.K, self.codebook.shape[0]))
        # live-vocabulary fallback: with no shipped/supplied codebook
        # (e.g. synthetic-feature tests at D=64), train spherical k-means on
        # the map's own descriptors once enough keyframes exist, then
        # rebuild the database rows
        self._codebook_trained = codebook is not None and not live
        self.train_codebook_after = 8
        self.key = key
        self.min_kf_gap = min_kf_gap
        self.min_inliers = min_inliers
        self.run_gba = run_gba
        self.fix_scale = fix_scale
        self.last_loop_kf = -10 ** 9
        self.n_loops = 0
        # when False this object only maintains the BoW database (for
        # relocalization); loop detection/correction is skipped
        self.detect_loops = True
        # temporal consistency (reference: a loop hypothesis must persist
        # over consecutive keyframes before correction —
        # mnLoopNumCoincidences >= 3, src/LoopClosing.cc:376-430)
        self.consistency_needed = 3
        # active loop hypothesis: (cand_slot, T12 new<-cand, hyp_kf_slot,
        # n_coincidences) — re-verified geometrically at each keyframe
        self._hyp = None
        self._pending_cand = None   # deferred loop-candidate pull
        # in-flight geometric verification: dispatched at one keyframe,
        # its (n, ok, fid...) stats pulled at the NEXT (the transfer gets a
        # whole keyframe of head start, so resolution never stalls the
        # frame loop — the async analogue of the reference's LoopClosing
        # thread lagging the keyframe queue, src/LoopClosing.cc:91-118)
        self._pending_verify = None
        # time-sliced global BA (reference: concurrent GBA thread +
        # mbStopGBA abort, src/LoopClosing.cc:1199-1207): chunks of
        # gba_chunk_iters LM iterations run at subsequent keyframes instead
        # of one inline multi-hundred-ms program; apply_gba welds the result
        # back. gba_async=False restores the inline behavior.
        self.gba_async = True
        self.gba_chunk_iters = 2
        self.gba_iters = 10
        self._gba = None            # (snapshot MapState, carry, iters_done)
        self.chain_corr = None      # set by apply_gba for the System
        # time-sliced loop CORRECTION (reference: all of CorrectLoop runs in
        # the LoopClosing thread while Tracking continues,
        # src/LoopClosing.cc:970-1207): the essential-graph solve runs in
        # pg_chunk_iters-iteration chunks over a snapshot at subsequent
        # keyframes; apply_loop_weld folds the result into the live map
        # (same spanning-tree propagation as the GBA weld), then
        # SearchAndFuse + the sliced GBA follow. corr_async=False restores
        # the inline single-program correction.
        self.corr_async = True
        self.pg_chunk_iters = 3
        self.pg_iters = 10
        self._pgc = None            # dict: snapshot, kf/cand slots+fids,
        #                             T12, four_dof, carry, iters done

    def _gba_step(self, st: mstate.MapState, chain_ref):
        """Advance the time-sliced GBA by one chunk; weld back when done.
        Sets self.chain_corr for the System's pose-chain re-anchoring."""
        snap, carry, done = self._gba
        if done < self.gba_iters:
            carry = gba_chunk(snap, self.cam, carry,
                              iters=self.gba_chunk_iters)
            self._gba = (snap, carry, done + self.gba_chunk_iters)
            return st
        R, t, lm, _ = carry
        verbose.print_mess("LoopClosing: global BA finished, welding back",
                           verbose.VERBOSE)
        st, cR, ct = apply_gba(st, snap.kf_mask, snap.kf_frame_id,
                               snap.lm_mask, snap.lm_first_kf,
                               R, t, lm, chain_ref)
        self.chain_corr = (cR, ct)
        self._gba = None
        return st

    def _pgc_step(self, st: mstate.MapState, chain_ref):
        """Advance the time-sliced loop correction by one chunk; weld back
        + SearchAndFuse + start the sliced GBA when the pose graph is done."""
        c = self._pgc
        kf_d = jnp.asarray(c["kf"])
        cand_d = jnp.asarray(c["cand"])
        if c["done"] < self.pg_iters:
            c["carry"] = loop_pg_chunk(
                c["snap"], kf_d, cand_d, c["T12"], c["carry"],
                iters=self.pg_chunk_iters, fix_scale=self.fix_scale,
                four_dof=c["four_dof"])
            c["done"] += self.pg_chunk_iters
            return st
        snap = c["snap"]
        R_out, t_out, lm_pos, dmin, dmax = loop_correction_apply(
            snap, c["carry"])
        verbose.print_mess("LoopClosing: sliced correction finished, "
                           "welding back", verbose.VERBOSE)
        st, cR, ct = apply_loop_weld(
            st, snap.kf_mask, snap.kf_frame_id, snap.lm_mask,
            snap.lm_first_kf, R_out, t_out, lm_pos, dmin, dmax,
            kf_d, cand_d, jnp.asarray(c["cur_fid"]),
            jnp.asarray(c["cand_fid"]), chain_ref)
        self.chain_corr = (cR, ct)
        self._pgc = None
        # SearchAndFuse on the welded map — only if both loop ends still
        # hold the same keyframes (slots are reused after culling)
        live_kf, live_cf = jax.device_get((st.kf_frame_id[c["kf"]],
                                           st.kf_frame_id[c["cand"]]))
        if int(live_kf) == c["cur_fid"] and int(live_cf) == c["cand_fid"]:
            st = search_and_fuse(st, self.cam, kf_d, cand_d)
        if self.run_gba:
            if self.gba_async:
                carry = (st.kf_R, st.kf_t, st.lm_pos, jnp.asarray(1e-4))
                self._gba = (st, carry, 0)
            else:
                st = global_bundle_adjustment(st, self.cam)
        return st

    def finish_gba(self, st: mstate.MapState, chain_ref):
        """Drain a pending time-sliced correction + GBA (shutdown/merge)."""
        while self._pgc is not None:
            st = self._pgc_step(st, chain_ref)
        while self._gba is not None:
            st = self._gba_step(st, chain_ref)
        return st

    def abort_gba(self):
        """Drop a pending GBA and sliced correction (map reset/merge/new
        loop — the reference's mbStopGBA / mnFullBAIdx invalidation)."""
        self._gba = None
        self._pgc = None

    def on_keyframe(self, st: mstate.MapState, kf: int,
                    kf_count: int | None = None, kf_dev=None,
                    chain_ref=None):
        """Add KF to the database; attempt loop detection + correction.
        Returns (possibly corrected) state. kf_count lets the caller pass
        its host-side keyframe counter (avoids a device pull per KF);
        kf_dev the device-side slot scalar (avoids per-slot recompiles of
        the BoW update and a scalar upload); chain_ref the tracker's current
        reference-KF slot for the GBA chain correction."""
        if kf_dev is None:
            kf_dev = jnp.asarray(kf, jnp.int32)
        self.chain_corr = None
        if self._pgc is not None:
            st = self._pgc_step(st,
                                chain_ref if chain_ref is not None
                                else kf_dev)
        elif self._gba is not None:
            st = self._gba_step(st,
                                chain_ref if chain_ref is not None
                                else kf_dev)
        if (not self._codebook_trained and kf_count is not None and
                kf_count >= self.train_codebook_after):
            desc = st.kf_desc.reshape(-1, st.kf_desc.shape[-1])
            dmask = (st.kf_kp_mask & st.kf_mask[:, None]).reshape(-1)
            self.codebook = vocab.train_codebook(desc, dmask, self.codebook)
            self._codebook_trained = True
            self.bow = vocab.rebuild_bow_rows(st.kf_desc, st.kf_kp_mask,
                                              st.kf_mask, self.codebook)
        self.bow, row = vocab.update_bow_row(
            self.bow, st.kf_desc, st.kf_kp_mask, kf_dev, self.codebook)

        if not self.detect_loops:
            return st
        if kf_count is None:
            kf_count = int(st.next_kf_counter)

        # The detection pipeline never blocks the frame loop: each stage's
        # device program is DISPATCHED at one keyframe and its scalar stats
        # RESOLVED at the next, by which point the async transfer has
        # drained (the reference's LoopClosing runs in its own thread and
        # similarly lags the keyframe queue, src/LoopClosing.cc:91-320).
        #   stage A  dispatch detect_candidates          (every keyframe)
        #   stage B  resolve candidates -> dispatch full Sim3 verification
        #   stage C  resolve verification -> open/advance the hypothesis;
        #            an active hypothesis dispatches its next geometric
        #            refine in the same call, so each keyframe still
        #            advances one temporal coincidence
        #   correct  once consistency_needed coincidences land (rare; the
        #            only path that synchronizes with the device)
        st, corrected = self._resolve_verify(st, kf, kf_count)
        if corrected:
            return st

        if (self._pgc is not None or kf_count < 12 or
                kf_count - self.last_loop_kf < self.min_kf_gap):
            # no fresh detection while a sliced correction is in flight
            # (the reference's LoopClosing thread is likewise busy inside
            # CorrectLoop) or during the post-loop cooldown
            self._pending_cand = None
            return st

        # active hypothesis: dispatch the geometric re-verification at this
        # keyframe — propagate the stored Sim3 through odometry and project
        # the candidate window (reference: DetectAndReffineSim3FromLastKF,
        # src/LoopClosing.cc:376-430 — each temporal 'coincidence' is a
        # geometric hit); stats (incl. the on-device slot-reuse guard)
        # resolve next keyframe
        if self._hyp is not None and self._pending_verify is None:
            (cand, T12_prev, kf_prev, n_coin, cand_fid,
             prev_fid) = self._hyp
            self._hyp = None     # consumed; reopened at resolve time
            cand_d, kf_d, kfp_d = (jnp.asarray(cand), jnp.asarray(kf),
                                   jnp.asarray(kf_prev))
            T12p = propagate_hypothesis(st, kf_d, kfp_d, T12_prev)
            T12r, n, okr = refine_loop_from_hypothesis(
                st, self.cam, kf_d, cand_d, T12p,
                fix_scale=self.fix_scale, min_inliers=self.min_inliers)
            stats = _verify_stats_refine(
                st, n, okr, cand_d, kf_d, kfp_d,
                jnp.asarray(cand_fid), jnp.asarray(prev_fid))
            try:
                stats.copy_to_host_async()
            except AttributeError:
                pass
            self._pending_verify = (cand, T12r, kf, stats, n_coin)

        # resolve last keyframe's candidate pull (transfer started at
        # dispatch) and, if it names a plausible fresh candidate, dispatch
        # the full Sim3 RANSAC verification (coincidence #1 opens a
        # hypothesis at resolve time)
        prev = self._pending_cand
        cand_out = vocab.detect_candidates(
            self.bow, st.kf_mask, row, st.covis, kf_dev, n_best=3)
        for a in cand_out:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        self._pending_cand = (cand_out, kf)
        if prev is None or self._pending_verify is not None:
            return st
        (idx, vals), kfq = prev
        idx, vals = np.asarray(idx), np.asarray(vals)
        best = int(idx[0])
        if float(vals[0]) <= 0.0 or best == kfq:
            return st
        self.key, sub = jax.random.split(self.key)
        best_d, kfq_d = jnp.asarray(best), jnp.asarray(kfq)
        T12, n, ok = verify_loop_candidate(
            st, self.cam, kfq_d, best_d, sub,
            min_inliers=self.min_inliers, fix_scale=self.fix_scale)
        stats = _verify_stats_fresh(st, n, ok, best_d, kfq_d)
        try:
            stats.copy_to_host_async()
        except AttributeError:
            pass
        self._pending_verify = (best, T12, kfq, stats, 0)
        return st

    def _resolve_verify(self, st: mstate.MapState, kf: int, kf_count: int):
        """Resolve the previous keyframe's in-flight verification. Returns
        (st, corrected). Opens/advances the loop hypothesis; once
        consistency_needed geometric coincidences land in a row, corrects
        the loop at the CURRENT keyframe (the stored Sim3 is propagated
        here through odometry, the reference's gScw propagation)."""
        if self._pending_verify is None:
            return st, False
        cand, T12, kf_v, stats, n_coin = self._pending_verify
        self._pending_verify = None
        n, ok, cand_fid, vkf_fid = (int(x) for x in np.asarray(stats))
        if not ok:
            return st, False
        n_coin += 1
        if n_coin < self.consistency_needed:
            self._hyp = (cand, T12, kf_v, n_coin, cand_fid, vkf_fid)
            return st, False

        # resolution-time slot-reuse guard: cand/kf_v were validated when
        # the refine was dispatched, one keyframe ago — culling since then
        # would make the propagation read a reused slot's pose
        cf, pf, kf_fid = jax.device_get((st.kf_frame_id[cand],
                                         st.kf_frame_id[kf_v],
                                         st.kf_frame_id[kf]))
        if int(cf) != cand_fid or int(pf) != vkf_fid:
            return st, False
        best_d, kf_d = jnp.asarray(cand), jnp.asarray(kf)
        T12c = propagate_hypothesis(st, kf_d, jnp.asarray(kf_v), T12)

        four_dof = False
        if bool(st.imu_initialized):
            T12c, four_dof, good = inertial_loop_gate(
                st, kf, cand, T12c, ba2=bool(st.imu_ba2))
            if not good:
                return st, False   # BAD LOOP

        verbose.print_mess(
            f"LoopClosing: loop detected KF slot {kf} <-> {cand} "
            f"({n} inliers), correcting")
        # a NEW verified loop supersedes any in-flight GBA/correction
        # (reference: mnFullBAIdx bump aborts the running thread)
        self.abort_gba()
        self.last_loop_kf = kf_count
        self.n_loops += 1
        if self.corr_async:
            # time-sliced correction: snapshot now, essential-graph chunks
            # at subsequent keyframes, weld + SearchAndFuse + GBA at the end
            # (the frame loop never waits on the full correction)
            carry = (st.kf_R, st.kf_t, jnp.ones((st.caps.K,)))
            self._pgc = {"snap": st, "kf": kf, "cand": cand, "T12": T12c,
                         "four_dof": four_dof, "carry": carry, "done": 0,
                         "cur_fid": int(kf_fid), "cand_fid": int(cf)}
            return st, True
        st = correct_loop(st, self.cam, kf_d, best_d,
                          T12c, fix_scale=self.fix_scale, four_dof=four_dof)
        st = search_and_fuse(st, self.cam, kf_d, best_d)
        if self.run_gba:
            if self.gba_async:
                carry = (st.kf_R, st.kf_t, st.lm_pos, jnp.asarray(1e-4))
                self._gba = (st, carry, 0)
            else:
                st = global_bundle_adjustment(st, self.cam)
        return st, True
