"""Tracking: per-frame state machine and jitted device steps.

Mirrors the reference's Tracking thread (src/Tracking.cc:1813 Track() state
machine: NOT_INITIALIZED -> OK -> RECENTLY_LOST -> LOST) with the TPU
two-rate design (SURVEY.md §7): the host drives a small Python state machine;
every compute step (initialization, motion-model tracking, local-map
tracking, keyframe policy inputs) is a fixed-shape jitted program. The only
host<->device traffic per frame is the feature upload and a handful of
scalars (inlier counts) for the state machine.

Covered reference behaviors:
  * MonocularInitialization (src/Tracking.cc:2468-2545) + CreateInitialMap
    (2546-2680): two-view RANSAC init, median-depth scale normalization.
  * TrackWithMotionModel (2874-2968): constant-velocity prediction, window
    search th=15 (widened x2 on failure), pose optimize, >=10 inliers.
  * TrackReferenceKeyFrame (2740-2800): descriptor matching vs ref KF
    (LightGlue/BoW in reference; mutual-NN here), >=15 matches, pose opt.
  * TrackLocalMap (2969-3099): local covisible set, project & match local
    landmarks, pose opt, accept threshold 30 (15 inertial).
  * NeedNewKeyFrame (3100-3267) / CreateNewKeyFrame (3268-3399): tracked
    ratio vs reference KF, min/max frame gaps, RGB-D close-point rule.
  * Relocalization (3666-3835): place-recognition candidates + per-candidate
    pose solve (handled in loopclosing/place recognition module).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie, scatterless as sless, state as mstate
from dani_slam_tpu.ops import matching, solvers, twoview
from dani_slam_tpu.slam.frame import FrameFeatures


class TrackStepOut(NamedTuple):
    R: jax.Array
    t: jax.Array
    bindings: jax.Array      # [N] landmark id per keypoint (-1 none)
    n_inliers: jax.Array
    st: mstate.MapState      # counters may be updated


# ---------------------------------------------------------------------------
# Monocular initialization
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def match_for_init(f0: FrameFeatures, f1: FrameFeatures):
    return matching.search_for_initialization(
        f0.xy, f0.valid, f0.desc, f1.xy, f1.valid, f1.desc)


@jax.jit
def two_view_from_matches(key, cam, f0: FrameFeatures, f1: FrameFeatures,
                          m: matching.Matches):
    r0 = _cam.unproject(cam, f0.xy)
    r1 = _cam.unproject(cam, f1.xy[m.idx])
    focal = cam.params[0]
    return twoview.two_view_init(key, r0, r1, m.ok, focal)


@jax.jit
def build_initial_map(st: mstate.MapState, cam, f0: FrameFeatures,
                      f1: FrameFeatures, m: matching.Matches,
                      tv: twoview.TwoViewResult, frame_id0: jax.Array,
                      frame_id: jax.Array):
    """Create the initial two-keyframe map (reference:
    CreateInitialMapMonocular src/Tracking.cc:2546-2680 — insert 2 KFs +
    points, 20-iteration GBA, scale so median depth = 1)."""
    good = m.ok & tv.inliers
    # median-depth normalization over inlier points
    z = tv.pts3d[:, 2]
    z_masked = jnp.where(good, z, jnp.nan)
    med = jnp.nanmedian(z_masked)
    scale = 1.0 / jnp.maximum(med, 1e-6)
    pts = tv.pts3d * scale
    t21 = tv.t21 * scale

    N = f0.xy.shape[0]
    # landmark rows indexed by f0 keypoint
    C0 = jnp.zeros(3)
    dist = jnp.linalg.norm(pts - C0, axis=-1).clip(1e-9)
    normal = pts / dist[:, None]

    st, slots = mstate.insert_landmarks(
        st, pts, f0.desc, normal, dist * 0.8, dist * 1.3,
        jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32), good)

    bind0 = jnp.where(good & (slots >= 0), slots, -1)
    # bindings for f1 keypoints, formed target-side (no scatter)
    bind1 = sless.id_lookup(m.idx, good & (slots >= 0), slots, N,
                            jnp.full((N,), -1, jnp.int32))

    st, k0 = mstate.insert_keyframe(
        st, jnp.eye(3), jnp.zeros(3), f0.time, frame_id0, f0.xy, f0.valid,
        f0.desc, f0.depth, f0.octave_or_zeros(), bind0)
    st, k1 = mstate.insert_keyframe(
        st, tv.R21, t21, f1.time, frame_id, f1.xy, f1.valid, f1.desc,
        f1.depth, f1.octave_or_zeros(), bind1)
    return st, k0, k1, bind1, tv.R21, t21


# ---------------------------------------------------------------------------
# RGB-D / stereo initialization (reference: StereoInitialization
# src/Tracking.cc:2355-2467 — needs N>500 kps, creates points from depth)
# ---------------------------------------------------------------------------

@jax.jit
def build_initial_map_rgbd(st: mstate.MapState, cam, f0: FrameFeatures,
                           frame_id: jax.Array):
    N = f0.xy.shape[0]
    good = f0.valid & jnp.isfinite(f0.depth) & (f0.depth > 0)
    rays = _cam.unproject(cam, f0.xy)
    pts = rays * f0.depth[:, None]
    dist = jnp.linalg.norm(pts, axis=-1).clip(1e-9)
    st, slots = mstate.insert_landmarks(
        st, pts, f0.desc, pts / dist[:, None], dist * 0.8, dist * 1.3,
        jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32), good)
    bind0 = jnp.where(good & (slots >= 0), slots, -1)
    st, k0 = mstate.insert_keyframe(
        st, jnp.eye(3), jnp.zeros(3), f0.time, frame_id, f0.xy, f0.valid,
        f0.desc, f0.depth, f0.octave_or_zeros(), bind0)
    # bundle the host-decision scalars into ONE transfer: the init frame
    # otherwise pays a tunnel round trip per scalar (n_depth gate, slot id,
    # bound count) — ~3 RTTs that dominated f0 under transport contention
    stats = jnp.stack([jnp.sum(good.astype(jnp.int32)),
                       k0.astype(jnp.int32),
                       jnp.sum((bind0 >= 0).astype(jnp.int32))])
    return st, k0, bind0, stats


# ---------------------------------------------------------------------------
# Per-frame tracking steps
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("use_depth", "rounds"))
def track_motion_model(st: mstate.MapState, cam, feat: FrameFeatures,
                       last_bind: jax.Array, R_pred, t_pred,
                       radius: jax.Array | float = 15.0,
                       use_depth: bool = False,
                       rounds: int = 2) -> TrackStepOut:
    """Project last frame's landmarks with the constant-velocity prediction
    and match in a window (reference: TrackWithMotionModel
    src/Tracking.cc:2874 + SearchByProjection LGmatcher.cpp:1627)."""
    has = (last_bind >= 0) & jnp.take(st.lm_mask, jnp.maximum(last_bind, 0))
    lm_ids = jnp.where(has, last_bind, 0)
    lm_pos = st.lm_pos[lm_ids]
    lm_desc = st.lm_desc[lm_ids]

    xy, vis, _, dist = matching.project_landmarks(R_pred, t_pred, cam,
                                                  lm_pos, has)
    # octave-scaled window (reference: r *= scaleFactor^predicted-level in
    # the frame-to-frame search, src/LGmatcher.cpp:1643-1685)
    octv = matching.predict_scale_level(dist, st.lm_dist_max[lm_ids])
    m = matching.search_by_projection(xy, vis, lm_desc, feat.xy, feat.valid,
                                      feat.desc,
                                      radius=radius * SCALE_FACTOR ** octv)
    # bindings on the current frame's keypoints (scatter-free: TPU scatters
    # serialize, see core/scatterless.py)
    bind = sless.id_max(m.idx, m.ok, lm_ids, feat.xy.shape[0],
                        jnp.asarray(-1, jnp.int32))

    # rounds=2 default: this pose only SEEDS the local-map search; the
    # final accuracy comes from track_local_map's full 4-round solve
    # (the fused frame program runs both — halving the first solve's rounds
    # trims the latency-bound LM chain). rounds=4 restores the
    # reference-faithful budget (A/B: tools/ab_frame_knobs.py).
    res = _optimize_with_bindings(st, cam, feat, bind, R_pred, t_pred,
                                  use_depth, rounds=rounds)
    return res


@partial(jax.jit, static_argnames=("use_depth",))
def track_last_frame_vo(cam, last_xy, last_desc, last_depth, last_valid,
                        R_last, t_last, feat: FrameFeatures, R_pred, t_pred,
                        radius: float = 15.0, use_depth: bool = True):
    """Pure visual odometry against TEMPORAL points from the last frame's
    depth — localization mode's lifeline outside the mapped region
    (reference: UpdateLastFrame creates temporary close-depth map points and
    TrackWithMotionModel tracks them, src/Tracking.cc:2801-2873; mbVO mode
    :2090-2134). Returns (R, t, n_inliers)."""
    good = last_valid & jnp.isfinite(last_depth) & (last_depth > 0)
    rays = _cam.unproject(cam, last_xy)
    Xc = rays * last_depth[:, None]
    Xw = lie.se3_apply(*lie.se3_inv(R_last, t_last), Xc)
    xy, vis, _, _ = matching.project_landmarks(R_pred, t_pred, cam, Xw, good)
    m = matching.search_by_projection(xy, vis, last_desc, feat.xy,
                                      feat.valid, feat.desc, radius=radius)
    obs_xy = feat.xy[m.idx]
    obs_d = feat.depth[m.idx]
    res = solvers.pose_optimize(R_pred, t_pred, cam, Xw, obs_xy, m.ok,
                                obs_depth=obs_d if use_depth else None,
                                use_depth=use_depth)
    return res.R, res.t, res.n_inliers


@partial(jax.jit, static_argnames=("use_depth", "matcher_model"))
def track_reference_keyframe(st: mstate.MapState, cam, feat: FrameFeatures,
                             ref_kf: jax.Array, R0, t0,
                             use_depth: bool = False, matcher_model=None,
                             matcher_params=None) -> TrackStepOut:
    """Match the frame against the reference keyframe's landmarks
    (reference: TrackReferenceKeyFrame src/Tracking.cc:2740 — the reference
    runs LightGlue over BoW-bucketed features, LGmatcher::SearchByBoW
    src/LGmatcher.cpp:225-370 forward at :314). With a trained matcher
    supplied this runs LightGlue between the keyframe's keypoints and the
    frame (the primary path); descriptor mutual-NN otherwise."""
    obs = st.obs_lm[ref_kf]
    has = (obs >= 0) & st.kf_kp_mask[ref_kf]
    lm_ids = jnp.where(has, obs, 0)
    if matcher_model is not None:
        from dani_slam_tpu.models import lightglue as lg
        idx, score, ok = lg.match_pair(
            matcher_model, matcher_params, st.kf_kp[ref_kf],
            st.kf_desc[ref_kf], has, feat.xy, feat.desc, feat.valid,
            cam.width, cam.height)
        m = matching.Matches(idx, 1.0 - score, ok)
    else:
        lm_desc = st.lm_desc[lm_ids]
        dmat = matching.desc_distance_matrix(lm_desc, feat.desc)
        m = matching.masked_match(dmat, has[:, None] & feat.valid[None, :],
                                  th=matching.TH_HIGH, ratio=0.9,
                                  mutual=True)
        m = matching.resolve_duplicate_targets(m, feat.xy.shape[0])
    bind = sless.id_max(m.idx, m.ok, lm_ids, feat.xy.shape[0],
                        jnp.asarray(-1, jnp.int32))
    return _optimize_with_bindings(st, cam, feat, bind, R0, t0, use_depth)


SCALE_FACTOR = 1.2   # pyramid scale (config ORBextractor.scaleFactor)


@jax.jit
def _ref_pose(st: mstate.MapState, k: jax.Array):
    """Reference keyframe pose gather (dynamic index: ONE cached program)."""
    return st.kf_R[k], st.kf_t[k]


@jax.jit
def apply_chain_correction(R, t, corr_R, corr_t):
    """Right-compose the map correction onto a stored pose (used to keep
    PIPELINED-mode rollback snapshots consistent with the re-anchored
    chain — a rollback restoring pre-correction poses would silently undo
    the re-anchoring and re-introduce pose-to-map misregistration)."""
    return lie.se3_mul(R, t, corr_R, corr_t)


def _optimize_with_bindings(st, cam, feat, bind, R0, t0, use_depth,
                            rounds: int = 4):
    has = (bind >= 0) & jnp.take(st.lm_mask, jnp.maximum(bind, 0))
    lm_pos = st.lm_pos[jnp.where(has, bind, 0)]
    # per-observation information by pyramid level (reference: invSigma2 =
    # 1/scaleFactor^(2*octave) on every g2o edge)
    octv = feat.octave_or_zeros().astype(jnp.float32)
    inv_sigma2 = SCALE_FACTOR ** (-2.0 * octv)
    res = solvers.pose_optimize(
        R0, t0, cam, lm_pos, feat.xy, has, inv_sigma2=inv_sigma2,
        obs_depth=feat.depth if use_depth else None,
        use_depth=use_depth, rounds=rounds)
    bind = jnp.where(res.inliers | ~has, bind, -1)   # drop outlier matches
    return TrackStepOut(res.R, res.t, bind, res.n_inliers, st)


@partial(jax.jit, static_argnames=("use_depth",))
def track_local_map(st: mstate.MapState, cam, feat: FrameFeatures,
                    bind: jax.Array, R0, t0, radius: jax.Array | float = 4.0,
                    use_depth: bool = False) -> TrackStepOut:
    """Expand matches to the local covisible map and re-optimize
    (reference: TrackLocalMap src/Tracking.cc:2969 + SearchLocalPoints:3400;
    UpdateLocalKeyFrames:3514 builds K1 observers + neighbors)."""
    K = st.caps.K
    # K1: keyframes observing currently-bound landmarks — answered from the
    # landmark observer BITMASKS: gather [N, K/32] words for the bound
    # landmarks and OR-reduce, then unpack to bool [K]. The obs-table
    # formulation (take(seen, obs_safe) over [K,N] then row-any) is a 262k
    # random gather from a 32k table — ~3 ms/frame of the fused frame
    # program at production caps; this is ~8k gathered words.
    has = (bind >= 0) & jnp.take(st.lm_mask, jnp.maximum(bind, 0))
    seen = sless.id_mask(bind, has, st.caps.L)
    obits = jnp.where(has[:, None],
                      st.lm_obs_bits[jnp.maximum(bind, 0)], 0)   # [N,nw]
    words = jax.lax.reduce(obits, jnp.asarray(0, obits.dtype),
                           jax.lax.bitwise_or, (0,))             # [nw]
    arangeK = jnp.arange(K)
    kf_bit = (words[arangeK // 32] >> (arangeK % 32)) & 1
    kf_sel = st.kf_mask & (kf_bit > 0)
    # + covisible neighbors of the selected set
    neigh = jnp.any((st.covis > 10) & kf_sel[None, :], axis=1)
    kf_sel = kf_sel | (st.kf_mask & neigh)

    lm_sel = mstate.local_map_landmark_mask(st, kf_sel)
    # exclude already-bound landmarks
    lm_sel &= ~seen

    # Compact the query set before the window search: the local map is a
    # few thousand live landmarks, but querying the full [L]=32k slot table
    # pays ~1.5 ms of per-grid-step latency in the match kernel even with
    # its dead-tile skip. nonzero-with-static-size compaction is ~free
    # (cumsum-based); LQ=4096 holds the live local map with headroom (cap
    # overflow drops only this frame's least-slot candidates — the next
    # frame re-selects).
    LQ = 4096
    loc_ids = jnp.nonzero(lm_sel, size=LQ, fill_value=0)[0]
    loc_ok = jnp.arange(LQ) < jnp.sum(lm_sel.astype(jnp.int32))

    xy, vis, _, dist = matching.project_landmarks(
        R0, t0, cam, st.lm_pos[loc_ids], loc_ok, st.lm_normal[loc_ids],
        st.lm_dist_min[loc_ids], st.lm_dist_max[loc_ids])
    octv = matching.predict_scale_level(dist, st.lm_dist_max[loc_ids])
    # target-side search: bindings form directly per keypoint, no scatter
    ci, _, cok = matching.search_by_projection_bind(
        xy, vis, st.lm_desc[loc_ids], feat.xy, feat.valid & (bind < 0),
        feat.desc, radius=radius * SCALE_FACTOR ** octv)
    bind2 = jnp.where(bind >= 0, bind, jnp.where(cok, loc_ids[ci], -1))

    out = _optimize_with_bindings(st, cam, feat, bind2, R0, t0, use_depth)

    # visibility bookkeeping (reference: IncreaseVisible/IncreaseFound,
    # used by MapPointCulling's found-ratio)
    vis_full = jnp.zeros((st.caps.L,), bool).at[
        jnp.where(vis, loc_ids, st.caps.L - 1)].max(vis)
    dvis = (vis_full | seen).astype(jnp.int32)
    fin = (out.bindings >= 0)
    dfound = sless.id_count(out.bindings, fin, st.caps.L)
    st2 = dataclasses.replace(st, lm_visible=st.lm_visible + dvis,
                              lm_found=st.lm_found + dfound)
    return TrackStepOut(out.R, out.t, out.bindings, out.n_inliers, st2)


# ---------------------------------------------------------------------------
# Fused per-frame step — ONE device program per tracked frame.
#
# The reference pays per-stage host control flow inside one process; under a
# remote TPU transport every dispatch/sync is a network round-trip, so the
# whole frame pipeline (predict -> motion-model match+opt -> widened retry ->
# ref-KF fallback -> local-map track) is fused into a single jitted program
# with lax.cond selecting the fallback paths on device. The host pulls ONE
# small scalar bundle per frame for the state machine.
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("min_inliers", "use_depth", "has_vel",
                          "matcher_model", "seed_rounds"))
def track_frame_step(st: mstate.MapState, cam, feat: FrameFeatures,
                     last_bind: jax.Array, R_cur, t_cur, Rv, tv,
                     ref_kf: jax.Array, min_inliers: int = 10,
                     use_depth: bool = False, has_vel: bool = True,
                     matcher_model=None, matcher_params=None,
                     seed_rounds: int = 2):
    if has_vel:
        R_pred, t_pred = lie.se3_mul(Rv, tv, R_cur, t_cur)
    else:
        R_pred, t_pred = R_cur, t_cur

    out = track_motion_model(st, cam, feat, last_bind, R_pred, t_pred,
                             radius=15.0, use_depth=use_depth,
                             rounds=seed_rounds)

    def widened(_):
        o = track_motion_model(st, cam, feat, last_bind, R_pred, t_pred,
                               radius=30.0, use_depth=use_depth,
                               rounds=seed_rounds)
        return o.R, o.t, o.bindings, o.n_inliers

    def keep(o):
        return o.R, o.t, o.bindings, o.n_inliers

    R1, t1, b1, n1 = jax.lax.cond(out.n_inliers < min_inliers, widened,
                                  lambda _: keep(out), None)

    def refkf(_):
        o = track_reference_keyframe(st, cam, feat, ref_kf, R_cur, t_cur,
                                     use_depth=use_depth,
                                     matcher_model=matcher_model,
                                     matcher_params=matcher_params)
        return o.R, o.t, o.bindings, o.n_inliers

    R2, t2, b2, n2 = jax.lax.cond(n1 < min_inliers, refkf,
                                  lambda _: (R1, t1, b1, n1), None)

    out3 = track_local_map(st, cam, feat, b2, R2, t2, use_depth=use_depth)
    R3 = lie.orthonormalize(out3.R)
    # velocity for next frame: T_cur_new * T_cur_prev^-1... host composes with
    # PREVIOUS accepted pose, so return the pose and let host form velocity.
    # close-point statistics for the keyframe policy (reference:
    # bNeedToInsertClose — tracked close points < 100 while > 70 close
    # keypoints remain unbound means the view is sliding onto unmapped
    # territory, src/Tracking.cc:3159-3196)
    close = feat.valid & jnp.isfinite(feat.depth) & (feat.depth > 0)
    n_close_tracked = jnp.sum((out3.bindings >= 0) & close)
    n_close_free = jnp.sum((out3.bindings < 0) & close)
    counts = jnp.stack([n2, out3.n_inliers, n_close_tracked,
                        n_close_free]).astype(jnp.int32)
    return R3, out3.t, out3.bindings, counts, out3.st


@partial(jax.jit,
         static_argnames=("n_max", "use_boxes", "min_inliers", "has_vel",
                          "matcher_model", "det_model", "det_hw",
                          "det_score_th", "det_anchors", "seed_rounds"))
def rgbd_frame_fused(sp_params, img, depth_img, cam, time, depth_factor,
                     threshold, boxes, box_mask,
                     st: mstate.MapState, last_bind, R_cur, t_cur, Rv, tv,
                     ref_kf, n_max: int = 1024, use_boxes: bool = False,
                     min_inliers: int = 10, has_vel: bool = True,
                     matcher_model=None, matcher_params=None,
                     det_model=None, det_params=None, dyn_ids=None,
                     det_hw=None, det_score_th: float = 0.4,
                     det_anchors=None, seed_rounds: int = 2):
    """The ENTIRE per-frame pipeline as ONE XLA program: (YOLO dynamic
    masking ->) SuperPoint frontend -> fused track step -> velocity update
    -> reference-KF pose gather. Under the axon transport each program
    execution pays a ~2 ms non-overlappable round-trip, so the frame loop's
    previous 3-4 dispatches (detector, frontend, track, ref-pose, eager
    velocity composition) are collapsed into one (reference: the per-frame
    work of Tracking::GrabImageRGBD + Track, src/Tracking.cc:1512-2286).

    Returns (feat, R, t, bind, counts, st2, (Rv', tv'), (R_ref, t_ref),
    dyn_ratio)."""
    from dani_slam_tpu.slam import frame as frame_mod

    dyn_ratio = jnp.zeros((), jnp.float32)
    if det_model is not None:
        from dani_slam_tpu.models.yolo import _mask_program
        boxes, box_mask, dyn_ratio = _mask_program(
            det_model, det_params, img, dyn_ids, det_hw[0], det_hw[1],
            score_th=det_score_th, anchors=det_anchors)
        use_boxes = True

    feat = frame_mod._frame_rgbd_program(
        sp_params, img, depth_img, cam, time, depth_factor, threshold,
        boxes, box_mask, n_max=n_max, use_boxes=use_boxes)

    R3, t3, bind, counts, st2 = track_frame_step(
        st, cam, feat, last_bind, R_cur, t_cur, Rv, tv, ref_kf,
        min_inliers=min_inliers, use_depth=True, has_vel=has_vel,
        matcher_model=matcher_model, matcher_params=matcher_params,
        seed_rounds=seed_rounds)

    # velocity for the next frame: T_new o T_last^-1 (reference mVelocity,
    # src/Tracking.cc:2227) — previously an eager host-side composition
    # costing its own dispatches
    Rv2, tv2 = lie.se3_mul(R3, t3, *lie.se3_inv(R_cur, t_cur))
    R_ref = st2.kf_R[ref_kf]
    t_ref = st2.kf_t[ref_kf]
    # ride the keyframe-decision scalars along the async counts transfer:
    # dyn_ratio (x1000 fixed-point) and the live keyframe count — pulling
    # either separately at decision time blocks the host on the in-flight
    # frame program (the old 70+ ms KF-frame stalls)
    counts6 = jnp.concatenate([counts, jnp.stack([
        (dyn_ratio * 1000.0).astype(jnp.int32),
        jnp.sum(st2.kf_mask.astype(jnp.int32))])])
    return (feat, R3, t3, bind, counts6, st2, (Rv2, tv2), (R_ref, t_ref),
            dyn_ratio)


@partial(jax.jit, static_argnames=("use_depth",))
def vi_refine_step_marg(st: mstate.MapState, cam, feat: FrameFeatures,
                        bind: jax.Array, R, t, v, bg, ba,
                        R_prev, t_prev, v_prev, prior_info, preint, calib,
                        use_depth: bool = False):
    """Visual-inertial refinement with the TRUE marginalized prior: the
    previous frame's state is optimized jointly (30 DoF) under the carried
    15x15 prior information, then Schur-marginalized out — the reference's
    PoseInertialOptimizationLastFrame + Marginalize chain
    (src/Optimizer.cc:4875,2960; include/G2oTypes.h:732). Returns
    (R, t, v, bg, ba, n_inliers, prior_info_next)."""
    from dani_slam_tpu.ops import solvers as slv

    has = (bind >= 0) & jnp.take(st.lm_mask, jnp.maximum(bind, 0))
    pts = st.lm_pos[jnp.where(has, bind, 0)]
    (R2, t2, v2, bg2, ba2, inl, n,
     info_next) = slv.pose_inertial_optimize_marginalized(
        R, t, v, bg, ba, R_prev, t_prev, v_prev, bg, ba, prior_info,
        preint, calib, cam, pts, feat.xy, has,
        obs_depth=feat.depth if use_depth else None, use_depth=use_depth,
        iters=8)
    return R2, t2, v2, bg2, ba2, n, info_next


def bootstrap_prior_info(preint, calib, info_cap: float = 1e3):
    """Initial 15x15 prior information for the marginalized VI chain —
    the first post-IMU-init frame has no marginalized prior yet (the
    reference's first frame after a KF runs ...LastKeyFrame with a fixed
    anchor, src/Optimizer.cc:4491); the capped diagonal of the inverse
    preintegration covariance is the same trust the anchored fallback used."""
    covs = preint.cov[jnp.arange(9), jnp.arange(9)]
    info9 = jnp.clip(1.0 / jnp.maximum(covs, 1e-8), 0.0, info_cap)
    dtp = jnp.maximum(preint.dt, 1e-3)
    walk = jnp.concatenate([
        jnp.full((3,), 1.0 / jnp.maximum(calib.walk_gyro ** 2 * dtp, 1e-12)),
        jnp.full((3,), 1.0 / jnp.maximum(calib.walk_acc ** 2 * dtp, 1e-12))])
    return jnp.diag(jnp.concatenate([info9, jnp.clip(walk, 0.0, info_cap)]))


# ---------------------------------------------------------------------------
# Host-side tracker
# ---------------------------------------------------------------------------

NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
RECENTLY_LOST = "RECENTLY_LOST"
LOST = "LOST"


class Tracker:
    """Host state machine driving the jitted steps (one per sensor mode).

    The reference runs this as the caller's thread with LocalMapping and
    LoopClosing in parallel threads; here mapping steps are invoked inline
    after keyframe insertion (System orchestrates).
    """

    def __init__(self, cam: _cam.Camera, caps: mstate.MapCaps = None,
                 sensor: str = "mono", seed: int = 0,
                 min_inliers_track: int = 10, min_inliers_map: int = 20,
                 kf_tracked_ratio: float | None = None,
                 max_frames_between_kf: int = 15,
                 min_frames_between_kf: int = 0, pipelined: bool = False):
        self.cam = cam
        self.caps = caps or mstate.MapCaps()
        self.sensor = sensor
        self.use_depth = sensor in ("rgbd", "stereo")
        self.key = jax.random.PRNGKey(seed)
        self.min_inliers_track = min_inliers_track
        self.min_inliers_map = min_inliers_map
        # keyframe-policy ratio by sensor (reference: thRefRatio = 0.9 mono /
        # 0.75 stereo-RGBD, src/Tracking.cc:3197-3204 — monocular needs
        # DENSER keyframes: intra-segment pose drift vs a stale-scale map is
        # the dominant mono error term)
        if kf_tracked_ratio is None:
            kf_tracked_ratio = 0.9 if sensor == "mono" else 0.75
        self.kf_tracked_ratio = kf_tracked_ratio
        self.max_frames_between_kf = max_frames_between_kf
        self.min_frames_between_kf = min_frames_between_kf
        self.pipelined = pipelined
        # LM rounds of the motion-model SEED solve (2 = production shortcut;
        # 4 = reference-faithful 4x10-iteration budget,
        # src/Optimizer.cc:814-1110 — A/B: tools/ab_frame_knobs.py)
        self.seed_rounds = 2
        # optional trained LightGlue (models/lightglue.MatcherState):
        # primary matcher for the reference-KF fallback (reference:
        # TrackReferenceKeyFrame runs LightGlue via SearchByBoW)
        self.matcher = None
        # SuperPoint params for the fused image-in frame program (set by
        # System when running the image path)
        self.sp_params = None
        # localization-mode visual odometry against last-frame depth points
        # (reference mbVO, src/Tracking.cc:2090-2134) — set by
        # System.activate_localization_mode
        self.localization_vo = False
        # host hook invoked before each keyframe decision (System wires its
        # deferred keyframe-pull resolver here)
        self.pre_kf_decision = None
        self.reset()

    def reset(self):
        # preserve System-installed hooks/config across map resets
        # (reference: CreateMapInAtlas keeps the Tracking object alive;
        # only the map and per-map state restart, src/Tracking.cc:2682)
        prev_inertial = getattr(self, "inertial", None)
        prev_reloc = getattr(self, "reloc_fn", None)
        prev_pipelined = getattr(self, "pipelined", None)
        self.st = mstate.empty_map(self.caps)
        self.state = NOT_INITIALIZED
        self.frame_id = 0
        self.init_feat: Optional[FrameFeatures] = None
        self.last_feat: Optional[FrameFeatures] = None
        self.last_bind = None
        self.R = jnp.eye(3)
        self.t = jnp.zeros(3)
        self.R_last = jnp.eye(3)
        self.t_last = jnp.zeros(3)
        self.vel = None          # (Rv, tv): T_cur * T_last^-1
        self.ref_kf = 0
        self.ref_kf_fid = -1     # frame id of the ref KF (slot-reuse guard)
        self.ref_kf_dev = jnp.zeros((), jnp.int32)   # device copy — passing
        # jnp.asarray(int) per frame would upload a scalar through the
        # (remote) transport every frame
        self.ref_kf_tracked = 0
        self.pending_kf = None
        # weld correction captured DURING a keyframe decision, to be applied
        # to the already-popped frame pose before _create_kf (see
        # System._resolve_kf_pull's GBA weld-back)
        self.pending_chain_corr = None
        self.last_kf_frame = -999
        self.frames_lost = 0
        self.new_kf: Optional[int] = None   # set when a KF was inserted
        self.init_kfs = None     # [(slot, frame_id)] of init keyframes
        self._init_feat_fid = 0
        self._traj_dev = []      # device-side (time, R, t) refs
        self._traj_host = []     # materialized numpy trajectory
        self._pending = []       # deferred decisions (pipelined mode)
        self.pipeline_depth = 4  # frames in flight before resolving
        # (4: a keyframe program (~28 ms device) plus the device->host
        # counts transfer fully drain behind 4 interleaved frame programs
        # even under tunnel-latency spikes; measured +8-10 FPS over depth 2
        # on the detector-on bench with no tracked-frame/ATE regression)
        self.dynamic_ratio = None  # device scalar set by System (YOLO)
        self._host_dyn_ratio = None  # host copies ridden along the counts
        self._host_n_kf = None       # transfer by the fused image path
        # fresh inertial state (same calibration) if one was installed
        if prev_inertial is not None:
            from dani_slam_tpu.slam.inertial import InertialState
            self.inertial = InertialState(prev_inertial.calib)
        else:
            self.inertial = None
        self.reloc_fn = prev_reloc
        self.last_time = None

    def flush(self):
        """Resolve all deferred decisions (call before reading results)."""
        self._resolve_pending(force=True)

    # -- public API -------------------------------------------------------

    def track(self, feat: FrameFeatures):
        """Process one frame; returns (state, R_cw, t_cw) — pose is None-ish
        (identity) until initialized. Sets self.new_kf when a keyframe was
        created (System then runs the mapping step)."""
        self.new_kf = None
        self._resolve_pending()
        if self.state == NOT_INITIALIZED:
            self._initialize(feat)
        else:
            self._track_frame(feat)

        self.frame_id += 1
        if self.state == OK:
            # keep DEVICE references — each np.asarray here would be a
            # device->host round-trip per frame; conversion happens lazily in
            # the `trajectory` property (one bulk transfer at save/eval time).
            # The reference-KF pose AT TRACK TIME rides along so the saved
            # trajectory can be re-anchored to the REFINED keyframe poses
            # (reference: SaveTrajectoryTUM stores per-frame T_cam<-refKF and
            # composes with the final KF pose, src/System.cc:579-638 — this
            # retroactively applies BA/loop corrections to every frame).
            R_ref, t_ref = _ref_pose(self.st, self.ref_kf_dev)
            self._traj_dev.append((feat.time, self.R, self.t, R_ref, t_ref,
                                   self.ref_kf_dev, self.ref_kf_fid))
        return self.state, self.R, self.t

    def track_image_rgbd(self, img, depth_img, time_dev, depth_factor_dev,
                         threshold_dev, nobox, detector=None,
                         n_max: int = 1024):
        """Image-in RGB-D tracking with the fused one-dispatch program
        (rgbd_frame_fused). Falls back to the feature path for
        initialization / lost / inertial frames. Returns (state, R, t)."""
        hot = (self.state == OK and self.pipelined and
               not (self.inertial is not None and self.inertial.initialized))
        det_kw = {}
        if detector is not None:
            det_kw = dict(det_model=detector.model,
                          det_params=detector.params,
                          dyn_ids=detector.dyn_ids,
                          det_hw=tuple(detector.input_hw),
                          det_score_th=detector.score_th,
                          det_anchors=detector.anchors)
        if not hot:
            from dani_slam_tpu.slam import frame as frame_mod
            boxes, bmask = nobox
            use_boxes = False
            if detector is not None:
                boxes, bmask, dyn_ratio = detector.dynamic_mask_inputs(img)
                self.dynamic_ratio = dyn_ratio
                use_boxes = True
            feat = frame_mod._frame_rgbd_program(
                self.sp_params, img, depth_img, self.cam, time_dev,
                depth_factor_dev, threshold_dev, boxes, bmask, n_max=n_max,
                use_boxes=use_boxes)
            return self.track(feat)

        self.new_kf = None
        self._resolve_pending()
        mm = self.matcher
        has_vel = self.vel is not None
        Rv, tv = self.vel if has_vel else (jnp.eye(3), jnp.zeros(3))
        (feat, R_new, t_new, bind, counts, st, vel2, ref_pose,
         dyn_ratio) = rgbd_frame_fused(
            self.sp_params, img, depth_img, self.cam, time_dev,
            depth_factor_dev, threshold_dev, nobox[0], nobox[1],
            self.st, self.last_bind, self.R, self.t, Rv, tv,
            self.ref_kf_dev, n_max=n_max,
            min_inliers=self.min_inliers_track, has_vel=has_vel,
            matcher_model=mm.model if mm is not None else None,
            matcher_params=mm.params if mm is not None else None,
            seed_rounds=self.seed_rounds, **det_kw)
        if detector is not None:
            self.dynamic_ratio = dyn_ratio

        snapshot = (self.R, self.t, self.R_last, self.t_last, self.vel,
                    self.st, self.last_bind, self.last_feat,
                    self.last_time, None)
        try:
            counts.copy_to_host_async()
        except AttributeError:
            pass
        self._apply_track(feat, R_new, t_new, bind, st, vel=vel2)
        self._pending.append((counts, feat, bind, (R_new, t_new), snapshot))

        self.frame_id += 1
        self._traj_dev.append((feat.time, self.R, self.t, ref_pose[0],
                               ref_pose[1], self.ref_kf_dev,
                               self.ref_kf_fid))
        return self.state, self.R, self.t

    @property
    def trajectory(self):
        """Tracked trajectory as [(time, R_cw, t_cw)] numpy triples,
        re-anchored to the CURRENT (refined) reference-keyframe poses."""
        if self._traj_dev:
            fetched, kf_R, kf_t, kf_fid, kf_mask = jax.device_get(
                (self._traj_dev, self.st.kf_R, self.st.kf_t,
                 self.st.kf_frame_id, self.st.kf_mask))
            for (tm, R, t, R_ref, t_ref, slot, fid) in fetched:
                R, t = np.asarray(R), np.asarray(t)
                slot = int(slot)
                if kf_mask[slot] and kf_fid[slot] == fid:
                    # T_cr = T_cw_track o inv(T_rw_track); T_cw = T_cr o T_rw_now
                    R_cr = R @ np.asarray(R_ref).T
                    t_cr = t - R_cr @ np.asarray(t_ref)
                    R = R_cr @ kf_R[slot]
                    t = R_cr @ kf_t[slot] + t_cr
                # else: ref KF culled & slot reused — keep the raw track pose
                self._traj_host.append((float(tm), R, t))
            self._traj_dev = []
        return self._traj_host

    # -- init -------------------------------------------------------------

    def _initialize(self, feat: FrameFeatures):
        if self.sensor in ("rgbd", "stereo"):
            # build unconditionally (functional state: discarded if the
            # depth gate fails) so the whole init is one dispatch chain +
            # ONE bundled scalar pull instead of 3 sequential round trips
            st2, k0, bind, stats = build_initial_map_rgbd(
                self.st, self.cam, feat, jnp.asarray(self.frame_id))
            n_depth, k0_host, n_bound = (int(x) for x in np.asarray(stats))
            if n_depth < 50:
                return
            self.st = st2
            self._post_init(feat, bind, jnp.eye(3), jnp.zeros(3), k0_host,
                            ref_kf_dev=k0.astype(jnp.int32),
                            n_bound=n_bound)
            self.new_kf = k0_host
            self.init_kfs = [(k0_host, self.frame_id)]
            return

        # monocular
        n_kp = int(jnp.sum(feat.valid))
        if self.init_feat is None:
            if n_kp > 100:
                self.init_feat = feat
                self._init_feat_fid = self.frame_id
            return
        if n_kp <= 100:
            self.init_feat = None
            return
        m = match_for_init(self.init_feat, feat)
        if int(m.ok.sum()) < 100:
            self.init_feat = feat
            self._init_feat_fid = self.frame_id
            return
        self.key, sub = jax.random.split(self.key)
        tv = two_view_from_matches(sub, self.cam, self.init_feat, feat, m)
        if not bool(tv.ok):
            return
        self.st, k0, k1, bind1, R, t = build_initial_map(
            self.st, self.cam, self.init_feat, feat, m, tv,
            jnp.asarray(self._init_feat_fid), jnp.asarray(self.frame_id))
        self._post_init(feat, bind1, R, t, int(k1))
        self.new_kf = int(k1)
        # init keyframes (slot, frame_id) for the System's IMU chain marks
        # (they are created here, not via the keyframe step)
        self.init_kfs = [(int(k0), self._init_feat_fid),
                         (int(k1), self.frame_id)]
        self.init_feat = None

    def _post_init(self, feat, bind, R, t, ref_kf, ref_kf_dev=None,
                   n_bound=None):
        self.state = OK
        self.R, self.t = R, t
        self.R_last, self.t_last = R, t
        self.last_feat = feat
        self.last_bind = bind
        self.ref_kf = ref_kf
        self.ref_kf_fid = self.frame_id
        self.ref_kf_dev = (ref_kf_dev if ref_kf_dev is not None
                           else jnp.asarray(ref_kf, jnp.int32))
        self.ref_kf_tracked = (n_bound if n_bound is not None
                               else int((bind >= 0).sum()))
        self.last_kf_frame = self.frame_id
        self.vel = None

    # -- per-frame tracking ----------------------------------------------

    def _predict(self):
        if self.vel is None:
            return self.R, self.t
        Rv, tv = self.vel
        return lie.se3_mul(Rv, tv, self.R, self.t)

    def _track_frame(self, feat: FrameFeatures):
        R_cur, t_cur = self.R, self.t
        has_vel = self.vel is not None
        # IMU prediction takes precedence over the constant-velocity model
        # (reference: PredictStateIMU when mbImuInitialized,
        # src/Tracking.cc:1962-1977)
        if (self.inertial is not None and self.inertial.initialized and
                self.inertial.last_preint is not None):
            from dani_slam_tpu.slam import inertial as inert
            R_cur, t_cur, v_pred = inert.predict_state_imu(
                self.R, self.t, self.inertial.v_w,
                self.inertial.last_preint, self.inertial.bias_g,
                self.inertial.bias_a, self.inertial.calib.R_bc,
                self.inertial.calib.t_bc)
            has_vel = False      # prediction already applied
        Rv, tv = self.vel if has_vel else (jnp.eye(3), jnp.zeros(3))
        mm = self.matcher
        R_new, t_new, bind, counts, st = track_frame_step(
            self.st, self.cam, feat, self.last_bind, R_cur, t_cur, Rv, tv,
            self.ref_kf_dev, min_inliers=self.min_inliers_track,
            use_depth=self.use_depth, has_vel=has_vel,
            matcher_model=mm.model if mm is not None else None,
            matcher_params=mm.params if mm is not None else None,
            seed_rounds=self.seed_rounds)

        # VI refinement: preintegration edge to the previous frame refines
        # pose + velocity + biases (reference: tracking switches to
        # PoseInertialOptimization* once the IMU is initialized)
        if (self.inertial is not None and self.inertial.initialized and
                self.inertial.last_preint is not None):
            # marginalized prior chain: first post-init frame bootstraps the
            # prior, later frames carry the Schur-marginalized information
            # forward (reference: Marginalize -> EdgePriorPoseImu ->
            # ...LastFrame, src/Optimizer.cc:2960,4875)
            if self.inertial.prior_info is None:
                self.inertial.prior_info = bootstrap_prior_info(
                    self.inertial.last_preint, self.inertial.calib)
            (R_new, t_new, v2, bg2, ba2, n_vi,
             info_next) = vi_refine_step_marg(
                st, self.cam, feat, bind, R_new, t_new, self.inertial.v_w,
                self.inertial.bias_g, self.inertial.bias_a,
                self.R, self.t, self.inertial.v_w,
                self.inertial.prior_info, self.inertial.last_preint,
                self.inertial.calib, use_depth=self.use_depth)
            self.inertial.v_w = v2
            self.inertial.bias_g = bg2
            self.inertial.bias_a = ba2
            self.inertial.prior_info = info_next
            self._vi_refined = True

        if self.pipelined:
            # Deferred decisions: update state optimistically from device
            # references, kick an async copy of the inlier counts, and
            # resolve the lost/keyframe decision at the START of the next
            # frame — by then the transfer has completed, so the host never
            # blocks on the device inside a frame. A rollback snapshot
            # protects against an optimistic update of a lost frame.
            inert_snap = None
            if self.inertial is not None:
                # inertial state is updated optimistically too (v_w/bias by
                # vi_refine_step, frame_windows by integrate_frame); without
                # this a rollback leaves it inconsistent with the restored
                # visual pose
                inert_snap = (self.inertial.v_w, self.inertial.bias_g,
                              self.inertial.bias_a, self.inertial.last_preint,
                              len(self.inertial.frame_windows),
                              self.inertial.prior_info)
            snapshot = (self.R, self.t, self.R_last, self.t_last, self.vel,
                        self.st, self.last_bind, self.last_feat,
                        self.last_time, inert_snap)
            try:
                counts.copy_to_host_async()
            except AttributeError:
                pass
            self._apply_track(feat, R_new, t_new, bind, st)
            self._pending.append((counts, feat, bind, (R_new, t_new),
                                  snapshot))
        else:
            n_track, n, n_ct, n_cf = (
                int(x) for x in np.asarray(counts))  # one sync
            if (n_track < self.min_inliers_track or
                    n < self.min_inliers_map):
                # localization mode outside the mapped region: fall back to
                # frame-to-frame VO on the last frame's depth points
                # (reference mbVO, src/Tracking.cc:2090-2134)
                if (self.localization_vo and self.use_depth and
                        self.last_feat is not None):
                    R_pred, t_pred = lie.se3_mul(Rv, tv, R_cur, t_cur) \
                        if has_vel else (R_cur, t_cur)
                    R_vo, t_vo, n_vo = track_last_frame_vo(
                        self.cam, self.last_feat.xy, self.last_feat.desc,
                        self.last_feat.depth, self.last_feat.valid,
                        self.R, self.t, feat, R_pred, t_pred,
                        use_depth=self.use_depth)
                    if int(n_vo) >= self.min_inliers_track:
                        self._apply_track(feat, R_vo, t_vo,
                                          jnp.full_like(bind, -1), self.st)
                        return
                self._on_lost(feat)
                return
            self._apply_track(feat, R_new, t_new, bind, st)
            if self._need_new_kf(n, n_ct, n_cf):
                self._create_kf(feat, bind, n_tracked_hint=n)

    def _apply_track(self, feat, R_new, t_new, bind, st, vel=None):
        self.st = st
        self.state = OK
        self.frames_lost = 0
        # velocity update (reference: mVelocity = Tcl, Tracking.cc:2227);
        # R_new is re-orthonormalized on device — without it, f32 scale error
        # feeds back through the velocity chain and grows exponentially.
        # The fused frame program computes vel on-device and passes it in;
        # the eager composition below costs extra dispatches per frame.
        if vel is not None:
            self.vel = vel
        else:
            Ri, ti = lie.se3_inv(self.R_last, self.t_last)
            self.vel = lie.se3_mul(R_new, t_new, Ri, ti)
        # world-frame velocity for the inertial pipeline: finite-difference
        # fallback ONLY when the VI refinement didn't already produce a
        # better (optimized) velocity this frame
        if self.inertial is not None and self.last_time is not None and \
                not getattr(self, "_vi_refined", False):
            dt = jnp.maximum(feat.time - self.last_time, 1e-3)
            p_new = -jnp.einsum('ji,j->i', R_new, t_new)
            p_old = -jnp.einsum('ji,j->i', self.R_last, self.t_last)
            self.inertial.v_w = (p_new - p_old) / dt
        self._vi_refined = False
        self.last_time = feat.time
        self.R_last, self.t_last = R_new, t_new
        self.R, self.t = R_new, t_new
        self.last_feat = feat
        self.last_bind = bind

    def _resolve_pending(self, force: bool = False):
        """Resolve deferred lost/keyframe decisions once their count
        transfers have had a pipeline_depth-frames head start (the device->
        host RTT exceeds the per-frame device time, so a depth-1 pipeline
        still blocks; deeper deferral fully hides the transfer)."""
        while self._pending and (force or
                                 len(self._pending) > self.pipeline_depth):
            counts, feat, bind, frame_pose, snapshot = self._pending.pop(0)
            vals = np.asarray(counts)
            n_track, n, n_ct, n_cf = (int(x) for x in vals[:4])
            if len(vals) > 4:
                # fused image path rides the KF-decision scalars along
                # (see rgbd_frame_fused): host copies mean _need_new_kf
                # never blocks on the in-flight frame program
                self._host_dyn_ratio = float(vals[4]) / 1000.0
                self._host_n_kf = int(vals[5])
            else:
                # NON-fused resolve (feature path / recovery): the cached
                # fused-path values are stale — a lingering high dyn_ratio
                # would veto every recovery keyframe, and a stale low KF
                # count defeats the capacity veto near caps.K
                self._host_dyn_ratio = None
                self._host_n_kf = None
            import os as _os
            if _os.environ.get("DANI_DEBUG_TRACK"):
                import sys as _s
                print(f"   resolve: n_track={n_track} n={n} close={n_ct}/"
                      f"{n_cf} ref={self.ref_kf_tracked}", file=_s.stderr,
                      flush=True)
            if n_track < self.min_inliers_track or n < self.min_inliers_map:
                # roll back to before the failed frame, discarding the
                # optimistic updates of the frames after it
                (self.R, self.t, self.R_last, self.t_last, self.vel,
                 self.st, self.last_bind, self.last_feat,
                 self.last_time, inert_snap) = snapshot
                if inert_snap is not None and self.inertial is not None:
                    (self.inertial.v_w, self.inertial.bias_g,
                     self.inertial.bias_a, self.inertial.last_preint,
                     n_wins, self.inertial.prior_info) = inert_snap
                    del self.inertial.frame_windows[n_wins:]
                for _ in range(len(self._pending) + 1):
                    if self._traj_dev:
                        self._traj_dev.pop()
                self._pending.clear()
                self._on_lost(feat)
            elif self._need_new_kf(n, n_ct, n_cf):
                if self.pending_chain_corr is not None:
                    # a GBA weld landed inside this decision: the popped
                    # frame pose predates it
                    cR, ct = self.pending_chain_corr
                    frame_pose = apply_chain_correction(frame_pose[0],
                                                        frame_pose[1],
                                                        cR, ct)
                self._create_kf(feat, bind, pose=frame_pose,
                                n_tracked_hint=n)
            self.pending_chain_corr = None

    def _on_lost(self, feat: FrameFeatures | None = None):
        self.frames_lost += 1
        if self.state == OK:
            self.state = RECENTLY_LOST
        elif self.frames_lost > 20:
            self.state = LOST
        # IMU coast: while RECENTLY_LOST with an initialized IMU the pose
        # chain stays alive on pure inertial prediction — visual failure
        # (blur/occlusion/blackout) does not freeze the trajectory, and the
        # next good frame resumes from a predicted pose near the truth
        # (reference: RECENTLY_LOST + IMU -> PredictStateIMU for up to
        # time_recently_lost=5 s, src/Tracking.cc:2001-2033)
        if (self.state == RECENTLY_LOST and self.inertial is not None and
                self.inertial.initialized and
                self.inertial.last_preint is not None):
            from dani_slam_tpu.slam import inertial as inert
            R_p, t_p, v_p = inert.predict_state_imu(
                self.R, self.t, self.inertial.v_w,
                self.inertial.last_preint, self.inertial.bias_g,
                self.inertial.bias_a, self.inertial.calib.R_bc,
                self.inertial.calib.t_bc)
            self.R, self.t = R_p, t_p
            self.R_last, self.t_last = R_p, t_p
            self.inertial.v_w = v_p
            self.vel = None
        # relocalization attempt (reference: RECENTLY_LOST branch runs
        # Relocalization each frame, src/Tracking.cc:2001-2035)
        if feat is not None and self.reloc_fn is not None:
            out = self.reloc_fn(self, feat)
            if out is not None:
                R, t, bind, reloc_kf = out
                self.state = OK
                self.frames_lost = 0
                self.R, self.t = R, t
                self.R_last, self.t_last = R, t
                self.vel = None
                self.last_feat = feat
                self.last_bind = bind
                # re-anchor the tracker to the keyframe that relocalized us
                # (reference: Relocalization sets mpReferenceKF; without it
                # the ref-KF fallback searches a stale, possibly distant KF)
                if reloc_kf is not None:
                    self.ref_kf = int(reloc_kf)
                    self.ref_kf_dev = jnp.asarray(self.ref_kf, jnp.int32)
                    self.ref_kf_fid = int(self.st.kf_frame_id[self.ref_kf])
                if self.inertial is not None:
                    # a relocalization jump invalidates the carried
                    # marginalized prior (it constrains the OLD pose chain)
                    self.inertial.prior_info = None

    def _need_new_kf(self, n_tracked: int, n_close_tracked: int = 10 ** 9,
                     n_close_free: int = 0) -> bool:
        """Reference: NeedNewKeyFrame c1a/c1b/c1c/c2 conditions
        (src/Tracking.cc:3159-3229)."""
        if self.pre_kf_decision is not None:
            self.pre_kf_decision()   # sync deferred ref_kf_tracked
        since = self.frame_id - self.last_kf_frame
        if since < self.min_frames_between_kf:
            return False
        if n_tracked < 15:
            return False
        # depth sensors: the view is sliding onto unmapped territory when
        # few CLOSE points are tracked but many close keypoints are unbound
        # (reference bNeedToInsertClose, src/Tracking.cc:3159-3196) — this
        # fires while tracking is still healthy, well before the inlier
        # ratio collapses. The reference's absolute 100/70 assume ~1000-2000
        # features; scale to this tracker's budget (at small budgets the
        # absolute numbers fire every frame and churn the map).
        th_ct = max(int(0.10 * self.caps.N), 20)
        th_cf = max(int(0.07 * self.caps.N), 14)
        need_close = (self.use_depth and n_close_tracked < th_ct and
                      n_close_free > th_cf)
        c1 = since >= self.max_frames_between_kf
        c2 = (n_tracked < self.kf_tracked_ratio *
              max(self.ref_kf_tracked, 1)) or need_close
        if not (c1 or c2):
            return False
        # dynamic-scene veto: skip KF creation when >80% of the image is
        # dynamic objects (reference: src/Tracking.cc:3273-3280). The fused
        # image path delivers the ratio on the host via the counts transfer
        # (_host_dyn_ratio); other paths pull the device scalar, and only
        # when a KF would actually be created.
        dyn = self._host_dyn_ratio
        if dyn is None and self.dynamic_ratio is not None:
            dyn = float(self.dynamic_ratio)
        if dyn is not None and dyn > 0.8:
            return False
        # capacity veto: a full keyframe table would silently overwrite the
        # last slot (first_free_slot clamps). The fused path's count is <=2
        # frames stale — KFs are never minted back-to-back at the cap, so
        # staleness cannot overflow the table.
        n_kf = self._host_n_kf
        if n_kf is None:
            n_kf = int(mstate.num_keyframes(self.st))
        if n_kf >= self.caps.K:
            return False
        return True

    def _create_kf(self, feat: FrameFeatures, bind: jax.Array, pose=None,
                   n_tracked_hint: int | None = None):
        """Record the pending keyframe; the System runs the fused
        insert+mapping program (slam/mapping.py keyframe_step). `pose` is
        the tracked pose OF THAT FRAME — in pipelined mode the tracker state
        has advanced past it by the pipeline depth. n_tracked_hint seeds
        ref_kf_tracked with the decision-time inlier count so the keyframe
        policy never waits on the deferred keyframe pull (the exact
        sum(bind>=0) replaces it when the pull resolves)."""
        R_kf, t_kf = pose if pose is not None else (self.R, self.t)
        if n_tracked_hint is not None:
            self.ref_kf_tracked = int(n_tracked_hint)
        self.pending_kf = (feat, bind, R_kf, t_kf)
        self.last_kf_frame = self.frame_id
        self.new_kf = True
