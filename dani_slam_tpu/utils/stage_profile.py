"""Per-stage device timing harness — the REGISTER_TIMES analogue.

Reference: compile-time REGISTER_TIMES machinery records 9 tracking + 5
local-mapping stage vectors and dumps TrackingTimeStats.txt /
LocalMapTimeStats.txt / ExecMean.txt (include/Tracking.h:181-195,
include/LocalMapping.h:114-131, src/Tracking.cc:185-535).

The production frame loop here is ONE fused XLA program per frame (and one
per keyframe) — there are no host-visible stage boundaries to time inside
it. This harness therefore runs the DECOMPOSED stage programs alongside a
normally-tracking System and times each with a device sync: the numbers
are the per-stage device costs the fused program is built from (the fused
total is lower than the stage sum — fusion exists to delete dispatch
overhead and enable cross-stage XLA fusion). Use it to answer "where do
the milliseconds go" (e.g. the <10 ms local-BA target in BASELINE.json),
not to measure end-to-end FPS — that is bench.py's job.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from dani_slam_tpu.utils.timing import StageTimer

# stage names mirror the reference's vectors (Tracking.h:181-195 /
# LocalMapping.h:114-131); stages that do not exist in this design (image
# rectification is a precomputed remap fused into the frontend; stereo
# matching is RGB-D depth lookup) are recorded as part of "ORB_extraction"
TRACKING_STAGES = ("YOLO_detect", "ORB_extraction", "Pose_pred",
                   "LM_track", "Total_track")
MAPPING_STAGES = ("KF_insertion", "MP_creation", "MP_culling", "LBA",
                  "KF_culling", "Total_mapping")


def _sync(x):
    jax.block_until_ready(x)
    return x


def profile_rgbd_stages(sys, imgs, deps, times, n_warmup: int = 3,
                        lba_iters: int = 6):
    """Track the sequence through `sys` (fused production path) while
    timing the decomposed stage programs each frame. Returns
    (tracking_timer, mapping_timer); write CSVs with save_stats()."""
    from dani_slam_tpu.slam import frame as frame_mod
    from dani_slam_tpu.slam import mapping, tracking

    tt, mt = StageTimer(), StageTimer()
    lba_stats = []
    # each decomposed stage program compiles on its FIRST call (the frame
    # warmup does not cover keyframe-rate stages, whose first run lands at
    # the first keyframe) — discard every stage's first sample so means are
    # steady-state device time, not compile time
    seen = set()

    def rec(timer, name, dt):
        if name in seen:
            timer.record(name, dt)
        else:
            seen.add(name)
    tr = sys.tracker
    cam = sys.cam
    sp = sys._sp()
    det = sys.detector
    thr = jnp.asarray(sys.sp_threshold, jnp.float32)
    dfac = jnp.asarray(5000.0, jnp.float32)
    nobox = (jnp.zeros((1, 4), jnp.float32), jnp.zeros((1,), bool))

    for i in range(len(imgs)):
        img, dep, tdev = imgs[i], deps[i], times[i]
        warm = i < n_warmup
        boxes, bmask = nobox
        use_boxes = False
        t0 = time.perf_counter()
        if det is not None:
            boxes, bmask, _ = det.dynamic_mask_inputs(img)
            _sync(boxes)
            use_boxes = True
            if not warm:
                rec(tt, "YOLO_detect", time.perf_counter() - t0)
        t0 = time.perf_counter()
        feat = frame_mod._frame_rgbd_program(
            sp, img, dep, cam, tdev, dfac, thr, boxes, bmask,
            n_max=sys.n_features, use_boxes=use_boxes)
        _sync(feat.xy)
        if not warm:
            rec(tt, "ORB_extraction", time.perf_counter() - t0)

        if tr.state == tracking.OK and tr.last_bind is not None:
            from dani_slam_tpu.core import lie
            if tr.vel is not None:
                R_pred, t_pred = lie.se3_mul(*tr.vel, tr.R, tr.t)
            else:
                R_pred, t_pred = tr.R, tr.t
            t0 = time.perf_counter()
            out = tracking.track_motion_model(
                tr.st, cam, feat, tr.last_bind, R_pred, t_pred,
                use_depth=True)
            _sync(out.R)
            if not warm:
                rec(tt, "Pose_pred", time.perf_counter() - t0)
            t0 = time.perf_counter()
            out2 = tracking.track_local_map(
                tr.st, cam, feat, out.bindings, out.R, out.t,
                use_depth=True)
            _sync(out2.R)
            if not warm:
                rec(tt, "LM_track", time.perf_counter() - t0)

        # the production (fused) frame, timed end-to-end
        t0 = time.perf_counter()
        sys.track_rgbd(img, dep, float(times[i]), time_dev=tdev)
        _sync(tr.R)
        if not warm:
            rec(tt, "Total_track", time.perf_counter() - t0)

        # keyframe stages: when the production path inserted one, time the
        # decomposed mapping programs on the CURRENT map state
        if tr.new_kf and tr.state == tracking.OK:
            st = tr.st
            k = tr.ref_kf_dev
            t_all = 0.0
            t0 = time.perf_counter()
            _sync(mapping.create_depth_landmarks(st, cam, k,
                                                 max_depth=sys.max_depth))
            mm = sys.matcher
            _sync(mapping.create_new_landmarks(
                st, cam, k,
                matcher_model=mm.model if mm is not None else None,
                matcher_params=mm.params if mm is not None else None))
            dt = time.perf_counter() - t0
            t_all += dt
            if not warm:
                rec(mt, "MP_creation", dt)
            t0 = time.perf_counter()
            _sync(mapping.fuse_into_neighbors(st, cam, k))
            dt = time.perf_counter() - t0
            t_all += dt
            if not warm:
                rec(mt, "KF_insertion", dt)    # insert+fuse bookkeeping
            t0 = time.perf_counter()
            _sync(mapping.local_bundle_adjustment(st, cam, k,
                                                  iters=lba_iters))
            dt = time.perf_counter() - t0
            t_all += dt
            if not warm:
                first_lba = "LBA" not in seen
                rec(mt, "LBA", dt)
                # LBA_Stats analogue: window landmark/observation coverage
                # per solve (reference logs edges/KFs/MPs per LBA). The
                # first sample is the compile, not device time — discard it
                # here too (round-3 review: the shipped CSV's 10 s first
                # row made the <10 ms audit fail on its face).
                if not first_lba:
                    wl, kl, ob, obk = (int(x) for x in
                                       mapping.lba_window_stats(st, k))
                    lba_stats.append((dt * 1e3, wl, kl, ob, obk))
            t0 = time.perf_counter()
            _sync(mapping.cull_bad_landmarks(st, st.next_kf_counter))
            dt = time.perf_counter() - t0
            t_all += dt
            if not warm:
                rec(mt, "MP_culling", dt)
            t0 = time.perf_counter()
            _sync(mapping.cull_redundant_keyframes(st, k))
            dt = time.perf_counter() - t0
            t_all += dt
            if not warm:
                rec(mt, "KF_culling", dt)
                rec(mt, "Total_mapping", t_all)
    tt.lba_stats = mt.lba_stats = lba_stats
    return tt, mt


def save_stats(tracking_timer: StageTimer, mapping_timer: StageTimer,
               prefix: str = ""):
    """Write the reference's four stat files (TrackingTimeStats.txt,
    LocalMapTimeStats.txt per-sample CSVs + ExecMean.txt summary)."""
    tracking_timer.save_csv(prefix + "TrackingTimeStats.txt")
    mapping_timer.save_csv(prefix + "LocalMapTimeStats.txt")
    # per-LBA counts (reference: LBA_Stats.txt with edges/KFs/MPs per solve)
    if getattr(mapping_timer, "lba_stats", None):
        with open(prefix + "LBA_Stats.txt", "w") as f:
            f.write("ms,window_lms,kept_lms,window_obs,kept_obs\n")
            for row in mapping_timer.lba_stats:
                f.write("%.3f,%d,%d,%d,%d\n" % row)
    both = StageTimer()
    for t in (tracking_timer, mapping_timer):
        for name, xs in t.samples.items():
            both.samples[name].extend(xs)
    both.save_means(prefix + "ExecMean.txt")
