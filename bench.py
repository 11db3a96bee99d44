"""Benchmark: end-to-end IMAGE-IN tracking FPS on the real device.

The north-star workload (BASELINE.json): 640x480 RGB-D frames with a
moving (dynamic) object -> YOLO dynamic masking -> SuperPoint forward
(256-D descriptors, N=1024 keypoints) -> full SLAM pipeline (tracking +
keyframing + mapping + local BA) at >= 60 FPS on one TPU v5e chip — the
analogue of TUM fr3_walking_xyz RGB-D playback with dynamic-object
suppression (reference: Examples/RGB-D/rgbd_tum.cc main loop +
src/Tracking.cc:1534-1546 running YoloDetection on every RGB-D frame).

Per frame the hot path is ONE XLA program (tracking.rgbd_frame_fused:
detector -> frontend -> track -> velocity -> ref-pose), dispatched through
System.track_rgbd.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — value is
the MEDIAN of three timed passes; vs_baseline = median_fps / 60. The same
line carries two sub-benchmarks: "official" (the identical workload with
the reference-scale official LightGlue 256x9 matcher + yolov5s detector)
and "loop" (per-keyframe wall latency of the full loop-closing pipeline on
a drifted loop map, firing detection + correction + time-sliced GBA).
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    # persistent compile cache: repeated bench runs (and driver re-runs)
    # skip the expensive first-compile entirely
    jax.config.update("jax_compilation_cache_dir", "/tmp/dani_slam_jax_cache")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dani_slam_tpu.core import cameras
    from dani_slam_tpu.core import state as mstate
    from dani_slam_tpu.models import superpoint as sp_mod
    from dani_slam_tpu.models import yolo as yolo_mod
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import synthetic

    cam = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
    caps = mstate.MapCaps()               # advertised defaults: K=256,
    n_feat = 1024                         # L=32768, N=1024, D=256
    n_frames = 60

    sp_params = sp_mod.load_default_params()
    assert sp_params is not None, "shipped SuperPoint weights missing"
    det = yolo_mod.load_default_detector()
    assert det is not None, "shipped detector weights missing"

    # --- render the dataset (host, once) and pre-stage it in HBM ---------
    # frustum-sampled textured points + the moving warm board at ~4 m (the
    # fr3_walking "person" analogue) — shared builder so the A/B tools run
    # the same scene family (utils/synthetic.make_rgbd_image_sequence).
    # Angle span ~0.35 rad over 2 s: the TUM walking sequences' gentle
    # handheld motion (the north-star workload is dynamic-content load at
    # frame rate, not an extreme view-turnover stress test)
    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                            angle_span=0.35)
    imgs_np, deps_np, times_np = synthetic.make_rgbd_image_sequence(
        cam, R_gt, t_gt, seed=0)
    imgs = [jax.device_put(jnp.asarray(x)) for x in imgs_np]
    deps = [jax.device_put(jnp.asarray(x)) for x in deps_np]
    times = [jax.device_put(jnp.asarray(t, jnp.float32)) for t in times_np]

    import os
    import sys as _sys
    debug = bool(os.environ.get("BENCH_DEBUG"))

    def make_system(detector=det, matcher="auto"):
        sys = System(cam, Sensor.RGBD, caps=caps, sp_params=sp_params,
                     n_features=n_feat, pipelined=True, detector=detector,
                     matcher=matcher)
        sys.sp_threshold = 0.012
        # drain construction-time device work (map-state alloc, weight
        # staging) BEFORE the caller's timer starts: the reference times
        # per-TrackRGBD calls after its constructor has loaded all models
        # (Examples/RGB-D/rgbd_tum.cc:97-108); without this block the async
        # dispatch queue charges construction to frame 0. The token rides
        # the in-order device stream behind everything enqueued so far.
        jax.block_until_ready(sys.tracker.st)
        jax.device_put(jnp.zeros(())).block_until_ready()
        return sys

    def run_sequence(sys):
        n_ok = 0
        t_prev = time.perf_counter()
        for i in range(n_frames):
            state, _, _ = sys.track_rgbd(imgs[i], deps[i], i / 30.0,
                                         time_dev=times[i])
            n_ok += state == "OK"
            if debug:
                t_now = time.perf_counter()
                print(f"f{i}: {1e3 * (t_now - t_prev):.1f} ms {state} "
                      f"kf={sys._kf_count}", file=_sys.stderr, flush=True)
                t_prev = t_now
        sys.shutdown()
        jax.block_until_ready(sys.tracker.st.kf_R)
        return n_ok

    # warmup pass: run the FULL sequence once so every program variant
    # (fused frame, init, track has_vel on/off, keyframe step with/without
    # BA) compiles
    run_sequence(make_system())

    # timed passes on fresh systems (all programs cached). The axon
    # transport's round-trip latency swings 0.1->30+ ms with tenant
    # contention on a minutes timescale; three passes are taken and the
    # MEDIAN is the reported value (the gate number must hold for a typical
    # run, not the luckiest one — round-3 review), with all runs printed.
    fps_runs = []
    for _ in range(3):
        sys = make_system()
        t0 = time.perf_counter()
        n_ok = run_sequence(sys)
        dt = time.perf_counter() - t0
        fps_runs.append(n_frames / dt)
    fps = float(np.median(fps_runs))
    # progress line: the headline runs survive even if an optional
    # sub-benchmark below asserts (stdout JSON still comes last)
    print(f"headline runs {[round(f, 2) for f in fps_runs]} "
          f"median {fps:.2f}", file=_sys.stderr, flush=True)

    # honesty checks: the timed pass must have done REAL SLAM work and the
    # detector must have seen the moving object inside the timed loop
    n_kf = int(np.asarray(sys.tracker.st.kf_mask).sum())
    n_lm = int(np.asarray(sys.tracker.st.lm_mask).sum())
    dyn = float(np.asarray(sys.tracker.dynamic_ratio)) \
        if sys.tracker.dynamic_ratio is not None else 0.0
    assert n_ok >= 0.85 * n_frames, f"only {n_ok}/{n_frames} frames tracked"
    assert n_kf >= 5 and n_lm >= 1000, (n_kf, n_lm)
    assert dyn > 0.0, "detector never fired on the moving object"
    print(f"tracked {n_ok}/{n_frames} frames, {n_kf} keyframes, "
          f"{n_lm} landmarks, detector-on (last dyn_ratio {dyn:.3f})",
          file=_sys.stderr)

    # ---- reference-scale models: the SAME workload with the official
    # LightGlue (256-dim x 9 layers) as the System matcher and yolov5s
    # (0.33/0.50) as the detector — the sizes the reference deploys
    # (src/LightGlue.cpp:9, src/YoloDetect.cpp:9). Records FPS at official
    # model scale (round-3 review: the headline number alone is conditioned
    # on the compact throughput-tuned nets).
    official = None
    if not os.environ.get("BENCH_SKIP_OFFICIAL"):
        from dani_slam_tpu.models.lightglue_official import \
            load_official_matcher
        from dani_slam_tpu.models.yolo_official import load_official_detector
        mo = load_official_matcher(cam.width, cam.height)
        do = load_official_detector()
        if mo is not None and do is not None:
            mk = lambda: make_system(detector=do, matcher=mo)
            run_sequence(mk())                       # warmup/compile pass
            fps_o_runs = []
            for _ in range(3):
                sys_o = mk()
                t0 = time.perf_counter()
                n_ok_o = run_sequence(sys_o)
                fps_o_runs.append(n_frames / (time.perf_counter() - t0))
            n_kf_o = int(np.asarray(sys_o.tracker.st.kf_mask).sum())
            n_lm_o = int(np.asarray(sys_o.tracker.st.lm_mask).sum())
            dyn_o = float(np.asarray(sys_o.tracker.dynamic_ratio)) \
                if sys_o.tracker.dynamic_ratio is not None else 0.0
            assert n_ok_o >= 0.85 * n_frames, \
                f"official: only {n_ok_o}/{n_frames} frames tracked"
            assert n_kf_o >= 5 and n_lm_o >= 1000, (n_kf_o, n_lm_o)
            assert dyn_o > 0.0, "official detector never fired"
            official = {
                "metric": "tracking_fps_official_lg256x9_yolov5s",
                "value": round(float(np.median(fps_o_runs)), 2),
                "runs": [round(f, 2) for f in fps_o_runs],
            }
            print(f"official-scale: {official['value']} FPS "
                  f"(runs {official['runs']}), {n_kf_o} kf {n_lm_o} lm",
                  file=_sys.stderr)
        else:
            # LOUD skip (round-4 verdict: a silent skip hid the missing
            # yolov5s weights for a whole round) — the skip lands in the
            # recorded JSON, not only on stderr
            official = {
                "skipped": True,
                "reason": "official-scale weights absent "
                          f"(matcher={'ok' if mo is not None else 'MISSING'},"
                          f" detector={'ok' if do is not None else 'MISSING'})",
            }
            print("official-scale weights absent — skipping official pass",
                  file=_sys.stderr)

    # ---- loop closure under time pressure: per-keyframe wall latency of
    # the full loop-closing pipeline (BoW detect -> Sim3 verify -> correct
    # -> time-sliced GBA chunks -> weld) on a deterministic drifted loop
    # map at production capacities (reference: LoopClosing::Run,
    # src/LoopClosing.cc:91-320; round-3 review asked for an on-device
    # number for the keyframe-rate cost under loop pressure).
    loop = None
    if not os.environ.get("BENCH_SKIP_LOOP"):
        from dani_slam_tpu.slam.loopclosing import LoopCloser
        from dani_slam_tpu.utils.synthetic import make_drifted_loop_state

        st0, kf_ids, _, _ = make_drifted_loop_state(cam, caps, K=16)
        jax.block_until_ready(st0.kf_R)

        def run_loop_pass():
            lc = LoopCloser(cam, caps, codebook="live", seed=0,
                            min_kf_gap=6, fix_scale=True)
            lc.train_codebook_after = 6
            st = st0
            ms = []
            for count, k in enumerate(kf_ids, start=1):
                t0 = time.perf_counter()
                st = lc.on_keyframe(st, k, kf_count=count)
                jax.block_until_ready(st.kf_R)
                ms.append(1e3 * (time.perf_counter() - t0))
            st = lc.finish_gba(st, jnp.asarray(kf_ids[-1]))
            jax.block_until_ready(st.kf_R)
            return lc, ms

        run_loop_pass()                               # warmup/compile pass
        lc, loop_ms = run_loop_pass()
        assert lc.n_loops == 1, f"loop not closed (n_loops={lc.n_loops})"
        loop = {
            "metric": "loop_close_kf_latency",
            "median_ms": round(float(np.median(loop_ms)), 2),
            "max_ms": round(float(np.max(loop_ms)), 2),
            "n_keyframes": len(loop_ms),
            "n_loops": lc.n_loops,
        }
        print(f"loop pressure: median {loop['median_ms']} ms/KF, "
              f"max {loop['max_ms']} ms (corrective KF), loop closed",
              file=_sys.stderr)

    # optional per-stage device-time breakdown (reference REGISTER_TIMES
    # analogue: TrackingTimeStats.txt / LocalMapTimeStats.txt / ExecMean.txt)
    if os.environ.get("BENCH_STAGES"):
        from dani_slam_tpu.utils import stage_profile
        tt, mt = stage_profile.profile_rgbd_stages(
            make_system(), imgs, deps, times)
        stage_profile.save_stats(tt, mt, prefix="")
        for name, s in {**tt.summary(), **mt.summary()}.items():
            print(f"stage {name}: {s['mean_ms']:.2f} ms (n={s['count']})",
                  file=_sys.stderr)

    out = {
        "metric": "tracking_fps_image_rgbd_640x480_sp1024_yolo",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
        "detector": True,
        "runs": [round(f, 2) for f in fps_runs],
    }
    if official is not None:
        out["official"] = official
    if loop is not None:
        out["loop"] = loop
    print(json.dumps(out))


if __name__ == "__main__":
    main()
