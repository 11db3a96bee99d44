"""Benchmark: end-to-end IMAGE-IN tracking FPS on the real device.

The north-star workload (BASELINE.json): 640x480 grayscale images ->
SuperPoint forward (256-D descriptors, N=1024 keypoints) -> full SLAM
pipeline (tracking + keyframing + mapping + local BA) at >= 60 FPS on one
TPU v5e chip — the analogue of TUM fr3_walking_xyz RGB-D playback
(reference: Examples/RGB-D/rgbd_tum.cc main loop).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = measured_fps / 60.
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

    from dani_slam_tpu.core import cameras, state as mstate
    from dani_slam_tpu.models import superpoint as sp_mod
    from dani_slam_tpu.slam import frame as frame_mod
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import synthetic

    cam = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
    caps = mstate.MapCaps()               # advertised defaults: K=256,
    n_feat = 1024                         # L=32768, N=1024, D=256
    n_frames = 60

    sp_params = sp_mod.load_default_params()
    assert sp_params is not None, "shipped SuperPoint weights missing"

    # --- render the dataset (host, once) and pre-stage it in HBM ---------
    # points sampled inside the camera frustum along the sweep, at depths
    # within the uint16 range of depth_factor=5000 (13.1 m) — beyond-range
    # depth encodes as INVALID, so camera-centered sampling keeps the RGB-D
    # landmark pipeline fully loaded every frame
    rng = np.random.RandomState(0)
    # angle span ~0.35 rad over 2 s: the TUM walking sequences' gentle
    # handheld motion (the north-star workload is dynamic-content load at
    # frame rate, not an extreme view-turnover stress test)
    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                            angle_span=0.35)
    # ~1500 parents spread over the swept volume on a jittered grid (>=14
    # px apart at mid-depth): the detection budget (1024) then returns a
    # STABLE keypoint set frame to frame — with clustered points the top-K
    # selection churns and map coverage saturates low
    pts_list = []
    per_batch = 160
    for j in list(range(0, n_frames, 6)) + [n_frames - 1]:
        gx, gy = np.meshgrid(np.linspace(40, 600, 16),
                             np.linspace(40, 440, 10))
        u = (gx + rng.uniform(-12, 12, gx.shape)).ravel()[:per_batch]
        v = (gy + rng.uniform(-12, 12, gy.shape)).ravel()[:per_batch]
        z = rng.uniform(4.0, 11.0, per_batch)
        rays = np.stack([(u - 320.0) / 500.0, (v - 240.0) / 500.0,
                         np.ones(per_batch)], 1)
        pc = (rays * z[:, None]).astype(np.float32)
        Rj, tj = np.asarray(R_gt[j]), np.asarray(t_gt[j])
        pts_list.append((Rj.T @ (pc - tj).T).T.astype(np.float32))
    pts = np.concatenate(pts_list, 0)
    bright = rng.uniform(150, 230, len(pts)).astype(np.float32)
    imgs, deps = [], []
    for i in range(n_frames):
        im, de = synthetic.render_image_depth(pts, bright, cam, R_gt[i],
                                              t_gt[i], seed=i)
        imgs.append(jax.device_put(jnp.asarray(im)))
        deps.append(jax.device_put(jnp.asarray(de)))
    times = [jax.device_put(jnp.asarray(i / 30.0, jnp.float32))
             for i in range(n_frames)]
    dfac = jax.device_put(jnp.asarray(5000.0, jnp.float32))
    thr = jax.device_put(jnp.asarray(0.012, jnp.float32))
    nobox = (jax.device_put(jnp.zeros((1, 4), jnp.float32)),
             jax.device_put(jnp.zeros((1,), bool)))

    import os
    import sys as _sys
    debug = bool(os.environ.get("BENCH_DEBUG"))

    def run_sequence(sys):
        n_ok = 0
        t_prev = time.perf_counter()
        for i in range(n_frames):
            feat = frame_mod._frame_rgbd_program(
                sp_params, imgs[i], deps[i], cam, times[i], dfac, thr,
                nobox[0], nobox[1], n_max=n_feat, use_boxes=False)
            state, _, _ = sys.track_features(feat)
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
    # (frontend, init, track has_vel on/off, keyframe step with/without BA)
    # compiles
    sys = System(cam, Sensor.RGBD, caps=caps, sp_params=sp_params,
                 n_features=n_feat, pipelined=True)
    run_sequence(sys)

    # timed pass on a fresh system (all programs cached)
    sys = System(cam, Sensor.RGBD, caps=caps, sp_params=sp_params,
                 n_features=n_feat, pipelined=True)
    t0 = time.perf_counter()
    n_ok = run_sequence(sys)
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    # honesty checks: the timed pass must have done REAL SLAM work
    n_kf = int(np.asarray(sys.tracker.st.kf_mask).sum())
    n_lm = int(np.asarray(sys.tracker.st.lm_mask).sum())
    assert n_ok >= 0.85 * n_frames, f"only {n_ok}/{n_frames} frames tracked"
    assert n_kf >= 5 and n_lm >= 1000, (n_kf, n_lm)
    print(f"tracked {n_ok}/{n_frames} frames, {n_kf} keyframes, "
          f"{n_lm} landmarks", file=_sys.stderr)

    print(json.dumps({
        "metric": "tracking_fps_image_rgbd_640x480_sp1024",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
