"""Benchmark: end-to-end tracking FPS on a synthetic sequence (real device).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.json north-star): >= 60 FPS end-to-end tracking on one
v5e chip; vs_baseline = measured_fps / 60.
"""
from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    # persistent compile cache: repeated bench runs (and driver re-runs)
    # skip the expensive first-compile entirely
    jax.config.update("jax_compilation_cache_dir", "/tmp/dani_slam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from dani_slam_tpu.core import cameras, state as mstate
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import synthetic

    cam = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
    caps = mstate.MapCaps(K=64, L=8192, N=512, D=64)
    n_frames = 60
    world = synthetic.make_world(1500, desc_dim=64, seed=0)
    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                            angle_span=0.8)
    feats = []
    for i in range(n_frames):
        f, _ = synthetic.render_frame(world, cam, R_gt[i], t_gt[i], n_max=512,
                                      noise_px=0.3, seed=i, with_depth=True,
                                      time=i / 30.0)
        feats.append(jax.device_put(f))

    # warmup pass: run the FULL sequence once so every program variant
    # (init, track has_vel on/off, keyframe step with/without BA) compiles
    sys = System(cam, Sensor.RGBD, caps=caps, n_features=512,
                 pipelined=True)
    for i in range(n_frames):
        sys.track_features(feats[i])
    jax.block_until_ready(sys.tracker.st.kf_R)

    # timed pass on a fresh system (all programs cached)
    sys = System(cam, Sensor.RGBD, caps=caps, n_features=512,
                 pipelined=True)
    sys.tracker.pipeline_depth = 3     # extra slack for transport jitter
    t0 = time.perf_counter()
    for i in range(n_frames):
        sys.track_features(feats[i])
    sys.shutdown()
    jax.block_until_ready(sys.tracker.st.kf_R)
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    print(json.dumps({
        "metric": "tracking_fps_synthetic_rgbd",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
