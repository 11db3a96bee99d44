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
    rng = np.random.RandomState(0)
    pts = rng.uniform(-6, 6, (2500, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(4.0, 12.0, 2500)
    bright = rng.uniform(120, 215, 2500).astype(np.float32)
    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                            angle_span=0.8)
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

    def run_sequence(sys):
        for i in range(n_frames):
            feat = frame_mod._frame_rgbd_program(
                sp_params, imgs[i], deps[i], cam, times[i], dfac, thr,
                nobox[0], nobox[1], n_max=n_feat, use_boxes=False)
            sys.track_features(feat)
        sys.shutdown()
        jax.block_until_ready(sys.tracker.st.kf_R)

    # warmup pass: run the FULL sequence once so every program variant
    # (frontend, init, track has_vel on/off, keyframe step with/without BA)
    # compiles
    sys = System(cam, Sensor.RGBD, caps=caps, sp_params=sp_params,
                 n_features=n_feat, pipelined=True)
    run_sequence(sys)

    # timed pass on a fresh system (all programs cached)
    sys = System(cam, Sensor.RGBD, caps=caps, sp_params=sp_params,
                 n_features=n_feat, pipelined=True)
    sys.tracker.pipeline_depth = 3     # extra slack for transport jitter
    t0 = time.perf_counter()
    run_sequence(sys)
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    print(json.dumps({
        "metric": "tracking_fps_image_rgbd_640x480_sp1024",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
