#!/usr/bin/env python
"""A/B the FRAME-side throughput deviations on the image-in path.

Map-side knobs (aux cadence, LBA budget) are A/B'd by
tools/ab_throughput_knobs.py at feature-level input; this sibling isolates
the two frame-side deviations from the reference's tracking loop on the
SAME image-in workload as bench.py (SuperPoint frontend + detector-free
RGB-D pipeline):

  * seed_rounds — the motion-model SEED solve runs 2 LM rounds in
    production (it only seeds track_local_map's full 4-round solve);
    the reference runs the full 4x10-iteration PoseOptimization there
    (src/Optimizer.cc:814-1110).
  * pipelined — production defers the lost/keyframe decision by one frame
    (optimistic update + rollback snapshot) so the host never blocks on
    the in-flight frame program; the reference decides synchronously
    inside Track() (src/Tracking.cc:2038-2124).

Runs all four combinations on one rendered sequence and prints ATE RMSE +
tracked/keyframe/landmark counts. Accuracy is the question (wall-clock is
bench.py's); CPU or TPU both fine:

    python tools/ab_frame_knobs.py            # device = whatever JAX finds
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_sequence(n_frames: int = 120, seed: int = 0):
    import jax
    import jax.numpy as jnp
    from dani_slam_tpu.core import cameras
    from dani_slam_tpu.utils import synthetic

    cam = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
    # twice the bench's span at the same angular rate (120 frames / 4 s)
    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                            angle_span=0.7)
    # object sweeps across and back so it stays in frame the whole run
    side = lambda i: -1.8 + 0.07 * (i if i < 60 else 120 - i)  # noqa: E731
    imgs, deps, times = synthetic.make_rgbd_image_sequence(
        cam, R_gt, t_gt, seed=seed, obj_side_fn=side)
    imgs = [jax.device_put(jnp.asarray(x)) for x in imgs]
    deps = [jax.device_put(jnp.asarray(x)) for x in deps]
    tdev = [jax.device_put(jnp.asarray(t, jnp.float32)) for t in times]
    return cam, (R_gt, t_gt), imgs, deps, times, tdev


def run(cam, gt, imgs, deps, times, tdev, pipelined: bool,
        seed_rounds: int):
    import jax
    import numpy as np
    from dani_slam_tpu.core import state as mstate
    from dani_slam_tpu.models import superpoint as sp_mod
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import eval as ev

    sp_params = sp_mod.load_default_params()
    assert sp_params is not None, "shipped SuperPoint weights missing"
    sys_ = System(cam, Sensor.RGBD, caps=mstate.MapCaps(),
                  sp_params=sp_params, n_features=1024, pipelined=pipelined)
    sys_.sp_threshold = 0.012
    sys_.tracker.seed_rounds = seed_rounds
    n_ok = 0
    for i in range(len(imgs)):
        s, R, t = sys_.track_rgbd(imgs[i], deps[i], times[i],
                                  time_dev=tdev[i])
        n_ok += s == "OK"
    sys_.shutdown()
    R_gt, t_gt = gt
    est_t, gt_t = [], []
    for (tm, R_cw, t_cw) in sys_.tracker.trajectory:
        i = int(round(tm * 30.0))
        if 0 <= i < len(imgs):
            est_t.append(-np.asarray(R_cw).T @ np.asarray(t_cw))
            Rg, tg = np.asarray(R_gt[i]), np.asarray(t_gt[i])
            gt_t.append(-Rg.T @ tg)
    rmse = ev.ate_rmse(np.asarray(est_t), np.asarray(gt_t))
    return {"pipelined": pipelined, "seed_rounds": seed_rounds,
            "ate_rmse_m": float(rmse), "ok": n_ok, "frames": len(imgs),
            "kfs": sys_.n_keyframes(), "lms": sys_.n_landmarks()}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/dani_slam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    seq = build_sequence()
    rows = []
    for pipelined, rounds in ((True, 2), (True, 4), (False, 2), (False, 4)):
        r = run(*seq, pipelined=pipelined, seed_rounds=rounds)
        rows.append(r)
        tag = ("production" if (pipelined and rounds == 2) else
               "faithful  " if (not pipelined and rounds == 4) else
               f"pipe={int(pipelined)},r={rounds}")
        print(f"{tag:>14}: ATE {r['ate_rmse_m']*100:.2f} cm, "
              f"{r['ok']}/{r['frames']} OK, {r['kfs']} KFs, "
              f"{r['lms']} landmarks", flush=True)
    prod = rows[0]["ate_rmse_m"]
    faith = rows[-1]["ate_rmse_m"]
    rel = (prod - faith) / max(faith, 1e-9)
    print(f"production vs faithful ATE delta: {rel*100:+.1f}%")


if __name__ == "__main__":
    main()
