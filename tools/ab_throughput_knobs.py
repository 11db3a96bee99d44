#!/usr/bin/env python
"""A/B the throughput-driven deviations from the reference's settings.

Production knobs (the bench configuration): fuse/cull maintenance every
SECOND keyframe (aux_every=2), LBA budget 5 iterations truncating to 3
under keyframe pressure (the InterruptBA analogue). Reference-faithful
knobs: maintenance at every keyframe (SearchInNeighbors + culling run per
LocalMapping cycle, src/LocalMapping.cc:85-107) and a 5+10-iteration LBA
(src/Optimizer.cc:1350-1365) with no pressure truncation.

Runs both on the same synthetic long RGB-D sequence (feature-level input —
this isolates the MAP-side knobs from the frontend) and prints ATE RMSE +
keyframe/landmark counts. Usage:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/ab_throughput_knobs.py

(CPU is fine: the question is trajectory accuracy, not wall-clock.)
The tracking seed solve's 2-round shortcut is not A/B'd here: it only
seeds track_local_map's full 4-round solve inside the same frame, so its
effect is bounded by the final solve's convergence, not accumulated.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(knobs: str, n_frames: int = 200, seed: int = 0):
    import jax.numpy as jnp  # noqa: F401
    from dani_slam_tpu.core import cameras, state as mstate
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import eval as ev, synthetic

    cam = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
    caps = mstate.MapCaps(K=64, L=8192, N=512, D=64)
    world = synthetic.make_world(2500, desc_dim=64, seed=seed)
    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                            angle_span=1.6)
    sys_ = System(cam, Sensor.RGBD, caps=caps, n_features=512, seed=seed,
                  pipelined=True)
    if knobs == "production":
        pass                                   # constructor defaults
    elif knobs == "faithful":
        sys_.aux_every = 1
        sys_.ba_iters = 15                     # reference: 5 + 10 more
        sys_.ba_iters_pressure = 15            # no InterruptBA truncation
    else:
        raise SystemExit(f"unknown knob set {knobs}")

    n_ok = 0
    for i in range(n_frames):
        feat, _ = synthetic.render_frame(
            world, cam, R_gt[i], t_gt[i], n_max=512, noise_px=0.4,
            seed=seed * 1000 + i, with_depth=True, time=i / 30.0)
        s, R, t = sys_.track_features(feat)
        n_ok += s == "OK"
    sys_.shutdown()

    est_t, gt_t = [], []
    for (tm, R_cw, t_cw) in sys_.tracker.trajectory:
        i = int(round(tm * 30.0))
        if 0 <= i < n_frames:
            est_t.append(-np.asarray(R_cw).T @ np.asarray(t_cw))
            Rg, tg = np.asarray(R_gt[i]), np.asarray(t_gt[i])
            gt_t.append(-Rg.T @ tg)
    rmse = ev.ate_rmse(np.asarray(est_t), np.asarray(gt_t))
    return {"knobs": knobs, "ate_rmse_m": float(rmse), "ok": n_ok,
            "frames": n_frames, "kfs": sys_.n_keyframes(),
            "lms": sys_.n_landmarks()}


def main():
    rows = [run("production"), run("faithful")]
    for r in rows:
        print(f"{r['knobs']:>10}: ATE {r['ate_rmse_m']*100:.2f} cm, "
              f"{r['ok']}/{r['frames']} OK, {r['kfs']} KFs, "
              f"{r['lms']} landmarks")
    prod, faith = rows[0]["ate_rmse_m"], rows[1]["ate_rmse_m"]
    rel = (prod - faith) / max(faith, 1e-9)
    print(f"production vs faithful ATE delta: {rel*100:+.1f}%")


if __name__ == "__main__":
    main()
