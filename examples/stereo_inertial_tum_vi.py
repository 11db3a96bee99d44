#!/usr/bin/env python
"""TUM-VI stereo-inertial fisheye runner (reference:
Examples/Stereo-Inertial/stereo_inertial_tum_vi.cc — unrectified KB8
fisheye pair + IMU; the stereo-fisheye Frame ctor triangulates metric depth
from lapping-area matches instead of rectifying, src/Frame.cc:968-1101).

Dataset layout: EuRoC/TUM-VI mav0 format (mav0/cam0/data + data.csv,
mav0/cam1/..., mav0/imu0/data.csv).

Usage:
  python examples/stereo_inertial_tum_vi.py SETTINGS.yaml SEQUENCE_DIR \
      [--out-prefix OUT] [--max-frames N] [--no-imu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dani_slam_tpu.utils import verbose
    verbose.set_verbosity(verbose.NORMAL)
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--out-prefix", default="")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--no-imu", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    from dani_slam_tpu.core import config as cfg
    from dani_slam_tpu.core import state as mstate
    from dani_slam_tpu.slam import frame as frame_mod, inertial as inert
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import io as io_utils

    settings = cfg.Settings.from_yaml(args.settings)
    verbose.print_mess(str(settings))
    cam_l = settings.camera()
    cam_r = settings.camera2()
    assert cam_r is not None and settings.stereo_t_c1_c2 is not None, \
        "TUM-VI configs need Camera2.* and Stereo.T_c1_c2"
    # T_c1_c2 maps cam2 coords into cam1; the fisheye depth wants
    # right-from-left: x_r = R_rl x_l + t_rl
    T12 = np.asarray(settings.stereo_t_c1_c2, np.float64).reshape(4, 4)
    R_rl = jnp.asarray(T12[:3, :3].T, jnp.float32)
    t_rl = jnp.asarray(-T12[:3, :3].T @ T12[:3, 3], jnp.float32)

    sensor = Sensor.STEREO if args.no_imu else Sensor.IMU_STEREO
    sys_ = System(cam_l, sensor,
                  caps=mstate.MapCaps(N=settings.n_features),
                  n_features=settings.n_features, pipelined=True,
                  imu_calib=settings.imu_calib())

    left = io_utils.load_euroc_cam_list(args.sequence, "cam0")
    right = io_utils.load_euroc_cam_list(args.sequence, "cam1")
    imu_t, imu_w, imu_a = (None, None, None)
    if not args.no_imu:
        imu_t, imu_w, imu_a = io_utils.load_euroc_imu(args.sequence)
    if args.max_frames:
        left = left[:args.max_frames]
    # rebase to sequence-relative time: epoch-scale stamps quantize in
    # device float32 (ulp ~128 s at 1.4e9 s); savers restore t0
    t0 = left[0][0] if left else 0.0
    left = [(ts - t0, p) for (ts, p) in left]
    right = [(ts - t0, p) for (ts, p) in right]
    if imu_t is not None:
        imu_t = imu_t - t0

    from dani_slam_tpu.utils.native import ImagePrefetcher
    left_pf = ImagePrefetcher([p for _, p in left])
    right_pf = ImagePrefetcher([p for _, p in right])
    prev_t = None
    for i, (ts, lpath) in enumerate(left):
        img_l = left_pf.get(i)
        img_r = right_pf.get(i) if i < len(right) else img_l
        feat = frame_mod.build_frame_stereo_fisheye(
            sys_._sp(), jnp.asarray(img_l), jnp.asarray(img_r),
            cam_l, cam_r, R_rl, t_rl, ts,
            lapping_l=settings.lapping1, lapping_r=settings.lapping2,
            n_max=sys_.n_features)
        win = None
        if imu_t is not None and prev_t is not None:
            sel = (imu_t > prev_t) & (imu_t <= ts)
            if sel.any():
                dts = np.diff(np.concatenate([[prev_t], imu_t[sel]]))
                win = inert.make_window(imu_w[sel], imu_a[sel], dts)
        state, R, t = sys_.track_features(feat, imu_window=win)
        prev_t = ts
        if i % 50 == 0:
            print(f"[{i}/{len(left)}] {state} kf={sys_.n_keyframes()} "
                  f"lm={sys_.n_landmarks()}")
    sys_.shutdown()
    io_utils.save_trajectory_euroc(args.out_prefix + "CameraTrajectory.txt",
                                   sys_.tracker.trajectory, time_offset=t0)
    print(f"done: {len(left)} frames -> "
          f"{args.out_prefix}CameraTrajectory.txt")


if __name__ == "__main__":
    main()
