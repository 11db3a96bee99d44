#!/usr/bin/env python
"""EuRoC monocular-inertial runner (reference:
Examples/Monocular-Inertial/mono_inertial_euroc.cc — cam0 images + IMU csv,
feeds System::TrackMonocular with the IMU sample window per frame; the
inertial pipeline recovers metric scale + gravity,
src/LocalMapping.cc:1175)."""
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
    ap.add_argument("--no-imu", action="store_true",
                    help="plain monocular (no metric scale)")
    args = ap.parse_args()

    from dani_slam_tpu.core import config as cfg
    from dani_slam_tpu.core import state as mstate
    from dani_slam_tpu.slam import frame as frame_mod, inertial as inert
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import io as io_utils

    settings = cfg.Settings.from_yaml(args.settings)
    verbose.print_mess(str(settings))
    cam = settings.camera()
    sensor = Sensor.MONOCULAR if args.no_imu else Sensor.IMU_MONOCULAR
    sys_ = System(cam, sensor,
                  caps=mstate.MapCaps(N=settings.n_features),
                  n_features=settings.n_features, pipelined=False,
                  imu_calib=None if args.no_imu else settings.imu_calib())

    frames = io_utils.load_euroc_cam_list(args.sequence, "cam0")
    imu_t, imu_w, imu_a = (None, None, None)
    if not args.no_imu:
        imu_t, imu_w, imu_a = io_utils.load_euroc_imu(args.sequence)
    if args.max_frames:
        frames = frames[:args.max_frames]
    # rebase to sequence-relative time: epoch-scale stamps quantize in
    # device float32 (ulp ~128 s at 1.4e9 s); savers restore t0
    t0 = frames[0][0] if frames else 0.0
    frames = [(ts - t0, p) for (ts, p) in frames]
    if imu_t is not None:
        imu_t = imu_t - t0

    from dani_slam_tpu.utils.native import ImagePrefetcher
    pf = ImagePrefetcher([p for _, p in frames])
    prev_t = None
    for i, (ts, path) in enumerate(frames):
        img = pf.get(i)
        feat = frame_mod.build_frame_mono(sys_._sp(), img, cam, ts,
                                          n_max=sys_.n_features)
        win = None
        if imu_t is not None and prev_t is not None:
            sel = (imu_t > prev_t) & (imu_t <= ts)
            if sel.any():
                dts = np.diff(np.concatenate([[prev_t], imu_t[sel]]))
                win = inert.make_window(imu_w[sel], imu_a[sel], dts)
        state, R, t = sys_.track_features(feat, imu_window=win,
                                          timestamp=ts)
        prev_t = ts
        if i % 50 == 0:
            print(f"[{i}/{len(frames)}] {state} kf={sys_.n_keyframes()}")
    sys_.shutdown()
    io_utils.save_trajectory_euroc(args.out_prefix + "CameraTrajectory.txt",
                                   sys_.tracker.trajectory, time_offset=t0)
    io_utils.save_trajectory_tum(args.out_prefix + "CameraTrajectoryTUM.txt",
                                 sys_.tracker.trajectory, time_offset=t0)


if __name__ == "__main__":
    main()
