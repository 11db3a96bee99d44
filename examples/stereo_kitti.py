#!/usr/bin/env python
"""KITTI odometry stereo runner (reference:
Examples/Stereo/stereo_kitti.cc — image_0/image_1 pairs at times.txt rate,
System::TrackStereo, KITTI-format trajectory saver src/System.cc:1216).
KITTI ships RECTIFIED stereo, so frames go straight to the stereo
frontend."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dani_slam_tpu.utils import verbose
    verbose.set_verbosity(verbose.NORMAL)
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence", help="KITTI sequence dir (image_0/ image_1/"
                                     " times.txt)")
    ap.add_argument("--out-prefix", default="")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from dani_slam_tpu.core import config as cfg
    from dani_slam_tpu.core import state as mstate
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import io as io_utils
    from dani_slam_tpu.utils.native import ImagePrefetcher

    settings = cfg.Settings.from_yaml(args.settings)
    verbose.print_mess(str(settings))
    cam = settings.camera()
    sys_ = System(cam, Sensor.STEREO,
                  caps=mstate.MapCaps(N=settings.n_features),
                  n_features=settings.n_features, pipelined=True)

    frames = io_utils.load_kitti_stereo_list(args.sequence)
    if args.max_frames:
        frames = frames[:args.max_frames]
    left_pf = ImagePrefetcher([l for _, l, _ in frames])
    right_pf = ImagePrefetcher([r for _, _, r in frames])
    for i, (ts, _, _) in enumerate(frames):
        state, R, t = sys_.track_stereo(left_pf.get(i), right_pf.get(i),
                                        ts, settings.baseline)
        if i % 50 == 0:
            print(f"[{i}/{len(frames)}] {state} kf={sys_.n_keyframes()}")
    sys_.shutdown()
    io_utils.save_trajectory_kitti(
        args.out_prefix + "CameraTrajectory.txt", sys_.tracker.trajectory)


if __name__ == "__main__":
    main()
