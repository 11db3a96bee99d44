#!/usr/bin/env python
"""TUM monocular runner (reference: Examples/Monocular/mono_tum.cc)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dani_slam_tpu.utils import verbose
    verbose.set_verbosity(verbose.NORMAL)
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--out-prefix", default="")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args()

    from dani_slam_tpu.core import config as cfg
    from dani_slam_tpu.core import state as mstate
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import io as io_utils

    settings = cfg.Settings.from_yaml(args.settings)
    verbose.print_mess(str(settings))
    sys_ = System(settings.camera(), Sensor.MONOCULAR,
                  caps=mstate.MapCaps(N=settings.n_features),
                  n_features=settings.n_features, pipelined=True,
                  n_levels=settings.n_levels,
                  scale_factor=settings.scale_factor)

    frames = io_utils.load_tum_rgb_list(args.sequence)
    if args.max_frames:
        frames = frames[:args.max_frames]
    # rebase to sequence-relative time: epoch-scale stamps quantize in
    # device float32 (ulp ~128 s at 1.4e9 s); savers restore t0
    t0 = frames[0][0] if frames else 0.0
    frames = [(ts - t0, r) for (ts, r) in frames]
    from dani_slam_tpu.utils.native import ImagePrefetcher
    pf = ImagePrefetcher([f"{args.sequence}/{r}" for _, r in frames])
    for i, (ts, rel) in enumerate(frames):
        img = pf.get(i)
        state, R, t = sys_.track_monocular(img, ts)
        if i % 50 == 0:
            print(f"[{i}/{len(frames)}] {state} kf={sys_.n_keyframes()}")
    sys_.shutdown()
    io_utils.save_trajectory_tum(args.out_prefix + "CameraTrajectory.txt",
                                 sys_.tracker.trajectory, time_offset=t0)


if __name__ == "__main__":
    main()
