#!/usr/bin/env python
"""TUM RGB-D sequence runner (reference: Examples/RGB-D/rgbd_tum.cc —
loads an association file, feeds System::TrackRGBD per frame at dataset
rate, saves CameraTrajectory.txt / KeyFrameTrajectory.txt on shutdown).

Usage:
  python examples/rgbd_tum.py SETTINGS.yaml SEQUENCE_DIR ASSOCIATIONS.txt \
      [--out-prefix OUT] [--max-frames N] [--viz]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import numpy as np


def main():
    from dani_slam_tpu.utils import verbose
    verbose.set_verbosity(verbose.NORMAL)
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("associations")
    ap.add_argument("--out-prefix", default="")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--viz", action="store_true")
    ap.add_argument("--detector", action="store_true",
                    help="enable YOLO dynamic masking")
    ap.add_argument("--superpoint-pt", default="",
                    help="official MagicLeap superpoint_v1.pth checkpoint "
                    "(reference loads it at src/SPextractor.cpp:86); "
                    "converted via models/superpoint.load_magicleap_pt")
    ap.add_argument("--lightglue-pt", default="",
                    help="official cvg/LightGlue checkpoint (TorchScript "
                    "archive or state dict; reference src/LightGlue.cpp:9); "
                    "converted via models/lightglue_official.load_lightglue_pt")
    ap.add_argument("--yolov5-pt", default="",
                    help="official yolov5s checkpoint (reference "
                    "src/YoloDetect.cpp:9); converted via "
                    "models/yolo_official.load_yolov5_pt — implies --detector")
    ap.add_argument("--time-stats", action="store_true",
                    help="per-stage device timing pass (reference "
                    "REGISTER_TIMES): writes TrackingTimeStats.txt / "
                    "LocalMapTimeStats.txt / ExecMean.txt with the "
                    "decomposed stage costs")
    args = ap.parse_args()

    import jax
    from dani_slam_tpu.core import config as cfg
    from dani_slam_tpu.core import state as mstate
    from dani_slam_tpu.slam.system import Sensor, System
    from dani_slam_tpu.utils import io as io_utils, timing

    settings = cfg.Settings.from_yaml(args.settings)
    verbose.print_mess(str(settings))
    cam = settings.camera()
    detector = None
    if args.yolov5_pt:
        from dani_slam_tpu.models.yolo_official import load_yolov5_pt
        detector = load_yolov5_pt(args.yolov5_pt)
    elif args.detector:
        from dani_slam_tpu.models.yolo import Detector
        detector = Detector()
    sp_params = None
    if args.superpoint_pt:
        from dani_slam_tpu.models.superpoint import load_magicleap_pt
        sp_params = load_magicleap_pt(args.superpoint_pt)
    matcher = "auto"
    if args.lightglue_pt:
        from dani_slam_tpu.models.lightglue_official import load_lightglue_pt
        matcher = load_lightglue_pt(args.lightglue_pt, cam.width, cam.height)

    # close/far point threshold in meters (reference mThDepth =
    # bf * ThDepth / fx, src/Tracking.cc:1179); gates close-point-only
    # keyframe-culling counting when the settings carry a baseline
    close_depth = (settings.baseline * settings.th_depth
                   if settings.baseline else None)
    sys_ = System(cam, Sensor.RGBD,
                  caps=mstate.MapCaps(N=settings.n_features),
                  n_features=settings.n_features, detector=detector,
                  sp_params=sp_params, matcher=matcher,
                  close_depth=close_depth,
                  pipelined=True)

    assoc = io_utils.load_tum_associations(args.associations)
    if args.max_frames:
        assoc = assoc[:args.max_frames]
    # rebase to sequence-relative time: epoch-scale stamps quantize in
    # device float32 (ulp ~128 s at 1.4e9 s); savers restore t0
    t0 = assoc[0][0] if assoc else 0.0
    assoc = [(ta - t0, a, tb - t0, b) for (ta, a, tb, b) in assoc]
    timer = timing.StageTimer()

    # native threaded read-ahead: decode overlaps device compute
    # (utils/native.ImagePrefetcher; falls back to sync load_image)
    from dani_slam_tpu.utils.native import ImagePrefetcher
    rgb_pf = ImagePrefetcher([f"{args.sequence}/{a[1]}" for a in assoc])
    dep_pf = ImagePrefetcher([f"{args.sequence}/{a[3]}" for a in assoc])
    for i, (t_rgb, rgb_rel, _, depth_rel) in enumerate(assoc):
        rgb = rgb_pf.get(i)
        depth = dep_pf.get(i)
        with timer.stage("track"):
            state, R, t = sys_.track_rgbd(rgb, depth, t_rgb,
                                          settings.depth_map_factor)
        if i % 50 == 0:
            print(f"[{i}/{len(assoc)}] {state} kf={sys_.n_keyframes()} "
                  f"lm={sys_.n_landmarks()}")

    sys_.shutdown()
    pre = args.out_prefix
    io_utils.save_trajectory_tum(pre + "CameraTrajectory.txt",
                                 sys_.tracker.trajectory, time_offset=t0)
    if args.time_stats:
        import jax.numpy as jnp
        from dani_slam_tpu.utils import stage_profile
        n = min(len(assoc), 30)
        imgs = [jnp.asarray(rgb_pf.get(i)) for i in range(n)]
        deps = [jnp.asarray(dep_pf.get(i)) for i in range(n)]
        tdevs = [jnp.asarray(assoc[i][0], jnp.float32) for i in range(n)]
        prof_sys = System(cam, Sensor.RGBD,
                          caps=mstate.MapCaps(N=settings.n_features),
                          n_features=settings.n_features,
                          detector=detector, sp_params=sp_params,
                          matcher=matcher, pipelined=True)
        tt, mt = stage_profile.profile_rgbd_stages(prof_sys, imgs, deps,
                                                   tdevs)
        stage_profile.save_stats(tt, mt, prefix=pre)
    else:
        timer.save_means(pre + "ExecMean.txt")
        timer.save_csv(pre + "TrackingTimeStats.txt")
    s = timer.summary().get("track", {})
    print(f"done: {len(assoc)} frames, mean track "
          f"{s.get('mean_ms', 0):.1f} ms "
          f"({1000.0 / max(s.get('mean_ms', 1), 1e-9):.1f} FPS)")
    if args.viz:
        from dani_slam_tpu.utils.viewer import draw_map
        draw_map(sys_.map_state, sys_.tracker.trajectory, path=pre + "map.png")
        print(f"map rendered to {pre}map.png")


if __name__ == "__main__":
    main()
