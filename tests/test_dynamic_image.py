"""Image-driven dynamic-scene e2e — the flagship DANI-SLAM behavior with NO
oracle boxes: images go through the trained detector
(Detector.dynamic_mask_inputs), keypoints inside detected movable-object
boxes are suppressed, and tracking accuracy is preserved.

Reference chain: YOLO detect (src/YoloDetect.cpp:27) -> dynamic-area keypoint
deletion (src/SPextractor.cpp:314-352) -> keyframe veto at ratio > 0.8
(src/Tracking.cc:3252-3280). Round-1 review: the previous e2e fed oracle
boxes; this one is image-in end to end.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from dani_slam_tpu.core import cameras, lie, state as mstate
from dani_slam_tpu.models import superpoint as sp_mod
from dani_slam_tpu.models import yolo as yolo_mod
from dani_slam_tpu.utils import eval as ev
from dani_slam_tpu.utils import synthetic

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'

CAM = cameras.Camera.pinhole(300.0, 300.0, 160.0, 120.0, 320, 240)
CAPS = mstate.MapCaps(K=32, L=4096, N=256, D=256)

DETECTOR = yolo_mod.load_default_detector()
SP = sp_mod.load_default_params()


def _stamp_blobs(img, cx, cy, amps, offsets, spot=1.5):
    """Stamp fixed-pattern gaussian blobs around (cx, cy) on all channels."""
    H, W = img.shape[:2]
    yy, xx = np.mgrid[0:H, 0:W]
    for (ox, oy), a in zip(offsets, amps):
        u, v = cx + ox, cy + oy
        if not (3 < u < W - 4 and 3 < v < H - 4):
            continue
        du, dv = xx - u, yy - v
        m = (np.abs(du) < 5) & (np.abs(dv) < 5)
        g = a * np.exp(-(du ** 2 + dv ** 2) / (2 * spot ** 2))
        img[m] = np.maximum(img[m], (40 + g[m])[:, None] *
                            np.ones((1, img.shape[2])))
    return img


def render_dynamic_rgb(static_pts, static_bright, R_cw, t_cw, obj_xyz_w,
                       obj_wh_m, obj_offsets, obj_amps, seed=0):
    """Static corner world + a warm-tinted movable object (the detector's
    training appearance, models/yolo_train.py) -> (rgb uint8, depth uint16,
    gt box or None)."""
    gray, depth_enc = synthetic.render_image_depth(
        static_pts, static_bright, CAM, R_cw, t_cw, seed=seed)
    img = np.repeat(gray[..., None], 3, axis=-1).astype(np.float32)
    # project the object center; stamp a warm textured rectangle
    pc = np.asarray(lie.se3_apply(R_cw, t_cw, jnp.asarray(obj_xyz_w[None])))
    box = None
    depth = depth_enc.astype(np.float32)
    if pc[0, 2] > 0.5:
        uv = np.asarray(cameras.project(CAM, jnp.asarray(pc)))[0]
        f = 300.0
        bw = obj_wh_m[0] * f / pc[0, 2]
        bh = obj_wh_m[1] * f / pc[0, 2]
        x1, y1 = uv[0] - bw / 2, uv[1] - bh / 2
        x2, y2 = uv[0] + bw / 2, uv[1] + bh / 2
        xi1, yi1 = max(int(x1), 0), max(int(y1), 0)
        xi2, yi2 = min(int(x2), 320), min(int(y2), 240)
        if xi2 - xi1 > 8 and yi2 - yi1 > 8:
            tint = np.asarray([1.0, 0.55, 0.45]) * 0.55 * 255
            img[yi1:yi2, xi1:xi2] = tint
            # fixed blob pattern moves WITH the object (coherent texture —
            # the SLAM-poisoning case)
            sx = bw / 100.0
            offs = [(ox * sx, oy * sx) for ox, oy in obj_offsets]
            img = _stamp_blobs(img, uv[0], uv[1], obj_amps, offs)
            depth[yi1:yi2, xi1:xi2] = pc[0, 2] * 5000.0
            box = (x1, y1, x2, y2)
    return (np.clip(img, 0, 255).astype(np.uint8),
            depth.astype(np.uint16), box)


def _frustum_points(rng, R0, t0, n, z_rng=(4.0, 9.0), margin=20):
    """World points sampled inside camera-0's frustum at depths within the
    uint16 range of depth_factor=5000 (13.1 m — beyond-range depth encodes
    as invalid, utils/synthetic.render_image_depth)."""
    u = rng.uniform(margin, 320 - margin, n)
    v = rng.uniform(margin, 240 - margin, n)
    z = rng.uniform(*z_rng, n)
    rays = np.stack([(u - 160.0) / 300.0, (v - 120.0) / 300.0,
                     np.ones(n)], 1)
    pc = rays * z[:, None]
    R0, t0 = np.asarray(R0), np.asarray(t0)
    return ((R0.T @ (pc - t0).T).T).astype(np.float32)


def run_sequence(use_detector: bool, n_frames=16):
    from dani_slam_tpu.slam.system import Sensor, System
    rng = np.random.RandomState(7)
    R_gt0, t_gt0 = synthetic.orbit_trajectory(1, radius=10.0,
                                              angle_span=0.0)
    pts = _frustum_points(rng, R_gt0[0], t_gt0[0], 500)
    bright = rng.uniform(120, 215, 500).astype(np.float32)
    # the object must DOMINATE the keypoint budget for the unmasked run to
    # be poisoned (robust Huber shrugs off a handful of moving points):
    # ~60 textured blobs on a 3.2x2.4 m board at ~3.5 m fills most of the
    # view and out-votes the static background
    obj_off = [(rng.uniform(-48, 48), rng.uniform(-33, 33))
               for _ in range(60)]
    obj_amp = [rng.uniform(150, 215) for _ in range(60)]
    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                            angle_span=0.35)
    det = DETECTOR if use_detector else None
    sys = System(CAM, Sensor.RGBD, caps=CAPS, sp_params=SP, n_features=256,
                 enable_loop_closing=False, enable_relocalization=False,
                 detector=det)
    for i in range(n_frames):
        # camera center ~ [10,0,0]-ish orbit; object placed in front,
        # moving laterally ~0.25 m/frame
        C0 = -np.asarray(R_gt[0]).T @ np.asarray(t_gt[0])
        fwd = np.asarray(R_gt[0]).T @ np.asarray([0.0, 0.0, 1.0])
        side = np.asarray(R_gt[0]).T @ np.asarray([1.0, 0.0, 0.0])
        obj = C0 + fwd * 3.5 + side * (-1.4 + 0.22 * i)
        img, dep, _ = render_dynamic_rgb(pts, bright, R_gt[i], t_gt[i],
                                         obj.astype(np.float32),
                                         (3.2, 2.4), obj_off, obj_amp,
                                         seed=i)
        sys.track_rgbd(jnp.asarray(img), jnp.asarray(dep), i / 30.0)
    traj = sys.tracker.trajectory
    est = ev.centers_from_tcw(np.stack([p[1] for p in traj]),
                              np.stack([p[2] for p in traj]))
    idx = (np.asarray([p[0] for p in traj]) * 30).round().astype(int)
    gt = ev.centers_from_tcw(np.asarray(R_gt)[idx], np.asarray(t_gt)[idx])
    return ev.ate_rmse(est, gt, with_scale=False)


@pytest.mark.skipif(DETECTOR is None or SP is None,
                    reason="shipped detector/superpoint weights required")
class TestDynamicImage:
    def test_detector_finds_moving_object(self):
        """The trained detector must localize the warm object (IoU >= 0.4)
        in a fresh scene."""
        rng = np.random.RandomState(11)
        pts = rng.uniform(-5, 5, (400, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(5.0, 10.0, 400)
        bright = rng.uniform(120, 215, 400).astype(np.float32)
        obj_off = [(rng.uniform(-45, 45), rng.uniform(-30, 30))
                   for _ in range(12)]
        obj_amp = [rng.uniform(150, 215) for _ in range(12)]
        R0 = jnp.eye(3)
        t0 = jnp.zeros(3)
        img, dep, box = render_dynamic_rgb(
            pts, bright, R0, t0, np.asarray([0.0, 0.0, 4.0], np.float32),
            (2.2, 1.6), obj_off, obj_amp)
        assert box is not None
        b, ok, ratio = DETECTOR.dynamic_mask_inputs(jnp.asarray(img))
        b = np.asarray(b)[np.asarray(ok)]
        assert len(b) >= 1, "no dynamic detection"
        iou = np.asarray(yolo_mod.box_iou(jnp.asarray(b, jnp.float32),
                                          jnp.asarray([box], jnp.float32)))
        assert iou.max() >= 0.4, f"best IoU {iou.max():.2f}"

    def test_image_masking_improves_accuracy(self):
        ate_masked = run_sequence(use_detector=True)
        ate_unmasked = run_sequence(use_detector=False)
        # threshold has margin for build-config numerics (the 8-virtual-
        # device CPU suite compiles differently from single-device runs:
        # 0.06 there vs 0.095 here); the flagship claim is the RATIO below
        assert ate_masked < 0.12, f"masked ATE {ate_masked:.3f}"
        assert ate_masked < ate_unmasked * 0.7, (
            f"masking did not help: {ate_masked:.3f} vs {ate_unmasked:.3f}")
