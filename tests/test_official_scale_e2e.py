"""Reference-scale learned modules INSIDE the SLAM loop.

The reference's production nets are the official LightGlue (256-dim, 9
layers — src/LightGlue.cpp:9) and yolov5s (depth 0.33 / width 0.50 —
src/YoloDetect.cpp:9). The compact production nets (models/lightglue.py
128/6, models/yolo.py width-32) are throughput-tuned stand-ins; this e2e
runs the FAITHFUL official architectures (models/lightglue_official.py,
models/yolo_official.py) with synthetic-trained weights through a full
image-in dynamic-scene sequence, proving the official sizes work end to
end — the honest basis for the bench's reference-scale FPS metric.

Skips when the official-scale weights have not been trained
(`python -m dani_slam_tpu.models.lightglue_train --official` /
`yolo_train --official` produce them).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from dani_slam_tpu.core import cameras, state as mstate
from dani_slam_tpu.models import superpoint as sp_mod
from dani_slam_tpu.models.lightglue_official import (LightGlueOfficial,
                                                     load_official_matcher)
from dani_slam_tpu.models.yolo_official import (YoloV5Net,
                                                load_official_detector)
from dani_slam_tpu.utils import eval as ev
from dani_slam_tpu.utils import synthetic

from tests.test_dynamic_image import _frustum_points, render_dynamic_rgb

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'

CAM = cameras.Camera.pinhole(300.0, 300.0, 160.0, 120.0, 320, 240)
CAPS = mstate.MapCaps(K=32, L=4096, N=256, D=256)

SP = sp_mod.load_default_params()
MATCHER = load_official_matcher(CAM.width, CAM.height)
DETECTOR = load_official_detector()


@pytest.mark.skipif(MATCHER is None or DETECTOR is None or SP is None,
                    reason="official-scale weights not trained "
                    "(models/*_train.py --official)")
class TestOfficialScaleE2E:
    def test_architectures_are_reference_scale(self):
        """Guard: the loaded modules ARE the official sizes (this test is
        pointless if the loaders ever fall back to the compact nets)."""
        assert isinstance(MATCHER.model, LightGlueOfficial)
        assert MATCHER.model.dim == 256 and MATCHER.model.depth == 9
        assert isinstance(DETECTOR.model, YoloV5Net)
        assert DETECTOR.model.width_multiple == 0.50
        assert DETECTOR.model.num_classes == 80

    def test_official_detector_finds_moving_object(self):
        rng = np.random.RandomState(11)
        pts = rng.uniform(-5, 5, (400, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(5.0, 10.0, 400)
        bright = rng.uniform(120, 215, 400).astype(np.float32)
        obj_off = [(rng.uniform(-45, 45), rng.uniform(-30, 30))
                   for _ in range(12)]
        obj_amp = [rng.uniform(150, 215) for _ in range(12)]
        img, dep, box = render_dynamic_rgb(
            pts, bright, jnp.eye(3), jnp.zeros(3),
            np.asarray([0.0, 0.0, 4.0], np.float32),
            (2.2, 1.6), obj_off, obj_amp)
        assert box is not None
        from dani_slam_tpu.models import yolo as yolo_mod
        b, ok, ratio = DETECTOR.dynamic_mask_inputs(jnp.asarray(img))
        b = np.asarray(b)[np.asarray(ok)]
        assert len(b) >= 1, "no dynamic detection"
        iou = np.asarray(yolo_mod.box_iou(jnp.asarray(b, jnp.float32),
                                          jnp.asarray([box], jnp.float32)))
        assert iou.max() >= 0.4, f"best IoU {iou.max():.2f}"

    def test_official_models_track_sequence(self):
        """Full image-in dynamic sequence with BOTH official nets in the
        loop: official LightGlue as the System matcher (triangulation /
        ref-KF / reloc paths) + yolov5s dynamic masking. Must track to
        completion with bounded ATE."""
        from dani_slam_tpu.slam.system import Sensor, System
        rng = np.random.RandomState(7)
        n_frames = 16
        R_gt0, t_gt0 = synthetic.orbit_trajectory(1, radius=10.0,
                                                  angle_span=0.0)
        pts = _frustum_points(rng, R_gt0[0], t_gt0[0], 500)
        bright = rng.uniform(120, 215, 500).astype(np.float32)
        obj_off = [(rng.uniform(-48, 48), rng.uniform(-33, 33))
                   for _ in range(60)]
        obj_amp = [rng.uniform(150, 215) for _ in range(60)]
        R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                                angle_span=0.35)
        sys = System(CAM, Sensor.RGBD, caps=CAPS, sp_params=SP,
                     n_features=256, enable_loop_closing=False,
                     enable_relocalization=False, detector=DETECTOR,
                     matcher=MATCHER)
        n_ok = 0
        for i in range(n_frames):
            C0 = -np.asarray(R_gt[0]).T @ np.asarray(t_gt[0])
            fwd = np.asarray(R_gt[0]).T @ np.asarray([0.0, 0.0, 1.0])
            side = np.asarray(R_gt[0]).T @ np.asarray([1.0, 0.0, 0.0])
            obj = C0 + fwd * 3.5 + side * (-1.4 + 0.22 * i)
            img, dep, _ = render_dynamic_rgb(pts, bright, R_gt[i], t_gt[i],
                                             obj.astype(np.float32),
                                             (3.2, 2.4), obj_off, obj_amp,
                                             seed=i)
            state, _, _ = sys.track_rgbd(jnp.asarray(img), jnp.asarray(dep),
                                         i / 30.0)
            n_ok += state == "OK"
        assert n_ok >= n_frames - 2, f"tracked only {n_ok}/{n_frames}"
        n_lm = int(np.asarray(sys.tracker.st.lm_mask).sum())
        assert n_lm >= 200, f"official matcher triangulated {n_lm} landmarks"
        traj = sys.tracker.trajectory
        est = ev.centers_from_tcw(np.stack([p[1] for p in traj]),
                                  np.stack([p[2] for p in traj]))
        idx = (np.asarray([p[0] for p in traj]) * 30).round().astype(int)
        gt = ev.centers_from_tcw(np.asarray(R_gt)[idx],
                                 np.asarray(t_gt)[idx])
        ate = ev.ate_rmse(est, gt, with_scale=False)
        assert ate < 0.12, f"official-scale ATE {ate:.3f}"
