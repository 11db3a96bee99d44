"""YOLO detector plumbing tests: decode, NMS, box refinement, area ratio."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.models import yolo
import pytest

RNG = np.random.RandomState(31)


class TestNMS:
    def test_suppresses_overlapping_same_class(self):
        boxes = jnp.asarray([[10, 10, 50, 50], [12, 12, 52, 52],
                             [100, 100, 140, 140]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        cls = jnp.asarray([0, 0, 0])
        b, s, c, ok = yolo.nms(boxes, scores, cls)
        assert int(ok.sum()) == 2
        kept_scores = sorted(np.asarray(s)[np.asarray(ok)].tolist())
        np.testing.assert_allclose(kept_scores, [0.7, 0.9], atol=1e-5)

    def test_keeps_overlapping_different_class(self):
        boxes = jnp.asarray([[10, 10, 50, 50], [12, 12, 52, 52]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8])
        cls = jnp.asarray([0, 1])
        _, _, _, ok = yolo.nms(boxes, scores, cls)
        assert int(ok.sum()) == 2

    def test_score_threshold(self):
        boxes = jnp.asarray([[10, 10, 50, 50], [100, 100, 140, 140]],
                            jnp.float32)
        _, _, _, ok = yolo.nms(boxes, jnp.asarray([0.9, 0.2]),
                               jnp.asarray([0, 0]), score_th=0.4)
        assert int(ok.sum()) == 1


class TestIoU:
    def test_known_values(self):
        a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        b = jnp.asarray([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]],
                        jnp.float32)
        iou = np.asarray(yolo.box_iou(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 1 / 3, 0.0], atol=1e-5)


class TestRefine:
    def test_subtracts_static_box(self):
        # dynamic box with a static box covering its right half
        dyn = jnp.asarray([[0, 0, 100, 50]], jnp.float32)
        stat = jnp.asarray([[50, -10, 120, 60]], jnp.float32)
        out, ok = yolo.refine_dynamic_boxes(dyn, jnp.ones(1, bool),
                                            stat, jnp.ones(1, bool))
        np.testing.assert_allclose(np.asarray(out[0]), [0, 0, 50, 50],
                                   atol=1e-5)
        assert bool(ok[0])

    def test_non_overlapping_untouched(self):
        dyn = jnp.asarray([[0, 0, 40, 40]], jnp.float32)
        stat = jnp.asarray([[60, 60, 100, 100]], jnp.float32)
        out, ok = yolo.refine_dynamic_boxes(dyn, jnp.ones(1, bool),
                                            stat, jnp.ones(1, bool))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(dyn[0]))

    def test_inactive_static_ignored(self):
        dyn = jnp.asarray([[0, 0, 100, 50]], jnp.float32)
        stat = jnp.asarray([[50, -10, 120, 60]], jnp.float32)
        out, _ = yolo.refine_dynamic_boxes(dyn, jnp.ones(1, bool),
                                           stat, jnp.zeros(1, bool))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(dyn[0]))


class TestAreaRatio:
    def test_single_box(self):
        boxes = jnp.asarray([[0, 0, 320, 240]], jnp.float32)  # quarter
        r = yolo.dynamic_area_ratio(boxes, jnp.ones(1, bool), 640, 480)
        assert abs(float(r) - 0.25) < 0.02

    def test_union_not_double_counted(self):
        boxes = jnp.asarray([[0, 0, 320, 240], [0, 0, 320, 240]], jnp.float32)
        r = yolo.dynamic_area_ratio(boxes, jnp.ones(2, bool), 640, 480)
        assert abs(float(r) - 0.25) < 0.02

    def test_full_cover(self):
        boxes = jnp.asarray([[0, 0, 640, 480]], jnp.float32)
        r = yolo.dynamic_area_ratio(boxes, jnp.ones(1, bool), 640, 480)
        assert float(r) > 0.99


class TestDetector:
    @pytest.mark.slow
    def test_end_to_end_shapes(self):
        det = yolo.Detector(width=8, input_hw=(96, 160))
        img = jnp.asarray(RNG.randint(0, 255, (240, 320, 3)), jnp.uint8)
        b, s, c, ok = det.detect(img)
        assert b.shape == (32, 4) and ok.shape == (32,)

    def test_dynamic_mask_pipeline(self):
        det = yolo.Detector(width=8, input_hw=(96, 160))
        img = jnp.asarray(RNG.randint(0, 255, (240, 320, 3)), jnp.uint8)
        boxes, ok, ratio = det.dynamic_mask_inputs(img)
        assert 0.0 <= float(ratio) <= 1.0
        assert boxes.shape[0] == 32


@pytest.mark.slow
class TestDynamicIntegration:
    def test_kf_veto_on_dynamic_scene(self):
        """>80% dynamic coverage must suppress keyframe creation
        (reference: src/Tracking.cc:3273-3280)."""
        from dani_slam_tpu.core import cameras, state as mstate
        from dani_slam_tpu.slam.system import Sensor, System
        from dani_slam_tpu.utils import synthetic
        CAM = cameras.Camera.pinhole(500., 500., 320., 240., 640, 480)
        CAPS = mstate.MapCaps(K=64, L=8192, N=256, D=64)
        world = synthetic.make_world(1200, desc_dim=64, seed=5)
        R_gt, t_gt = synthetic.orbit_trajectory(20, radius=10.,
                                                angle_span=0.5)
        counts = {}
        for ratio in (0.0, 0.95):
            sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=256,
                         enable_loop_closing=False)
            for i in range(20):
                feat, _ = synthetic.render_frame(
                    world, CAM, R_gt[i], t_gt[i], n_max=256, noise_px=0.3,
                    seed=i, with_depth=True, time=i / 30.0)
                sys.track_features(feat, dyn_ratio=jnp.asarray(ratio))
            counts[ratio] = sys.n_keyframes()
        assert counts[0.95] == 1          # only the init keyframe
        assert counts[0.0] > counts[0.95]

    def test_keypoint_suppression_in_frame_build(self):
        """Keypoints inside dynamic boxes never enter the pipeline
        (reference: src/SPextractor.cpp:314-352)."""
        from dani_slam_tpu.ops import frontend
        h = jnp.zeros((128, 128)).at[30, 30].set(0.9).at[90, 90].set(0.8)
        dm = jnp.ones((16, 16, 8)) / (8 ** 0.5)
        boxes = jnp.asarray([[20.0, 20.0, 40.0, 40.0]])
        out = frontend.extract(h, dm, n_max=16, threshold=0.1, boxes=boxes,
                               box_mask=jnp.asarray([True]))
        xy = np.asarray(out["xy"])[np.asarray(out["valid"])]
        assert len(xy) == 1 and tuple(xy[0]) == (90.0, 90.0)
