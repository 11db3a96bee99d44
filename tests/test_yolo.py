"""YOLO detector plumbing tests: decode, NMS, box refinement, area ratio."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.models import yolo

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
