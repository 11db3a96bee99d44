"""Converter tests: official-architecture YOLOv5 public-checkpoint path.

The reference runs the stock ultralytics yolov5s TorchScript export
(src/YoloDetect.cpp:9 `yolov5s.torchscript.pt`, COCO classes :12-17). The
real checkpoint isn't bundled, so these tests exercise the converter against
SYNTHETIC state dicts carrying the real ultralytics layer names/shapes
(model.<i>.conv/bn..., Detect at model.24): the Flax forward of the
converted (BN-folded) params must agree with an independent torch oracle of
the official compute graph (reference_forward_torch, BN unfolded).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dani_slam_tpu.models import yolo
from dani_slam_tpu.models.yolo_official import (
    YoloV5Net, _make_divisible, load_yolov5_state_dict,
    reference_forward_torch)

torch = pytest.importorskip("torch")


def make_yolov5_state_dict(gd=1 / 3, gw=0.25, nc=4, seed=0, prefix="",
                           with_anchors=True):
    """Random weights under the PUBLIC ultralytics yolov5 v6.0 layer
    names/shapes at depth/width multiples (gw=0.25 keeps tests fast;
    yolov5s itself is gd=0.33, gw=0.50 — same graph, wider)."""
    rng = np.random.RandomState(seed)
    sd = {}
    ch = lambda c: _make_divisible(c * gw)
    n_ = lambda n: max(round(n * gd), 1)

    def conv(name, c_out, c_in, k):
        sd[name + ".conv.weight"] = torch.tensor(
            rng.randn(c_out, c_in, k, k).astype(np.float32) * 0.2)
        sd[name + ".bn.weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, c_out).astype(np.float32))
        sd[name + ".bn.bias"] = torch.tensor(
            rng.randn(c_out).astype(np.float32) * 0.05)
        sd[name + ".bn.running_mean"] = torch.tensor(
            rng.randn(c_out).astype(np.float32) * 0.1)
        sd[name + ".bn.running_var"] = torch.tensor(
            rng.uniform(0.5, 2.0, c_out).astype(np.float32))

    def c3(name, c_out, c_in, n):
        c_ = c_out // 2
        conv(name + ".cv1", c_, c_in, 1)
        conv(name + ".cv2", c_, c_in, 1)
        conv(name + ".cv3", c_out, 2 * c_, 1)
        for i in range(n):
            conv(f"{name}.m.{i}.cv1", c_, c_, 1)
            conv(f"{name}.m.{i}.cv2", c_, c_, 3)

    conv("model.0", ch(64), 3, 6)
    conv("model.1", ch(128), ch(64), 3)
    c3("model.2", ch(128), ch(128), n_(3))
    conv("model.3", ch(256), ch(128), 3)
    c3("model.4", ch(256), ch(256), n_(6))
    conv("model.5", ch(512), ch(256), 3)
    c3("model.6", ch(512), ch(512), n_(9))
    conv("model.7", ch(1024), ch(512), 3)
    c3("model.8", ch(1024), ch(1024), n_(3))
    conv("model.9.cv1", ch(1024) // 2, ch(1024), 1)
    conv("model.9.cv2", ch(1024), 2 * ch(1024), 1)

    conv("model.10", ch(512), ch(1024), 1)
    c3("model.13", ch(512), ch(512) + ch(512), n_(3))
    conv("model.14", ch(256), ch(512), 1)
    c3("model.17", ch(256), ch(256) + ch(256), n_(3))
    conv("model.18", ch(256), ch(256), 3)
    c3("model.20", ch(512), ch(256) + ch(256), n_(3))
    conv("model.21", ch(512), ch(512), 3)
    c3("model.23", ch(1024), ch(512) + ch(512), n_(3))

    no = 3 * (5 + nc)
    for j, c_in in enumerate((ch(256), ch(512), ch(1024))):
        sd[f"model.24.m.{j}.weight"] = torch.tensor(
            rng.randn(no, c_in, 1, 1).astype(np.float32) * 0.1)
        sd[f"model.24.m.{j}.bias"] = torch.tensor(
            rng.randn(no).astype(np.float32) * 0.05)
    if with_anchors:
        base = np.asarray(yolo.ANCHORS, np.float32)  # [3,3,2] pixels
        sd["model.24.anchors"] = torch.tensor(
            base / np.asarray([8, 16, 32], np.float32)[:, None, None])
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


class TestConverter:
    def test_forward_matches_torch_oracle(self):
        sd = make_yolov5_state_dict(seed=3)
        model, params, anchors, strides = load_yolov5_state_dict(
            sd, compute_dtype=jnp.float32)
        assert model.num_classes == 4
        assert abs(model.width_multiple - 0.25) < 1e-6
        assert strides == (8, 16, 32)

        rng = np.random.RandomState(7)
        img = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
        want = reference_forward_torch(sd, img)
        got = model.apply(params, jnp.asarray(img))
        assert len(got) == 3
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w,
                                       rtol=2e-3, atol=2e-3)

    def test_anchor_extraction(self):
        sd = make_yolov5_state_dict(seed=1)
        _, _, anchors, _ = load_yolov5_state_dict(sd)
        np.testing.assert_allclose(np.asarray(anchors),
                                   np.asarray(yolo.ANCHORS), rtol=1e-5)
        # without stored anchors the converter falls back to the defaults
        sd2 = make_yolov5_state_dict(seed=1, with_anchors=False)
        _, _, anchors2, _ = load_yolov5_state_dict(sd2)
        assert anchors2 == yolo.ANCHORS

    def test_wrapper_prefix_stripped(self):
        """Ultralytics ckpts nest the Model inside the save dict
        ('model.model.<i>.'); TorchScript exports may add more wrapping."""
        sd = make_yolov5_state_dict(seed=2, prefix="model.")
        model, params, _, _ = load_yolov5_state_dict(
            sd, compute_dtype=jnp.float32)
        sd_plain = make_yolov5_state_dict(seed=2)
        model2, params2, _, _ = load_yolov5_state_dict(
            sd_plain, compute_dtype=jnp.float32)
        img = jnp.asarray(np.full((64, 64, 3), 0.3, np.float32))
        a = model.apply(params, img)
        b = model2.apply(params2, img)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    def test_detector_plumbing(self):
        """The converted net drops into yolo.Detector: detect and
        dynamic_mask_inputs run with the (5+nc) head contract and custom
        anchors (reference wiring: src/YoloDetect.cpp:27-82 + Tracking.cc:
        1534-1546)."""
        sd = make_yolov5_state_dict(seed=5, nc=80)
        model, params, anchors, _ = load_yolov5_state_dict(sd)
        det = yolo.Detector(params=params, model=model, anchors=anchors,
                            input_hw=(64, 96), score_th=0.4)
        img = jnp.asarray(
            np.random.RandomState(0).uniform(0, 255, (120, 160, 3))
            .astype(np.float32))
        b, s, c, ok = det.detect(img)
        assert b.shape[-1] == 4 and ok.dtype == bool
        boxes, box_ok, ratio = det.dynamic_mask_inputs(img)
        assert boxes.shape[-1] == 4
        assert 0.0 <= float(ratio) <= 1.0

    def test_load_pt_file(self, tmp_path):
        """load_yolov5_pt handles a torch-saved plain state dict and the
        ultralytics-style {'model': module-ish} checkpoint dict."""
        from dani_slam_tpu.models.yolo_official import load_yolov5_pt
        sd = make_yolov5_state_dict(seed=4, nc=80)
        p = str(tmp_path / "yolov5n25.pt")
        torch.save(sd, p)
        det = load_yolov5_pt(p, input_hw=(64, 96))
        assert isinstance(det, yolo.Detector)
        assert det.model.num_classes == 80
        assert det.input_hw == (64, 96)
