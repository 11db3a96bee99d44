"""YOLO object detector for dynamic-region masking, in Flax.

Reference: src/YoloDetect.cpp — TorchScript YOLOv5s at 640x380 (Detect:27),
class list from coco.names (:12-17), 14 movable "dynamic" classes (:18-19),
non_max_suppression with score 0.4 / IoU 0.5 (:84-146), box rescale to the
original image, RefineDynamicBoxes (:148-208) subtracting overlapping
static-class boxes from each dynamic box keeping the largest residual
rectangle. Downstream: keypoints inside dynamic boxes are deleted
(src/SPextractor.cpp:314-352) and keyframes are suppressed when the dynamic
area ratio exceeds 0.8 (src/Tracking.cc:3252-3280).

TPU-first: a CSP-style conv backbone with three anchor heads (YOLOv5
topology at reduced width — the authors' fine-tuned weights are not in the
reference repo either, src/YoloDetect.cpp:9 loads an external file); decode
and NMS run on device with fixed shapes (top-K candidates, fori-loop
suppression) so the whole detector is one XLA program feeding the extraction
mask without any host round-trip.
"""
from __future__ import annotations

import functools as _functools
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# COCO ids of the reference's movable classes (person, bicycle, car,
# motorbike, bus, truck, train, boat, bird, cat, dog, horse, sheep, cow —
# the 14-entry mvDynamicNames list, src/YoloDetect.cpp:18-19)
DYNAMIC_CLASS_IDS = (0, 1, 2, 3, 5, 6, 7, 8, 14, 15, 16, 17, 18, 19)


def _conv_bn(x, c, k=3, s=1, name=None, dt=jnp.bfloat16):
    x = nn.Conv(c, (k, k), strides=(s, s), padding="SAME", use_bias=False,
                dtype=dt, name=f"{name}_conv")(x)
    x = nn.silu(x)
    return x


class C3Block(nn.Module):
    """Simplified CSP bottleneck (C3)."""
    ch: int
    n: int = 1
    dt: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        a = _conv_bn(x, self.ch // 2, 1, name="cv1", dt=self.dt)
        b = _conv_bn(x, self.ch // 2, 1, name="cv2", dt=self.dt)
        for i in range(self.n):
            r = _conv_bn(a, self.ch // 2, 1, name=f"m{i}a", dt=self.dt)
            r = _conv_bn(r, self.ch // 2, 3, name=f"m{i}b", dt=self.dt)
            a = a + r
        return _conv_bn(jnp.concatenate([a, b], -1), self.ch, 1, name="cv3",
                       dt=self.dt)


class YoloNet(nn.Module):
    """Compact YOLOv5-style detector: 3 scales x 3 anchors x (5+nc)."""
    num_classes: int = 80
    width: int = 32          # base channel width (yolov5s uses 64)
    dt: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = x.astype(self.dt)
        x = _conv_bn(x, w, 6, 2, name="stem")         # /2
        x = _conv_bn(x, 2 * w, 3, 2, name="d1")       # /4
        x = C3Block(2 * w, 1, name="c1")(x)
        x = _conv_bn(x, 4 * w, 3, 2, name="d2")       # /8
        p3 = C3Block(4 * w, 2, name="c2")(x)
        x = _conv_bn(p3, 8 * w, 3, 2, name="d3")      # /16
        p4 = C3Block(8 * w, 2, name="c3")(x)
        x = _conv_bn(p4, 16 * w, 3, 2, name="d4")     # /32
        p5 = C3Block(16 * w, 1, name="c4")(x)

        no = 3 * (5 + self.num_classes)
        outs = []
        for i, p in enumerate((p3, p4, p5)):
            h = nn.Conv(no, (1, 1), dtype=self.dt, param_dtype=jnp.float32,
                        name=f"head{i}")(p).astype(jnp.float32)
            H, W = h.shape[-3], h.shape[-2]
            outs.append(h.reshape(h.shape[:-3] + (H, W, 3,
                                                  5 + self.num_classes)))
        return outs                                    # [(B?,H,W,3,5+nc)]


# default anchors per scale (pixels), yolov5s-like
ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
STRIDES = (8, 16, 32)


def decode_predictions(outs: Sequence[jax.Array], top_k: int = 256,
                       anchors_per_scale=ANCHORS, strides=STRIDES):
    """Raw head outputs -> flat (boxes xyxy [M,4], score [M], cls [M]),
    top_k by objectness*class score (fixed M; YOLOv5 decode semantics)."""
    all_boxes, all_scores, all_cls = [], [], []
    for out, anchors, stride in zip(outs, anchors_per_scale, strides):
        H, W = out.shape[0], out.shape[1]
        p = jax.nn.sigmoid(out)
        gy = jax.lax.broadcasted_iota(jnp.float32, (H, W, 3), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (H, W, 3), 1)
        aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
        ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
        cx = (2 * p[..., 0] - 0.5 + gx) * stride
        cy = (2 * p[..., 1] - 0.5 + gy) * stride
        bw = (2 * p[..., 2]) ** 2 * aw
        bh = (2 * p[..., 3]) ** 2 * ah
        obj = p[..., 4]
        cls_p = p[..., 5:]
        score = obj[..., None] * cls_p
        best_cls = jnp.argmax(score, -1)
        best_score = jnp.max(score, -1)
        boxes = jnp.stack([cx - bw / 2, cy - bh / 2,
                           cx + bw / 2, cy + bh / 2], -1)
        all_boxes.append(boxes.reshape(-1, 4))
        all_scores.append(best_score.reshape(-1))
        all_cls.append(best_cls.reshape(-1))
    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    cls = jnp.concatenate(all_cls)
    k = min(top_k, scores.shape[0])
    top_i = jnp.argsort(-scores)[:k]   # argsort >> lax.top_k on TPU
    return boxes[top_i], scores[top_i], cls[top_i]


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU of boxes a [M,4] vs b [N,4] (xyxy) -> [M,N]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


@partial(jax.jit, static_argnames=("max_det",))
def nms(boxes: jax.Array, scores: jax.Array, cls: jax.Array,
        score_th: float = 0.4, iou_th: float = 0.5, max_det: int = 32):
    """Device-side class-aware NMS (reference: non_max_suppression
    src/YoloDetect.cpp:84-146 — score 0.4, IoU 0.5). Greedy pick of up to
    max_det boxes via fori_loop over a live-score vector (fixed shape)."""
    live = jnp.where(scores >= score_th, scores, -1.0)
    iou = box_iou(boxes, boxes)
    same_cls = cls[:, None] == cls[None, :]
    suppress = (iou > iou_th) & same_cls

    def body(i, carry):
        live, keep_idx, keep_ok = carry
        b = jnp.argmax(live)
        ok = live[b] > 0
        keep_idx = keep_idx.at[i].set(jnp.where(ok, b, -1))
        keep_ok = keep_ok.at[i].set(ok)
        live = jnp.where(ok & suppress[b], -1.0, live)
        live = live.at[b].set(-1.0)
        return live, keep_idx, keep_ok

    keep_idx = jnp.full((max_det,), -1, jnp.int32)
    keep_ok = jnp.zeros((max_det,), bool)
    _, keep_idx, keep_ok = jax.lax.fori_loop(
        0, max_det, body, (live, keep_idx, keep_ok))
    safe = jnp.where(keep_ok, keep_idx, 0)
    return boxes[safe], scores[safe], cls[safe], keep_ok


@partial(jax.jit, static_argnames=("max_det",))
def refine_dynamic_boxes(dyn_boxes, dyn_ok, stat_boxes, stat_ok,
                         max_det: int = 32):
    """Subtract overlapping static boxes from each dynamic box, keeping the
    largest residual rectangle (reference: RefineDynamicBoxes
    src/YoloDetect.cpp:148-208). One subtraction pass per static box (fixed
    count), choosing among the 4 candidate residual rectangles."""
    S = stat_boxes.shape[0]

    def subtract_one(d, s, s_valid):
        x1, y1, x2, y2 = d
        sx1, sy1, sx2, sy2 = s
        overlap = (jnp.maximum(x1, sx1) < jnp.minimum(x2, sx2)) & \
                  (jnp.maximum(y1, sy1) < jnp.minimum(y2, sy2)) & s_valid
        # 4 residual rectangles: left / right / top / bottom of the cut
        cands = jnp.asarray([
            [x1, y1, jnp.clip(sx1, x1, x2), y2],
            [jnp.clip(sx2, x1, x2), y1, x2, y2],
            [x1, y1, x2, jnp.clip(sy1, y1, y2)],
            [x1, jnp.clip(sy2, y1, y2), x2, y2],
        ])
        areas = jnp.clip(cands[:, 2] - cands[:, 0], 0) * \
            jnp.clip(cands[:, 3] - cands[:, 1], 0)
        best = cands[jnp.argmax(areas)]
        return jnp.where(overlap, best, d)

    def refine_one(d, ok):
        def body(j, dd):
            return subtract_one(dd, stat_boxes[j], stat_ok[j])
        return jax.lax.fori_loop(0, S, body, d)

    out = jax.vmap(refine_one)(dyn_boxes, dyn_ok)
    area = jnp.clip(out[:, 2] - out[:, 0], 0) * \
        jnp.clip(out[:, 3] - out[:, 1], 0)
    return out, dyn_ok & (area > 1.0)


@partial(jax.jit, static_argnames=("width", "height", "grid"))
def dynamic_area_ratio(boxes, ok, width: int, height: int, grid: int = 64):
    """Fraction of the image covered by the union of dynamic boxes
    (reference: CalculateDynamicObjectRatio src/Tracking.cc:3252 — sums box
    areas; we compute the true union on an occupancy grid, which cannot
    exceed 1)."""
    gx = (jnp.arange(grid) + 0.5) * (width / grid)
    gy = (jnp.arange(grid) + 0.5) * (height / grid)
    X = gx[None, :, None]
    Y = gy[None, None, :]
    inside = ((X >= boxes[:, 0, None, None]) & (X <= boxes[:, 2, None, None]) &
              (Y >= boxes[:, 1, None, None]) & (Y <= boxes[:, 3, None, None]))
    covered = jnp.any(inside & ok[:, None, None], axis=0)
    return jnp.mean(covered.astype(jnp.float32))


@partial(jax.jit, static_argnames=("model", "ih", "iw", "score_th",
                                   "anchors"))
def _detect_program(model, params, img, ih: int, iw: int,
                    score_th: float = 0.4, anchors=ANCHORS):
    """Fused detection: resize -> forward -> decode -> NMS -> rescale.
    ONE XLA program (reference: YoloDetection::Detect src/YoloDetect.cpp:
    27-82 resizes to the net input, forwards, NMS, rescales)."""
    H, W = img.shape[0], img.shape[1]
    x = jax.image.resize(img.astype(jnp.float32) / 255.0, (ih, iw, 3),
                         "bilinear")
    outs = model.apply(params, x)
    boxes, scores, cls = decode_predictions(outs, anchors_per_scale=anchors)
    b, s, c, ok = nms(boxes, scores, cls, score_th=score_th)
    scale = jnp.asarray([W / iw, H / ih, W / iw, H / ih])
    return b * scale, s, c, ok


@partial(jax.jit, static_argnames=("model", "ih", "iw", "score_th",
                                   "anchors"))
def _mask_program(model, params, img, dyn_ids, ih: int, iw: int,
                  score_th: float = 0.4, anchors=ANCHORS):
    """Fused dynamic-masking pipeline: detect -> split dynamic/static ->
    RefineDynamicBoxes -> union area ratio. ONE XLA program so the RGB-D
    front-end costs a single extra dispatch per frame."""
    b, s, c, ok = _detect_program(model, params, img, ih, iw,
                                  score_th=score_th, anchors=anchors)
    dyn_cls = jnp.isin(c, dyn_ids)
    dyn_ok = ok & dyn_cls
    stat_ok = ok & ~dyn_cls
    b2, dyn_ok2 = refine_dynamic_boxes(b, dyn_ok, b, stat_ok)
    ratio = dynamic_area_ratio(b2, dyn_ok2, img.shape[1], img.shape[0])
    return b2, dyn_ok2, ratio


class Detector:
    """Host-facing detector bundle (reference: YoloDetection class).
    dynamic_class_ids selects the movable classes (COCO ids by default;
    synthetic-trained weights use class 0 = movable)."""

    def __init__(self, params=None, num_classes: int = 80, width: int = 32,
                 input_hw=(384, 640), seed: int = 0,
                 dynamic_class_ids=DYNAMIC_CLASS_IDS,
                 score_th: float = 0.4, model=None, anchors=ANCHORS):
        """`model` overrides the compact YoloNet with any module sharing the
        head-output contract (e.g. yolo_official.YoloV5Net for converted
        public yolov5s checkpoints); `anchors` must then match it."""
        self.model = model if model is not None else YoloNet(
            num_classes=num_classes, width=width)
        self.input_hw = input_hw
        self.score_th = score_th
        self.anchors = tuple(tuple(tuple(a) for a in s) for s in anchors)
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((input_hw[0], input_hw[1], 3)))
        self.params = params
        self.dyn_ids = jnp.asarray(dynamic_class_ids)

    def detect(self, img: jax.Array):
        """RGB image (H,W,3) [0..255] -> (boxes xyxy in ORIGINAL pixels,
        scores, classes, valid) after NMS."""
        return _detect_program(self.model, self.params, img,
                               self.input_hw[0], self.input_hw[1],
                               score_th=self.score_th, anchors=self.anchors)

    def dynamic_mask_inputs(self, img: jax.Array):
        """Full dynamic-masking pipeline: detect -> split dynamic/static ->
        refine -> (boxes, box_mask, dynamic_ratio)."""
        return _mask_program(self.model, self.params, img, self.dyn_ids,
                             self.input_hw[0], self.input_hw[1],
                             score_th=self.score_th, anchors=self.anchors)


@_functools.lru_cache(maxsize=1)
def load_default_detector() -> Detector | None:
    """Load the shipped synthetic-scene-trained detector if present
    (dani_slam_tpu/weights/yolo_synthetic.npz + __meta__, produced by
    models/yolo_train.py), else None. The authors' fine-tuned YOLOv5
    checkpoint is not public (reference loads a hard-coded path,
    src/YoloDetect.cpp:9). Memoized: the device transfer of the state dict
    is paid once per process (params are read-only at inference)."""
    import os

    import numpy as np

    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "yolo_synthetic.npz")
    if not os.path.exists(path):
        return None
    from dani_slam_tpu.models.superpoint_train import load_params
    data = np.load(path)
    meta = data["__meta__"] if "__meta__" in data.files else None
    params = load_params(path)
    params.pop("__meta__", None)
    if meta is not None:
        width, num_classes, ih, iw = (int(v) for v in meta)
    else:
        width, num_classes, ih, iw = 16, 2, 192, 256
    # score_th=0.75: held-out precision 1.00 / recall 1.00 on synthetic
    # scenes (the reference's 0.4 suits its COCO-trained YOLOv5; the compact
    # synthetic-trained net is better-calibrated high)
    return Detector(params=params, num_classes=num_classes, width=width,
                    input_hw=(ih, iw), dynamic_class_ids=(0,),
                    score_th=0.75)
