"""Detector training on synthetic movable-object scenes.

The reference runs a fine-tuned YOLOv5 whose weights are withheld
(src/YoloDetect.cpp:9 hard-codes `yolov5s.torchscript.pt`; README.md:23-30).
This module trains our compact YoloNet (models/yolo.py) so the dynamic-
masking pipeline (detect -> refine -> suppress keypoints -> keyframe veto)
runs on real image input with NO oracle boxes.

Synthetic scenes match the SuperPoint training distribution (corner blobs on
noisy background, models/superpoint_train.py) with two object classes:

  class 0 "movable"  — warm-tinted bright envelope filled with corner
                       texture (the SLAM-poisoning case: the object sprouts
                       keypoints, so masking matters),
  class 1 "static"   — cool-tinted dark envelope, also textured (exercises
                       RefineDynamicBoxes, src/YoloDetect.cpp:148-208).

TPU-first: the train step is one jitted program (forward + target assembly
+ loss + adam); the host only rasterizes scenes (numpy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dani_slam_tpu.models.superpoint_train import save_params
from dani_slam_tpu.models.yolo import ANCHORS, STRIDES, YoloNet, box_iou

MAX_GT = 6


# ---------------------------------------------------------------------------
# Scene rendering (host-side numpy)
# ---------------------------------------------------------------------------

def _blobs(rng, img, x1, y1, x2, y2, n, amp_lo=0.35, amp_hi=0.7):
    """Sprinkle corner blobs into img[y1:y2, x1:x2] (all channels).

    Each blob is confined to |du|<5, |dv|<5 around its center, so only an
    ~11x11 window is touched — computed on that window slice (identical
    values + rng call order to the full-image formulation, ~100x faster
    host rasterization at 384x512)."""
    h, w = img.shape[:2]
    for _ in range(n):
        cx = rng.uniform(x1 + 3, max(x2 - 3, x1 + 4))
        cy = rng.uniform(y1 + 3, max(y2 - 3, y1 + 4))
        amp = rng.uniform(amp_lo, amp_hi)
        ix1 = max(int(np.floor(cx - 5)), 0)
        ix2 = min(int(np.ceil(cx + 5)) + 1, w)
        iy1 = max(int(np.floor(cy - 5)), 0)
        iy2 = min(int(np.ceil(cy + 5)) + 1, h)
        if ix2 <= ix1 or iy2 <= iy1:
            continue
        yy, xx = np.mgrid[iy1:iy2, ix1:ix2]
        du, dv = xx - cx, yy - cy
        m = (np.abs(du) < 5) & (np.abs(dv) < 5)
        g = amp * np.exp(-(du ** 2 + dv ** 2) / (2 * 1.5 ** 2))
        sub = img[iy1:iy2, ix1:ix2]
        sub[m] = np.maximum(sub[m], (0.2 + g[m])[:, None])
    return img


# object envelope tints (RGB multipliers)
DYN_TINT = np.array([1.0, 0.55, 0.45], np.float32)    # warm = movable
STAT_TINT = np.array([0.45, 0.6, 1.0], np.float32)    # cool = static


def render_detection_scene(rng: np.random.RandomState, h: int, w: int,
                           n_bg_blobs: int = 30):
    """One scene -> (img [h,w,3] float [0,1], boxes [MAX_GT,4] xyxy,
    cls [MAX_GT], valid [MAX_GT])."""
    base = rng.uniform(0.10, 0.22)
    img = np.full((h, w, 3), base, np.float32)
    img += rng.randn(h, w, 1).astype(np.float32) * 0.02
    img = _blobs(rng, img, 0, 0, w, h, n_bg_blobs)

    boxes = np.zeros((MAX_GT, 4), np.float32)
    cls = np.zeros((MAX_GT,), np.int32)
    valid = np.zeros((MAX_GT,), bool)
    n_dyn = rng.randint(0, 3)
    n_stat = rng.randint(0, 2)
    k = 0
    for i in range(n_dyn + n_stat):
        is_dyn = i < n_dyn
        bw = rng.uniform(0.12, 0.45) * w
        bh = rng.uniform(0.12, 0.45) * h
        x1 = rng.uniform(0, w - bw)
        y1 = rng.uniform(0, h - bh)
        x2, y2 = x1 + bw, y1 + bh
        xi1, yi1, xi2, yi2 = int(x1), int(y1), int(x2), int(y2)
        tint = DYN_TINT if is_dyn else STAT_TINT
        level = rng.uniform(0.45, 0.65) if is_dyn else rng.uniform(0.28, 0.4)
        img[yi1:yi2, xi1:xi2] = level * tint
        img[yi1:yi2, xi1:xi2] += rng.randn(
            yi2 - yi1, xi2 - xi1, 1).astype(np.float32) * 0.02
        img = _blobs(rng, img, xi1, yi1, xi2, yi2,
                     max(3, int(bw * bh / 900)))
        if k < MAX_GT:
            boxes[k] = (x1, y1, x2, y2)
            cls[k] = 0 if is_dyn else 1
            valid[k] = True
            k += 1
    return np.clip(img, 0, 1), boxes, cls, valid


def make_detection_batch(rng, batch: int, h: int, w: int):
    imgs = np.zeros((batch, h, w, 3), np.float32)
    boxes = np.zeros((batch, MAX_GT, 4), np.float32)
    cls = np.zeros((batch, MAX_GT), np.int32)
    valid = np.zeros((batch, MAX_GT), bool)
    for b in range(batch):
        imgs[b], boxes[b], cls[b], valid[b] = render_detection_scene(
            rng, h, w)
    return imgs, boxes, cls, valid


# ---------------------------------------------------------------------------
# Target assembly + loss (YOLOv5 semantics, simplified single-cell assign)
# ---------------------------------------------------------------------------

def _build_targets_scale(gt_boxes, gt_cls, gt_valid, H: int, W: int,
                         stride: int, anchors, num_classes: int):
    """Assign each GT to its center cell + best-ratio anchor at this scale.
    Returns (tobj [H,W,3], tbox [H,W,3,4] xyxy, tcls [H,W,3])."""
    aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
    ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
    tobj = jnp.zeros((H, W, 3))
    tbox = jnp.zeros((H, W, 3, 4))
    tcls = jnp.zeros((H, W, 3), jnp.int32)
    for g in range(MAX_GT):
        b = gt_boxes[g]
        bw = b[2] - b[0]
        bh = b[3] - b[1]
        cx = (b[0] + b[2]) / 2.0
        cy = (b[1] + b[3]) / 2.0
        # anchor whose shape best matches (YOLOv5 ratio gate r < 4)
        rw = jnp.maximum(bw / aw, aw / bw)
        rh = jnp.maximum(bh / ah, ah / bh)
        r = jnp.maximum(rw, rh)
        a = jnp.argmin(r)
        ok = gt_valid[g] & (r[a] < 4.0)
        ci = jnp.clip((cx / stride).astype(jnp.int32), 0, W - 1)
        cj = jnp.clip((cy / stride).astype(jnp.int32), 0, H - 1)
        tobj = tobj.at[cj, ci, a].max(jnp.where(ok, 1.0, 0.0))
        tbox = tbox.at[cj, ci, a].set(jnp.where(ok, b, tbox[cj, ci, a]))
        tcls = tcls.at[cj, ci, a].set(
            jnp.where(ok, gt_cls[g], tcls[cj, ci, a]))
    return tobj, tbox, tcls


def _decode_scale(p_sig, stride: int, anchors):
    """Sigmoid head activations [H,W,3,5+nc] -> xyxy boxes (same decode as
    models/yolo.decode_predictions)."""
    H, W = p_sig.shape[0], p_sig.shape[1]
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W, 3), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W, 3), 1)
    aw = jnp.asarray([a[0] for a in anchors], jnp.float32)
    ah = jnp.asarray([a[1] for a in anchors], jnp.float32)
    cx = (2 * p_sig[..., 0] - 0.5 + gx) * stride
    cy = (2 * p_sig[..., 1] - 0.5 + gy) * stride
    bw = (2 * p_sig[..., 2]) ** 2 * aw
    bh = (2 * p_sig[..., 3]) ** 2 * ah
    return jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                     -1)


def _iou_elementwise(a, b):
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area = (jnp.clip(a[..., 2] - a[..., 0], 0) *
            jnp.clip(a[..., 3] - a[..., 1], 0) +
            jnp.clip(b[..., 2] - b[..., 0], 0) *
            jnp.clip(b[..., 3] - b[..., 1], 0) - inter)
    return inter / jnp.maximum(area, 1e-9)


def yolo_loss(params, model: YoloNet, imgs, gt_boxes, gt_cls, gt_valid,
              num_classes: int):
    outs = model.apply(params, imgs)

    def per_image(outs_i, boxes_i, cls_i, valid_i):
        total_obj = total_box = total_cls = 0.0
        for out, anchors, stride in zip(outs_i, ANCHORS, STRIDES):
            H, W = out.shape[0], out.shape[1]
            tobj, tbox, tcls = _build_targets_scale(
                boxes_i, cls_i, valid_i, H, W, stride, anchors, num_classes)
            p = jax.nn.sigmoid(out)
            # objectness BCE, positives up-weighted (few cells are positive)
            obj_logit = out[..., 4]
            bce = optax.sigmoid_binary_cross_entropy(obj_logit, tobj)
            pos = tobj > 0.5
            total_obj += (jnp.sum(jnp.where(pos, bce * 20.0, bce)) /
                          (H * W * 3))
            # box IoU loss on positives
            dec = _decode_scale(p, stride, anchors)
            iou = _iou_elementwise(dec, tbox)
            total_box += jnp.sum(jnp.where(pos, 1.0 - iou, 0.0)) / jnp.maximum(
                jnp.sum(pos), 1.0)
            # class BCE on positives
            cls_logit = out[..., 5:]
            onehot = jax.nn.one_hot(tcls, num_classes)
            cbce = jnp.sum(optax.sigmoid_binary_cross_entropy(
                cls_logit, onehot), -1)
            total_cls += jnp.sum(jnp.where(pos, cbce, 0.0)) / jnp.maximum(
                jnp.sum(pos), 1.0)
        return total_obj + 2.0 * total_box + total_cls

    losses = jax.vmap(per_image)(outs, gt_boxes, gt_cls, gt_valid)
    return jnp.mean(losses)


def train_yolo(steps: int = 1200, batch: int = 16, h: int = 192,
               w: int = 256, width: int = 16, num_classes: int = 2,
               lr: float = 1e-3, seed: int = 0, log_every: int = 0,
               model=None):
    """`model` overrides the compact YoloNet with any module sharing the
    head-output contract — e.g. yolo_official.YoloV5Net at the yolov5s
    multiples (0.33/0.50), the size the reference deploys
    (src/YoloDetect.cpp:9)."""
    rng = np.random.RandomState(seed)
    if model is None:
        model = YoloNet(num_classes=num_classes, width=width)
    else:
        num_classes = model.num_classes
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3)))
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(optax.cosine_decay_schedule(lr, steps)))
    ost = tx.init(params)

    @jax.jit
    def step(params, ost, imgs, boxes, cls, valid):
        loss, g = jax.value_and_grad(yolo_loss)(
            params, model, imgs, boxes, cls, valid, num_classes)
        up, ost2 = tx.update(g, ost, params)
        return optax.apply_updates(params, up), ost2, loss

    loss = None
    for i in range(steps):
        imgs, boxes, cls, valid = make_detection_batch(rng, batch, h, w)
        params, ost, loss = step(params, ost, jnp.asarray(imgs),
                                 jnp.asarray(boxes), jnp.asarray(cls),
                                 jnp.asarray(valid))
        if log_every and i % log_every == 0:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    return params, model, float(loss)


def evaluate_detector(params, model: YoloNet, n_scenes: int = 32,
                      h: int = 192, w: int = 256, seed: int = 999,
                      score_th: float = 0.4, iou_th: float = 0.5):
    """Recall/precision of dynamic-class detections at IoU 0.5."""
    from dani_slam_tpu.models.yolo import decode_predictions, nms
    rng = np.random.RandomState(seed)

    @jax.jit
    def detect(params, img):
        outs = model.apply(params, img)
        boxes, scores, cls = decode_predictions(outs)
        return nms(boxes, scores, cls, score_th=score_th)

    n_gt = n_pred = n_hit = 0
    for _ in range(n_scenes):
        img, gtb, gtc, gtv = render_detection_scene(rng, h, w)
        b, s, c, ok = detect(params, jnp.asarray(img))
        b, c, ok = np.asarray(b), np.asarray(c), np.asarray(ok)
        for cls_id in (0, 1):
            gt = gtb[gtv & (gtc == cls_id)]
            pr = b[ok & (c == cls_id)]
            n_gt += len(gt)
            n_pred += len(pr)
            if len(gt) and len(pr):
                iou = np.asarray(box_iou(jnp.asarray(pr), jnp.asarray(gt)))
                # greedy one-to-one
                used = np.zeros(len(gt), bool)
                for i in range(len(pr)):
                    j = int(np.argmax(np.where(used, -1.0, iou[i])))
                    if iou[i, j] >= iou_th and not used[j]:
                        used[j] = True
                        n_hit += 1
    recall = n_hit / max(n_gt, 1)
    precision = n_hit / max(n_pred, 1)
    return precision, recall, n_gt


if __name__ == "__main__":
    import argparse
    import os

    jax.config.update("jax_compilation_cache_dir", "/tmp/dani_slam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--official", action="store_true",
                    help="train the reference-scale yolov5s architecture "
                    "(v6.0 graph, depth 0.33 / width 0.50, 80-class head) "
                    "at 384x512 input instead of the compact layout")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if not args.out:
        args.out = os.path.join(
            os.path.dirname(__file__), "..", "weights",
            "yolo_official_synthetic.npz" if args.official
            else "yolo_synthetic.npz")
    if args.official:
        from dani_slam_tpu.models.yolo_official import YoloV5Net
        h, w = 384, 512
        model_in = YoloV5Net(num_classes=80, depth_multiple=0.33,
                             width_multiple=0.50)
        params, model, loss = train_yolo(steps=args.steps, batch=args.batch,
                                         h=h, w=w, model=model_in,
                                         log_every=50)
        meta = np.asarray([0, 80, h, w], np.int32)   # width 0 = official
    else:
        h, w = 192, 256
        params, model, loss = train_yolo(steps=args.steps, batch=args.batch,
                                         width=args.width, log_every=50)
        meta = np.asarray([args.width, 2, h, w], np.int32)
    prec, rec, n_gt = evaluate_detector(params, model, h=h, w=w)
    print(f"held-out: precision {prec:.3f} recall {rec:.3f} (gt {n_gt})")
    save_params(args.out, params)
    # append config metadata (consumed by the detector loaders)
    data = dict(np.load(args.out))
    data["__meta__"] = meta
    np.savez_compressed(args.out, **data)
    print("saved", args.out)
