"""Official YOLOv5 architecture in Flax + public-checkpoint converter.

The reference runs the stock ultralytics yolov5s TorchScript export
(src/YoloDetect.cpp:9 loads `yolov5s.torchscript.pt`, COCO class list from
coco.names :12-17). Our shipped detector (`models/yolo.py`) is a compact
synthetic-trained net with a different layout, so it cannot receive those
weights; this module is the faithful receiving architecture: the v6.0
yolov5 graph (Conv k6-stem backbone, C3 blocks, SPPF, PAN neck, 3-scale
Detect head) at any depth/width multiple (yolov5s = 0.33/0.50).

BatchNorm is folded into the conv weights at conversion (inference-only),
so the Flax graph is conv(bias)+SiLU throughout — one less op per layer and
exactly the arithmetic the fused TorchScript graph performs. The converted
model plugs into `yolo.Detector` (same head-output contract: NHWC maps of
3*(5+nc) channels reshaped to (H,W,3,5+nc)), so decode/NMS/refine and the
whole dynamic-masking program work unchanged.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _make_divisible(x: float, div: int = 8) -> int:
    return max(div, int(round(x / div) * div))


class FoldedConv(nn.Module):
    """yolov5 Conv (conv+BN+SiLU) with BN pre-folded into weight/bias."""
    ch: int
    k: int = 1
    s: int = 1
    act: bool = True
    dt: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # yolov5 pads: k//2 for odd k; the k=6 stem uses explicit p=2
        # (models/yolov5s.yaml: [64, 6, 2, 2])
        p = 2 if self.k == 6 else self.k // 2
        x = nn.Conv(self.ch, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=True, dtype=self.dt,
                    name="conv")(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    ch: int
    shortcut: bool = True
    dt: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = FoldedConv(self.ch, 1, name="cv1", dt=self.dt)(x)
        y = FoldedConv(self.ch, 3, name="cv2", dt=self.dt)(y)
        return x + y if self.shortcut else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (yolov5 C3, e=0.5)."""
    ch: int
    n: int = 1
    shortcut: bool = True
    dt: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c_ = self.ch // 2
        a = FoldedConv(c_, 1, name="cv1", dt=self.dt)(x)
        b = FoldedConv(c_, 1, name="cv2", dt=self.dt)(x)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, name=f"m{i}", dt=self.dt)(a)
        return FoldedConv(self.ch, 1, name="cv3",
                          dt=self.dt)(jnp.concatenate([a, b], -1))


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (3 chained k=5 maxpools)."""
    ch: int
    dt: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c_ = self.ch // 2
        x = FoldedConv(c_, 1, name="cv1", dt=self.dt)(x)
        pool = lambda v: nn.max_pool(v, (5, 5), strides=(1, 1),
                                     padding=((2, 2), (2, 2)))
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return FoldedConv(self.ch, 1, name="cv2", dt=self.dt)(
            jnp.concatenate([x, y1, y2, y3], -1))


def _upsample2(x):
    H, W, C = x.shape[-3], x.shape[-2], x.shape[-1]
    return jax.image.resize(x, x.shape[:-3] + (2 * H, 2 * W, C), "nearest")


class YoloV5Net(nn.Module):
    """Faithful yolov5 v6.0 graph. Module names carry the checkpoint's
    layer indices (m0..m24) so the converter mapping is direct. Output
    contract matches yolo.YoloNet: list of NHWC (H,W,3,5+nc) maps for
    strides 8/16/32."""
    num_classes: int = 80
    depth_multiple: float = 0.33    # yolov5s
    width_multiple: float = 0.50
    dt: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        gd, gw = self.depth_multiple, self.width_multiple
        ch = lambda c: _make_divisible(c * gw)
        n_ = lambda n: max(round(n * gd), 1)
        dt = self.dt
        x = x.astype(dt)

        x = FoldedConv(ch(64), 6, 2, name="m0", dt=dt)(x)       # P1/2
        x = FoldedConv(ch(128), 3, 2, name="m1", dt=dt)(x)      # P2/4
        x = C3(ch(128), n_(3), name="m2", dt=dt)(x)
        x = FoldedConv(ch(256), 3, 2, name="m3", dt=dt)(x)      # P3/8
        p3 = C3(ch(256), n_(6), name="m4", dt=dt)(x)
        x = FoldedConv(ch(512), 3, 2, name="m5", dt=dt)(p3)     # P4/16
        p4 = C3(ch(512), n_(9), name="m6", dt=dt)(x)
        x = FoldedConv(ch(1024), 3, 2, name="m7", dt=dt)(p4)    # P5/32
        x = C3(ch(1024), n_(3), name="m8", dt=dt)(x)
        x = SPPF(ch(1024), name="m9", dt=dt)(x)

        # PAN neck
        t10 = FoldedConv(ch(512), 1, name="m10", dt=dt)(x)
        x = jnp.concatenate([_upsample2(t10), p4], -1)          # m11+m12
        x = C3(ch(512), n_(3), shortcut=False, name="m13", dt=dt)(x)
        t14 = FoldedConv(ch(256), 1, name="m14", dt=dt)(x)
        x = jnp.concatenate([_upsample2(t14), p3], -1)          # m15+m16
        o3 = C3(ch(256), n_(3), shortcut=False, name="m17", dt=dt)(x)
        x = FoldedConv(ch(256), 3, 2, name="m18", dt=dt)(o3)
        x = jnp.concatenate([x, t14], -1)                       # m19
        o4 = C3(ch(512), n_(3), shortcut=False, name="m20", dt=dt)(x)
        x = FoldedConv(ch(512), 3, 2, name="m21", dt=dt)(o4)
        x = jnp.concatenate([x, t10], -1)                       # m22
        o5 = C3(ch(1024), n_(3), shortcut=False, name="m23", dt=dt)(x)

        no = 3 * (5 + self.num_classes)
        outs = []
        for i, p in enumerate((o3, o4, o5)):
            h = nn.Conv(no, (1, 1), use_bias=True, dtype=dt,
                        param_dtype=jnp.float32,
                        name=f"det{i}")(p).astype(jnp.float32)
            H, W = h.shape[-3], h.shape[-2]
            outs.append(h.reshape(h.shape[:-3] + (H, W, 3,
                                                  5 + self.num_classes)))
        return outs


# ---------------------------------------------------------------------------
# Public-checkpoint converter
# ---------------------------------------------------------------------------

BN_EPS = 1e-3   # ultralytics BatchNorm2d(eps=0.001)


def _normalize_keys(sd: dict) -> dict:
    """Strip wrapper prefixes so keys start at 'model.<i>.'. Ultralytics
    checkpoints commonly nest as 'model.model.<i>.' (Model inside ckpt)."""
    out = {}
    for k, v in sd.items():
        kk = k
        while not (kk.startswith("model.") and
                   kk.split(".")[1].isdigit()):
            if "." in kk:
                kk = kk.split(".", 1)[1]
            else:
                break
        out[kk] = v
    return out


def load_yolov5_state_dict(sd: dict, compute_dtype=jnp.bfloat16):
    """Map an ultralytics yolov5 state dict (any depth/width multiple, BN
    unfolded, torch tensors or numpy arrays) -> (YoloV5Net, flax params,
    anchors, strides). BN is folded into each conv's weight/bias."""
    import numpy as np

    def arr(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    sd = {k: arr(v) for k, v in _normalize_keys(sd).items()}

    def fold(prefix):
        """conv(+bn) under `prefix` -> flax {'kernel','bias'} (HWIO)."""
        w = sd[prefix + ".conv.weight"]                 # [O,I,kh,kw]
        if prefix + ".bn.weight" in sd:
            g = sd[prefix + ".bn.weight"]
            b = sd[prefix + ".bn.bias"]
            mu = sd[prefix + ".bn.running_mean"]
            var = sd[prefix + ".bn.running_var"]
            s = g / np.sqrt(var + BN_EPS)
            w = w * s[:, None, None, None]
            bias = b - mu * s
        else:
            bias = sd.get(prefix + ".conv.bias",
                          np.zeros(w.shape[0], np.float32))
        return {"conv": {"kernel": w.transpose(2, 3, 1, 0),
                         "bias": bias}}

    def c3(prefix, n):
        p = {"cv1": fold(prefix + ".cv1"), "cv2": fold(prefix + ".cv2"),
             "cv3": fold(prefix + ".cv3")}
        for i in range(n):
            p[f"m{i}"] = {"cv1": fold(f"{prefix}.m.{i}.cv1"),
                          "cv2": fold(f"{prefix}.m.{i}.cv2")}
        return p

    # infer multiples from the checkpoint: stem width + C3(m2) repeat count
    w0 = sd["model.0.conv.weight"].shape[0]             # ch(64)
    gw = w0 / 64.0
    n2 = 1 + max((int(k.split(".")[3]) for k in sd
                  if k.startswith("model.2.m.")), default=0)
    gd = n2 / 3.0
    n_ = lambda n: max(round(n * gd), 1)

    params = {}
    for i in (0, 1, 3, 5, 7, 10, 14, 18, 21):
        params[f"m{i}"] = fold(f"model.{i}")
    for i, n in ((2, 3), (4, 6), (6, 9), (8, 3), (13, 3), (17, 3),
                 (20, 3), (23, 3)):
        params[f"m{i}"] = c3(f"model.{i}", n_(n))
    params["m9"] = {"cv1": fold("model.9.cv1"), "cv2": fold("model.9.cv2")}

    det = None
    for i in (24, 33):                                   # Detect index
        if f"model.{i}.m.0.weight" in sd:
            det = i
            break
    assert det is not None, "Detect head not found in state dict"
    no3 = sd[f"model.{det}.m.0.weight"].shape[0]
    nc = no3 // 3 - 5
    for j in range(3):
        w = sd[f"model.{det}.m.{j}.weight"]
        params[f"det{j}"] = {"kernel": w.transpose(2, 3, 1, 0),
                             "bias": sd[f"model.{det}.m.{j}.bias"]}

    strides = (8, 16, 32)
    if f"model.{det}.anchors" in sd:
        a = sd[f"model.{det}.anchors"]                   # [3,3,2] / stride
        anchors = tuple(tuple((float(a[i, j, 0] * strides[i]),
                               float(a[i, j, 1] * strides[i]))
                              for j in range(3)) for i in range(3))
    else:
        from dani_slam_tpu.models.yolo import ANCHORS
        anchors = ANCHORS

    model = YoloV5Net(num_classes=nc, depth_multiple=gd, width_multiple=gw,
                      dt=compute_dtype)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, {"params": params}, anchors, strides


def load_yolov5_pt(path: str, input_hw: Tuple[int, int] = (384, 640),
                   score_th: float = 0.4):
    """Load a yolov5 checkpoint file (TorchScript archive as the reference
    uses, ultralytics .pt ckpt dict, or a plain state dict) -> yolo.Detector
    ready for the SLAM wiring (reference: src/YoloDetect.cpp:6-20; score
    0.4 matches its non_max_suppression)."""
    import torch

    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "model" in obj:     # ultralytics ckpt
            obj = obj["model"]
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    model, params, anchors, strides = load_yolov5_state_dict(sd)
    from dani_slam_tpu.models.yolo import Detector
    return Detector(params=params, model=model, anchors=anchors,
                    input_hw=input_hw, score_th=score_th)


import functools as _functools


@_functools.lru_cache(maxsize=1)
def load_official_detector():
    """Load the shipped reference-scale detector weights if present
    (dani_slam_tpu/weights/yolo_official_synthetic.npz, produced by
    `python -m dani_slam_tpu.models.yolo_train --official`) — the faithful
    yolov5s graph (depth 0.33 / width 0.50, 80-class head) the reference
    deploys (src/YoloDetect.cpp:9), trained on the synthetic movable-object
    scenes. Returns a yolo.Detector interchangeable with the compact one,
    or None when the weights are absent. Memoized: the state dict is staged
    to device once per process."""
    import os

    import numpy as np

    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "yolo_official_synthetic.npz")
    if not os.path.exists(path):
        return None
    from dani_slam_tpu.models.superpoint_train import load_params
    from dani_slam_tpu.models.yolo import Detector
    data = np.load(path)
    meta = data["__meta__"]
    _, nc, ih, iw = (int(v) for v in meta)
    params = load_params(path)
    params.pop("__meta__", None)
    model = YoloV5Net(num_classes=nc, depth_multiple=0.33,
                      width_multiple=0.50)
    # synthetic scenes label movable=class0 / static=class1; score_th
    # calibrated for THESE weights on held-out scenes (threshold sweep at
    # 1200 steps: P 0.70/R 0.92 at 0.6 — the compact net's 0.75 passes
    # nothing, its score distribution does not transfer to the yolov5s head)
    return Detector(params=params, model=model, input_hw=(ih, iw),
                    dynamic_class_ids=(0,), score_th=0.6)


# ---------------------------------------------------------------------------
# Torch oracle for converter tests (walks the state dict directly)
# ---------------------------------------------------------------------------

def reference_forward_torch(sd: dict, img_nhwc) -> Sequence:
    """Independent torch evaluation of the yolov5 graph from a state dict
    (BN in normalization form, not folded). img_nhwc: numpy [H,W,3] float.
    Returns the three raw head maps as numpy (H,W,3,5+nc) NHWC — the same
    contract as YoloV5Net.__call__ for comparison."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    sd = {k: (v if isinstance(v, torch.Tensor) else torch.tensor(v))
          for k, v in _normalize_keys(sd).items()}
    x = torch.tensor(np.asarray(img_nhwc),
                     dtype=torch.float32).permute(2, 0, 1)[None]

    def conv(x, prefix, s=1):
        w = sd[prefix + ".conv.weight"]
        k = w.shape[-1]
        x = F.conv2d(x, w, None, stride=s,
                     padding=2 if k == 6 else k // 2)
        if prefix + ".bn.weight" in sd:
            x = F.batch_norm(x, sd[prefix + ".bn.running_mean"],
                             sd[prefix + ".bn.running_var"],
                             sd[prefix + ".bn.weight"],
                             sd[prefix + ".bn.bias"], False, 0.0, BN_EPS)
        return F.silu(x)

    def c3(x, prefix, n, shortcut):
        a = conv(x, prefix + ".cv1")
        b = conv(x, prefix + ".cv2")
        for i in range(n):
            y = conv(conv(a, f"{prefix}.m.{i}.cv1"), f"{prefix}.m.{i}.cv2")
            a = a + y if shortcut else y
        return conv(torch.cat([a, b], 1), prefix + ".cv3")

    n2 = 1 + max((int(k.split(".")[3]) for k in sd
                  if k.startswith("model.2.m.")), default=0)
    gd = n2 / 3.0
    n_ = lambda n: max(round(n * gd), 1)

    x = conv(x, "model.0", 2)
    x = conv(x, "model.1", 2)
    x = c3(x, "model.2", n_(3), True)
    x = conv(x, "model.3", 2)
    p3 = c3(x, "model.4", n_(6), True)
    x = conv(p3, "model.5", 2)
    p4 = c3(x, "model.6", n_(9), True)
    x = conv(p4, "model.7", 2)
    x = c3(x, "model.8", n_(3), True)
    # SPPF
    s1 = conv(x, "model.9.cv1")
    y1 = F.max_pool2d(s1, 5, 1, 2)
    y2 = F.max_pool2d(y1, 5, 1, 2)
    y3 = F.max_pool2d(y2, 5, 1, 2)
    x = conv(torch.cat([s1, y1, y2, y3], 1), "model.9.cv2")

    t10 = conv(x, "model.10")
    x = torch.cat([F.interpolate(t10, scale_factor=2, mode="nearest"),
                   p4], 1)
    x = c3(x, "model.13", n_(3), False)
    t14 = conv(x, "model.14")
    x = torch.cat([F.interpolate(t14, scale_factor=2, mode="nearest"),
                   p3], 1)
    o3 = c3(x, "model.17", n_(3), False)
    x = conv(o3, "model.18", 2)
    x = torch.cat([x, t14], 1)
    o4 = c3(x, "model.20", n_(3), False)
    x = conv(o4, "model.21", 2)
    x = torch.cat([x, t10], 1)
    o5 = c3(x, "model.23", n_(3), False)

    det = 24 if "model.24.m.0.weight" in sd else 33
    outs = []
    for j, o in enumerate((o3, o4, o5)):
        h = F.conv2d(o, sd[f"model.{det}.m.{j}.weight"],
                     sd[f"model.{det}.m.{j}.bias"])
        no3 = h.shape[1]
        H, W = h.shape[2], h.shape[3]
        # torch NCHW [1,3*no,H,W] -> NHWC (H,W,3,no), channel = anchor*no+att
        h = h[0].reshape(3, no3 // 3, H, W).permute(2, 3, 0, 1)
        outs.append(h.numpy())
    return outs
