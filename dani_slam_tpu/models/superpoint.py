"""SuperPoint feature network in Flax.

TPU-native re-implementation of the reference's LibTorch SuperPoint module
(reference: src/SuperPoint.cpp:56-99 — VGG encoder conv1a..conv4b with
64/64/128/128 channels, a 65-channel detector head softmaxed and
pixel-shuffled to a full-resolution heatmap, and a 256-D descriptor head).

Design notes (TPU-first):
  * NHWC layout, bfloat16 conv compute with float32 accumulation — convs map
    onto the MXU; batch norm is absent (as in SuperPoint), ReLU fuses.
  * The whole forward runs on padded static shapes (H, W multiples of 8).
  * The reference runs the net once per pyramid level in a loop
    (src/SPextractor.cpp:219-246); here levels are independent calls (or a
    batch if same shape) — XLA pipelines them.
  * Weights: the authors' fine-tuned checkpoint is not in the reference repo
    (hard-coded external path, src/SPextractor.cpp:86); `load_magicleap_pt`
    converts the public MagicLeap SuperPoint checkpoint when available,
    otherwise deterministic random init keeps the pipeline runnable.
"""
from __future__ import annotations

import functools as _functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class SuperPoint(nn.Module):
    """SuperPoint: gray image (B,H,W,1) -> (heatmap (B,H,W), dense
    descriptors (B,H/8,W/8,256) L2-normalized)."""
    descriptor_dim: int = 256
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array):
        dt = self.compute_dtype
        conv = lambda c, k, name: nn.Conv(
            c, (k, k), padding="SAME", dtype=dt, param_dtype=jnp.float32,
            name=name)
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        x = x.astype(dt)

        x = nn.relu(conv(64, 3, "conv1a")(x))
        x = nn.relu(conv(64, 3, "conv1b")(x))
        x = pool(x)
        x = nn.relu(conv(64, 3, "conv2a")(x))
        x = nn.relu(conv(64, 3, "conv2b")(x))
        x = pool(x)
        x = nn.relu(conv(128, 3, "conv3a")(x))
        x = nn.relu(conv(128, 3, "conv3b")(x))
        x = pool(x)
        x = nn.relu(conv(128, 3, "conv4a")(x))
        feat = nn.relu(conv(128, 3, "conv4b")(x))       # (B, H/8, W/8, 128)

        # Detector head: 65 = 8*8 cells + dustbin (SuperPoint.cpp:72-79)
        cPa = nn.relu(conv(256, 3, "convPa")(feat))
        semi = conv(65, 1, "convPb")(cPa).astype(jnp.float32)
        prob = jax.nn.softmax(semi, axis=-1)[..., :64]   # drop dustbin
        B, Hc, Wc, _ = prob.shape
        # pixel shuffle 8x8 -> (B, H, W)
        heat = prob.reshape(B, Hc, Wc, 8, 8)
        heat = heat.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)

        # Descriptor head (SuperPoint.cpp:88-97)
        cDa = nn.relu(conv(256, 3, "convDa")(feat))
        desc = conv(self.descriptor_dim, 1, "convDb")(cDa).astype(jnp.float32)
        desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-8)
        return heat, desc


def init_params(key: jax.Array, h: int = 480, w: int = 640) -> Any:
    model = SuperPoint()
    return model.init(key, jnp.zeros((1, h, w, 1), jnp.float32))


_TORCH_TO_FLAX = {
    # torch module name -> flax param name (identical layer names)
    n: n for n in ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
                   "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
}


def load_magicleap_pt(path: str) -> Any:
    """Convert a public SuperPoint PyTorch checkpoint (MagicLeap layout:
    state_dict with conv1a.weight [out,in,kh,kw] ...) into flax params.

    Works with plain `.pth` state dicts; falls back to raising so callers can
    decide to random-init instead.
    """
    import torch  # CPU torch is available in the image

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    for tname, fname in _TORCH_TO_FLAX.items():
        w = sd[f"{tname}.weight"].numpy()       # (out, in, kh, kw)
        b = sd[f"{tname}.bias"].numpy()
        params[fname] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # (kh,kw,in,out)
            "bias": jnp.asarray(b),
        }
    return {"params": params}


@_functools.lru_cache(maxsize=1)
def load_default_params() -> Any:
    """Load the shipped synthetic-corner-trained weights if present
    (dani_slam_tpu/weights/superpoint_synthetic.npz, produced by
    models/superpoint_train.py), else None. The authors' fine-tuned
    checkpoint is not public (reference loads it from a hard-coded external
    path, src/SPextractor.cpp:86); these weights make the image pipeline
    functional out of the box, and load_magicleap_pt converts the public
    checkpoint when available. Memoized: the device transfer of the state
    dict is paid once per process (params are read-only at inference)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "superpoint_synthetic.npz")
    if not os.path.exists(path):
        return None
    from dani_slam_tpu.models.superpoint_train import load_params
    return load_params(path)


def apply(params: Any, gray: jax.Array):
    """Convenience single-image forward: gray (H,W) [0,1] -> (heat (H,W),
    desc (H/8,W/8,256))."""
    heat, desc = SuperPoint().apply(params, gray[None, ..., None])
    return heat[0], desc[0]
