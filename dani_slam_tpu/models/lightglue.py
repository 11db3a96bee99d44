"""LightGlue attention matcher in Flax.

TPU-native re-implementation of the reference's TorchScript LightGlue
(reference: src/LightGlue.cpp:56-94 loads `lightglue_scripted_v2.pt`, feeds
normalized keypoints + descriptors, thresholds match scores at 0.05 —
src/LGmatcher.cpp:324; architecture per the public LightGlue paper,
PAPERS.md: "LightGlue: Local Feature Matching at Light Speed").

Design (TPU-first):
  * fixed-size padded keypoint sets with validity masks (no pruning/early
    exit — XLA gets one static graph; adaptive depth can come later as a
    jax.lax.cond ladder),
  * self-attention with 2-D rotary positional encoding (learned Fourier
    frequencies over normalized coords), cross-attention without positions,
  * dual-softmax assignment with learned matchability gates,
  * bf16 attention matmuls (MXU), f32 softmax/logits.
"""
from __future__ import annotations

import functools as _functools
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG = -1e9


def normalize_keypoints(xy: jax.Array, width: int, height: int) -> jax.Array:
    """Pixels -> [-1,1]-ish coords, aspect preserved (reference:
    LightGlue::normalizeKeypoints src/LightGlue.cpp:28-51)."""
    size = jnp.asarray([width, height], jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size) / 2.0
    return (xy - shift) / scale


def _rotary(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Apply pairwise rotation to features. x: (..., n, d) with d even;
    angles: (..., n, d/2)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape)


class Attention(nn.Module):
    dim: int
    heads: int = 4
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, q_in, kv_in, q_mask, kv_mask, q_angles=None,
                 kv_angles=None):
        D, H = self.dim, self.heads
        hd = D // H
        dt = self.compute_dtype
        # all projection GEMMs in bf16 (params stay f32): matcher scores are
        # gated at 0.05, insensitive to bf16 rounding — and the global
        # "highest" matmul precision (needed by the SLAM geometry) would
        # otherwise run these as 6-pass f32 emulation
        q = nn.Dense(D, name="q", dtype=dt)(q_in)
        k = nn.Dense(D, name="k", dtype=dt)(kv_in)
        v = nn.Dense(D, name="v", dtype=dt)(kv_in)
        if q_angles is not None:
            q = _rotary(q, jnp.tile(q_angles, (1, H)))
            k = _rotary(k, jnp.tile(kv_angles, (1, H)))
        q = q.reshape(q.shape[:-1] + (H, hd)).astype(dt)
        k = k.reshape(k.shape[:-1] + (H, hd)).astype(dt)
        v = v.reshape(v.shape[:-1] + (H, hd)).astype(dt)
        logits = jnp.einsum('...qhd,...khd->...hqk', q, k,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
        logits = jnp.where(kv_mask[..., None, None, :], logits, NEG)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum('...hqk,...khd->...qhd', attn.astype(dt), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(out.shape[:-2] + (D,))
        out = jnp.where(q_mask[..., None], out, 0.0)
        return nn.Dense(D, name="proj", dtype=self.compute_dtype)(out)


class GlueLayer(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, d0, d1, m0, m1, ang0, ang1):
        dt = jnp.bfloat16
        dense = lambda c, name: nn.Dense(c, name=name, dtype=dt)
        # self-attention (with rotary positions)
        sa = Attention(self.dim, self.heads, name="self_attn")
        d0 = d0 + dense(self.dim, "self_mlp0b")(nn.gelu(
            dense(2 * self.dim, "self_mlp0a")(
                jnp.concatenate([d0, sa(d0, d0, m0, m0, ang0, ang0)], -1)))
            ).astype(jnp.float32)
        d1 = d1 + dense(self.dim, "self_mlp1b")(nn.gelu(
            dense(2 * self.dim, "self_mlp1a")(
                jnp.concatenate([d1, sa(d1, d1, m1, m1, ang1, ang1)], -1)))
            ).astype(jnp.float32)
        # cross-attention (shared weights both directions)
        ca = Attention(self.dim, self.heads, name="cross_attn")
        c0 = ca(d0, d1, m0, m1)
        c1 = ca(d1, d0, m1, m0)
        d0 = d0 + dense(self.dim, "cross_mlp0b")(nn.gelu(
            dense(2 * self.dim, "cross_mlp0a")(
                jnp.concatenate([d0, c0], -1)))).astype(jnp.float32)
        d1 = d1 + dense(self.dim, "cross_mlp1b")(nn.gelu(
            dense(2 * self.dim, "cross_mlp1a")(
                jnp.concatenate([d1, c1], -1)))).astype(jnp.float32)
        return d0, d1


class LightGlue(nn.Module):
    """Match two padded keypoint sets.

    Inputs: xy0/xy1 normalized coords (B,N,2), desc0/desc1 (B,N,D_in),
    mask0/mask1 (B,N). Output: log assignment scores (B,N,N) plus
    matchability (B,N) per side.
    """
    dim: int = 128
    depth: int = 6
    heads: int = 4
    input_dim: int = 256

    @nn.compact
    def __call__(self, xy0, xy1, desc0, desc1, mask0, mask1):
        in_proj = nn.Dense(self.dim, name="in_proj")   # shared for both sides
        d0 = in_proj(desc0)
        d1 = in_proj(desc1)
        # learned rotary frequencies over 2D positions
        hd = self.dim // self.heads
        freq = self.param("pos_freq", nn.initializers.normal(1.0),
                          (2, hd // 2))
        ang0 = jnp.einsum('...nj,jk->...nk', xy0, freq) * 6.2832
        ang1 = jnp.einsum('...nj,jk->...nk', xy1, freq) * 6.2832

        for i in range(self.depth):
            d0, d1 = GlueLayer(self.dim, self.heads, name=f"layer{i}")(
                d0, d1, mask0, mask1, ang0, ang1)

        # assignment head
        p0 = nn.Dense(self.dim, name="final_proj0")(d0)
        p1 = nn.Dense(self.dim, name="final_proj1")(d1)
        sim = jnp.einsum('...nd,...md->...nm', p0, p1) / (self.dim ** 0.5)
        sim = jnp.where(mask0[..., :, None] & mask1[..., None, :], sim, NEG)
        # matchability head returns RAW logits (training needs
        # log(1-sigmoid) for unmatched points); scores use log_sigmoid
        z0 = nn.Dense(1, name="match0")(d0)[..., 0]
        z1 = nn.Dense(1, name="match1")(d1)[..., 0]
        # dual-softmax in log space + matchability
        ls_r = jax.nn.log_softmax(sim, axis=-1)
        ls_c = jax.nn.log_softmax(sim, axis=-2)
        scores = (ls_r + ls_c + jax.nn.log_sigmoid(z0)[..., :, None] +
                  jax.nn.log_sigmoid(z1)[..., None, :])
        return scores, z0, z1


class MatcherState:
    """Bundle of params + static config for convenient calls."""

    def __init__(self, params, model: LightGlue, width: int, height: int):
        self.params = params
        self.model = model
        self.width = width
        self.height = height


def load_default_matcher(width: int = 640, height: int = 480,
                         input_dim: int = 256, dim: int = 128,
                         depth: int = 6) -> MatcherState | None:
    """Load the shipped synthetic-homography-trained weights if present
    (dani_slam_tpu/weights/lightglue_synthetic.npz, produced by
    models/lightglue_train.py), else None. The authors' fine-tuned
    TorchScript checkpoint is not public (reference loads it from a
    hard-coded path, src/LightGlue.cpp:9).

    Weights are loaded and staged to device ONCE per process: the ~12 MB
    state dict through a remote transport costs ~200+ ms per transfer, and
    the params are read-only at inference."""
    params, model = _load_default_weights(input_dim, dim, depth)
    if params is None:
        return None
    return MatcherState(params, model, width, height)


@_functools.lru_cache(maxsize=4)
def _load_default_weights(input_dim: int, dim: int, depth: int):
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "lightglue_synthetic.npz")
    if not os.path.exists(path):
        return None, None
    from dani_slam_tpu.models.superpoint_train import load_params
    params = load_params(path)
    model = LightGlue(dim=dim, depth=depth, input_dim=input_dim)
    return params, model


def match_pairs(model: LightGlue, params, xy0, desc0, mask0, xy1, desc1,
                mask1, width: int, height: int, threshold: float = 0.05):
    """Jit-friendly BATCHED matching: xy0/xy1 [B,N,2], desc [B,N,D],
    mask [B,N] -> (idx [B,N] int32 best target per query, score [B,N],
    ok [B,N]) with the reference's accept semantics (mutual + score >= 0.05,
    src/LightGlue.cpp:98-122). One forward for all B pairs — on TPU the B
    covisible-neighbor matches of a keyframe cost one batched MXU program
    instead of B sequential ones (callable INSIDE a larger jitted program —
    no jit wrapper of its own)."""
    xy0n = normalize_keypoints(xy0, width, height)
    xy1n = normalize_keypoints(xy1, width, height)
    scores, _, _ = model.apply(params, xy0n, xy1n, desc0, desc1,
                               mask0, mask1)
    s = jnp.exp(scores)
    idx = jnp.argmax(s, axis=-1)
    best = jnp.max(s, axis=-1)
    rev = jnp.argmax(s, axis=-2)
    # mutual check compares ROW indices (rev values live in [0, N0)), so the
    # arange must span the query axis N0 = s.shape[-2], not the target count
    mutual = jnp.take_along_axis(rev, idx, axis=-1) == jnp.arange(s.shape[-2])
    ok = (mutual & (best >= threshold) & mask0 &
          jnp.take_along_axis(mask1, idx, axis=-1))
    return idx.astype(jnp.int32), best, ok


def match_pair(model: LightGlue, params, xy0, desc0, mask0, xy1, desc1,
               mask1, width: int, height: int, threshold: float = 0.05):
    """Single-pair variant of match_pairs (unbatched [N,...] inputs)."""
    idx, best, ok = match_pairs(model, params, xy0[None], desc0[None],
                                mask0[None], xy1[None], desc1[None],
                                mask1[None], width, height, threshold)
    return idx[0], best[0], ok[0]


def init_matcher(key, width=640, height=480, n=512, input_dim=256,
                 dim=128, depth=6) -> MatcherState:
    model = LightGlue(dim=dim, depth=depth, input_dim=input_dim)
    xy = jnp.zeros((1, n, 2))
    d = jnp.zeros((1, n, input_dim))
    m = jnp.ones((1, n), bool)
    params = model.init(key, xy, xy, d, d, m, m)
    return MatcherState(params, model, width, height)


@partial(jax.jit, static_argnames=("model",))
def _forward(model, params, xy0n, xy1n, d0, d1, m0, m1):
    return model.apply(params, xy0n, xy1n, d0, d1, m0, m1)


def match(ms: MatcherState, xy0, desc0, mask0, xy1, desc1, mask1,
          threshold: float = 0.05):
    """Match two single-image keypoint sets -> (idx [N], score [N], ok [N])
    per query in image0 (reference filter semantics: score >= 0.05 + mutual,
    src/LightGlue.cpp:98-122)."""
    xy0n = normalize_keypoints(xy0, ms.width, ms.height)[None]
    xy1n = normalize_keypoints(xy1, ms.width, ms.height)[None]
    scores, _, _ = _forward(ms.model, ms.params, xy0n, xy1n, desc0[None],
                            desc1[None], mask0[None], mask1[None])
    s = jnp.exp(scores[0])
    idx = jnp.argmax(s, axis=1)
    best = jnp.max(s, axis=1)
    rev = jnp.argmax(s, axis=0)
    mutual = jnp.take(rev, idx) == jnp.arange(s.shape[0])
    ok = mutual & (best >= threshold) & mask0 & jnp.take(mask1, idx)
    return idx.astype(jnp.int32), best, ok
