"""Official-architecture LightGlue in Flax + public-checkpoint converter.

The reference runs the authors' fine-tuned TorchScript LightGlue
(src/LightGlue.cpp:9 loads `lightglue_scripted_v2.pt`); its architecture is
the public cvg/LightGlue release: descriptor_dim=256, 9 transformer layers,
4 heads, fused-QKV self-attention with learnable-Fourier rotary positions,
shared-weight cross-attention, LayerNorm FFNs, and a per-layer assignment
head of which the last is used at full depth.

Our trained matcher (`models/lightglue.py`) is a different (smaller) layout
with per-side MLPs, so it cannot receive the public weights; this module is
the faithful receiving architecture. `load_lightglue_pt` maps a public
checkpoint (TorchScript archive or plain state dict, any of the usual key
prefixes) into it. The output contract matches `lightglue.LightGlue`
(log-assignment scores + matchability logits), so `lightglue.match_pairs`
and the whole SLAM wiring work unchanged with a converted matcher.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG = -1e9


def _rotary_heads(x: jax.Array, ang: jax.Array) -> jax.Array:
    """Rotate consecutive channel pairs of per-head features.
    x: (..., n, H, hd); ang: (..., n, 1, hd/2) — the official encoding
    repeat-interleaves cos/sin by 2, i.e. pair k = channels (2k, 2k+1)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape)


class SelfBlock(nn.Module):
    """Official SelfBlock: fused Wqkv ([h, d, 3] channel layout), rotary on
    q/k, out_proj, then FFN(concat[x, message]) with LayerNorm."""
    dim: int
    heads: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask, ang):
        D, H = self.dim, self.heads
        hd = D // H
        dt = self.compute_dtype
        qkv = nn.Dense(3 * D, name="Wqkv", dtype=dt)(x)
        qkv = qkv.reshape(qkv.shape[:-1] + (H, hd, 3))
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]   # (..., n, H, hd)
        q = _rotary_heads(q, ang)
        k = _rotary_heads(k, ang)
        logits = jnp.einsum('...qhd,...khd->...hqk', q.astype(dt),
                            k.astype(dt),
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
        logits = jnp.where(mask[..., None, None, :], logits, NEG)
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum('...hqk,...khd->...qhd', attn.astype(dt),
                         v.astype(dt), preferred_element_type=jnp.float32)
        ctx = ctx.reshape(ctx.shape[:-2] + (D,))
        msg = nn.Dense(D, name="out_proj", dtype=dt)(ctx)
        y = jnp.concatenate([x, msg.astype(x.dtype)], axis=-1)
        y = nn.Dense(2 * D, name="ffn0", dtype=dt)(y).astype(jnp.float32)
        y = nn.LayerNorm(name="ffn1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(D, name="ffn3", dtype=dt)(y).astype(jnp.float32)
        return x + y


class CrossBlock(nn.Module):
    """Official CrossBlock: shared to_qk for both sides (queries ARE keys),
    bidirectional attention from one similarity matrix, shared to_out + FFN."""
    dim: int
    heads: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x0, x1, m0, m1):
        D, H = self.dim, self.heads
        hd = D // H
        dt = self.compute_dtype
        to_qk = nn.Dense(D, name="to_qk", dtype=dt)
        to_v = nn.Dense(D, name="to_v", dtype=dt)
        heads = lambda t: t.reshape(t.shape[:-1] + (H, hd)).astype(dt)
        qk0 = heads(to_qk(x0))
        qk1 = heads(to_qk(x1))
        v0 = heads(to_v(x0))
        v1 = heads(to_v(x1))
        sim = jnp.einsum('...qhd,...khd->...hqk', qk0, qk1,
                         preferred_element_type=jnp.float32) / (hd ** 0.5)
        l01 = jnp.where(m1[..., None, None, :], sim, NEG)
        l10 = jnp.where(m0[..., None, None, :],
                        jnp.swapaxes(sim, -1, -2), NEG)
        a01 = jax.nn.softmax(l01, axis=-1)
        a10 = jax.nn.softmax(l10, axis=-1)
        ctx0 = jnp.einsum('...hqk,...khd->...qhd', a01.astype(dt), v1,
                          preferred_element_type=jnp.float32)
        ctx1 = jnp.einsum('...hqk,...khd->...qhd', a10.astype(dt), v0,
                          preferred_element_type=jnp.float32)
        to_out = nn.Dense(D, name="to_out", dtype=dt)
        msg0 = to_out(ctx0.reshape(ctx0.shape[:-2] + (D,)))
        msg1 = to_out(ctx1.reshape(ctx1.shape[:-2] + (D,)))
        ffn0 = nn.Dense(2 * D, name="ffn0", dtype=dt)
        ffn1 = nn.LayerNorm(name="ffn1")
        ffn3 = nn.Dense(D, name="ffn3", dtype=dt)

        def ffn(x, msg):
            y = jnp.concatenate([x, msg.astype(x.dtype)], axis=-1)
            y = ffn0(y).astype(jnp.float32)
            y = nn.gelu(ffn1(y), approximate=False)
            return x + ffn3(y).astype(jnp.float32)

        return ffn(x0, msg0), ffn(x1, msg1)


class LightGlueOfficial(nn.Module):
    """Faithful public-LightGlue graph (fixed depth, no token pruning — the
    reference's TorchScript export runs fixed depth too). Same call/return
    contract as `lightglue.LightGlue`: (scores [B,N0,N1], z0 [B,N0],
    z1 [B,N1]) given normalized keypoints, descriptors and validity masks."""
    dim: int = 256
    depth: int = 9
    heads: int = 4
    input_dim: int = 256
    compute_dtype: Any = jnp.bfloat16   # f32 for converter equivalence tests

    @nn.compact
    def __call__(self, xy0, xy1, desc0, desc1, mask0, mask1):
        D, H = self.dim, self.heads
        hd = D // H
        inp = nn.Dense(D, name="input_proj")
        d0 = inp(desc0)
        d1 = inp(desc1)
        # learnable Fourier features: angles = Wr @ xy (no 2*pi factor in
        # the official encoding), identical across heads
        Wr = self.param("posenc_Wr", nn.initializers.normal(1.0),
                        (2, hd // 2))
        ang0 = jnp.einsum('...nj,jk->...nk', xy0, Wr)[..., None, :]
        ang1 = jnp.einsum('...nj,jk->...nk', xy1, Wr)[..., None, :]

        for i in range(self.depth):
            sa = SelfBlock(D, H, name=f"self{i}",      # shared both sides
                           compute_dtype=self.compute_dtype)
            d0 = sa(d0, mask0, ang0)
            d1 = sa(d1, mask1, ang1)
            d0, d1 = CrossBlock(D, H, name=f"cross{i}",
                                compute_dtype=self.compute_dtype)(
                d0, d1, mask0, mask1)

        fp = nn.Dense(D, name="final_proj")            # shared both sides
        p0 = fp(d0) / D ** 0.25
        p1 = fp(d1) / D ** 0.25
        sim = jnp.einsum('...nd,...md->...nm', p0, p1)
        sim = jnp.where(mask0[..., :, None] & mask1[..., None, :], sim, NEG)
        zhead = nn.Dense(1, name="matchability")       # shared both sides
        z0 = zhead(d0)[..., 0]
        z1 = zhead(d1)[..., 0]
        ls_r = jax.nn.log_softmax(sim, axis=-1)
        ls_c = jax.nn.log_softmax(sim, axis=-2)
        scores = (ls_r + ls_c + jax.nn.log_sigmoid(z0)[..., :, None] +
                  jax.nn.log_sigmoid(z1)[..., None, :])
        return scores, z0, z1


# ---------------------------------------------------------------------------
# Public-checkpoint converter
# ---------------------------------------------------------------------------

def _normalize_keys(sd: dict) -> dict:
    """Strip wrapper prefixes ('matcher.', 'model.', ...) so keys start at
    'input_proj./posenc./transformers./log_assignment.'."""
    roots = ("input_proj.", "posenc.", "transformers.", "log_assignment.",
             "token_confidence.")
    out = {}
    for k, v in sd.items():
        kk = k
        for _ in range(4):
            if kk.startswith(roots):
                break
            if "." in kk:
                kk = kk.split(".", 1)[1]
            else:
                break
        out[kk] = v
    return out


def load_lightglue_state_dict(sd: dict, compute_dtype=jnp.bfloat16):
    """Map a public-LightGlue state dict (torch tensors or numpy arrays,
    real layer names) -> (LightGlueOfficial, flax params). Uses the LAST
    log_assignment head (full-depth inference, matching the reference's
    fixed-depth TorchScript export). compute_dtype=f32 for converter
    equivalence tests; bf16 (MXU) for production."""
    import numpy as np

    def arr(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    sd = {k: arr(v) for k, v in _normalize_keys(sd).items()}
    depth = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("transformers."))
    dim = sd["input_proj.weight"].shape[0]
    input_dim = sd["input_proj.weight"].shape[1]
    hd2 = sd["posenc.Wr.weight"].shape[0]           # hd/2
    heads = dim // (2 * hd2)

    def dense(prefix):
        p = {"kernel": sd[prefix + ".weight"].T}
        if prefix + ".bias" in sd:
            p["bias"] = sd[prefix + ".bias"]
        return p

    def lnorm(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    params = {
        "input_proj": dense("input_proj"),
        "posenc_Wr": sd["posenc.Wr.weight"].T,      # torch [hd/2,2] -> [2,hd/2]
    }
    for i in range(depth):
        t = f"transformers.{i}"
        params[f"self{i}"] = {
            "Wqkv": dense(f"{t}.self_attn.Wqkv"),
            "out_proj": dense(f"{t}.self_attn.out_proj"),
            "ffn0": dense(f"{t}.self_attn.ffn.0"),
            "ffn1": lnorm(f"{t}.self_attn.ffn.1"),
            "ffn3": dense(f"{t}.self_attn.ffn.3"),
        }
        params[f"cross{i}"] = {
            "to_qk": dense(f"{t}.cross_attn.to_qk"),
            "to_v": dense(f"{t}.cross_attn.to_v"),
            "to_out": dense(f"{t}.cross_attn.to_out"),
            "ffn0": dense(f"{t}.cross_attn.ffn.0"),
            "ffn1": lnorm(f"{t}.cross_attn.ffn.1"),
            "ffn3": dense(f"{t}.cross_attn.ffn.3"),
        }
    last = f"log_assignment.{depth - 1}"
    params["final_proj"] = dense(f"{last}.final_proj")
    params["matchability"] = dense(f"{last}.matchability")

    model = LightGlueOfficial(dim=dim, depth=depth, heads=heads,
                              input_dim=input_dim,
                              compute_dtype=compute_dtype)
    import jax.numpy as _jnp
    params = jax.tree_util.tree_map(_jnp.asarray, params)
    return model, {"params": params}


def load_lightglue_pt(path: str, width: int = 640, height: int = 480):
    """Load a public LightGlue checkpoint file (TorchScript archive as the
    reference uses, or a plain torch state-dict file) -> MatcherState ready
    for the SLAM wiring (reference: src/LightGlue.cpp:7-12)."""
    import torch

    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    model, params = load_lightglue_state_dict(sd)
    from dani_slam_tpu.models.lightglue import MatcherState
    return MatcherState(params, model, width, height)


import functools as _functools


@_functools.lru_cache(maxsize=2)
def _load_official_weights():
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "lightglue_official_synthetic.npz")
    if not os.path.exists(path):
        return None, None
    from dani_slam_tpu.models.superpoint_train import load_params
    params = load_params(path)
    model = LightGlueOfficial(dim=256, depth=9, input_dim=256)
    return params, model


def load_official_matcher(width: int = 640, height: int = 480):
    """Load the shipped reference-scale matcher weights if present
    (dani_slam_tpu/weights/lightglue_official_synthetic.npz, produced by
    `python -m dani_slam_tpu.models.lightglue_train --official`) — the
    faithful 256-dim x 9-layer architecture the reference deploys
    (src/LightGlue.cpp:9), trained on the synthetic homography task.
    Returns a MatcherState interchangeable with the compact production
    matcher, or None when the weights are absent. Memoized: the ~50 MB
    state dict is staged to device once per process."""
    params, model = _load_official_weights()
    if params is None:
        return None
    from dani_slam_tpu.models.lightglue import MatcherState
    return MatcherState(params, model, width, height)


def reference_forward_torch(sd: dict, xy0n, xy1n, d0, d1):
    """NumPy/torch oracle of the official forward (fixed depth, no pruning)
    for converter tests — computes the final log-assignment inner block the
    way the public implementation does. Inputs are single-pair [N,2]/[N,D]
    normalized arrays; returns scores [N0,N1] (numpy)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    def T(k):
        v = sd[k]
        return v if isinstance(v, torch.Tensor) else torch.tensor(v)

    sd = _normalize_keys(sd)
    depth = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("transformers."))
    dim = T("input_proj.weight").shape[0]
    hd2 = T("posenc.Wr.weight").shape[0]
    heads = dim // (2 * hd2)
    hd = dim // heads

    x0 = torch.tensor(np.asarray(d0), dtype=torch.float32)
    x1 = torch.tensor(np.asarray(d1), dtype=torch.float32)
    k0 = torch.tensor(np.asarray(xy0n), dtype=torch.float32)
    k1 = torch.tensor(np.asarray(xy1n), dtype=torch.float32)

    lin = lambda x, p: F.linear(x, T(p + ".weight"),
                                T(p + ".bias") if p + ".bias" in sd else None)
    x0 = lin(x0, "input_proj")
    x1 = lin(x1, "input_proj")
    ang0 = k0 @ T("posenc.Wr.weight").t()          # [N, hd/2]
    ang1 = k1 @ T("posenc.Wr.weight").t()

    def rot(t, ang):
        # t [N,H,hd]; pairs (2k,2k+1) rotated by ang[...,k]
        c = torch.cos(ang)[:, None, :]
        s = torch.sin(ang)[:, None, :]
        t1 = t[..., 0::2]
        t2 = t[..., 1::2]
        return torch.stack([t1 * c - t2 * s, t1 * s + t2 * c],
                           dim=-1).flatten(-2)

    def self_block(x, ang, t):
        qkv = lin(x, f"{t}.self_attn.Wqkv")
        qkv = qkv.unflatten(-1, (heads, hd, 3))
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q = rot(q, ang)
        k = rot(k, ang)
        attn = torch.softmax(
            torch.einsum('qhd,khd->hqk', q, k) / hd ** 0.5, dim=-1)
        ctx = torch.einsum('hqk,khd->qhd', attn, v).flatten(-2)
        msg = lin(ctx, f"{t}.self_attn.out_proj")
        y = torch.cat([x, msg], -1)
        y = lin(y, f"{t}.self_attn.ffn.0")
        y = F.layer_norm(y, (y.shape[-1],), T(f"{t}.self_attn.ffn.1.weight"),
                         T(f"{t}.self_attn.ffn.1.bias"))
        y = lin(F.gelu(y), f"{t}.self_attn.ffn.3")
        return x + y

    def cross_block(x0, x1, t):
        h = lambda v: v.unflatten(-1, (heads, hd))
        qk0 = h(lin(x0, f"{t}.cross_attn.to_qk"))
        qk1 = h(lin(x1, f"{t}.cross_attn.to_qk"))
        v0 = h(lin(x0, f"{t}.cross_attn.to_v"))
        v1 = h(lin(x1, f"{t}.cross_attn.to_v"))
        sim = torch.einsum('qhd,khd->hqk', qk0, qk1) / hd ** 0.5
        m0 = torch.einsum('hqk,khd->qhd',
                          torch.softmax(sim, -1), v1).flatten(-2)
        m1 = torch.einsum('hqk,khd->qhd',
                          torch.softmax(sim.transpose(-1, -2), -1),
                          v0).flatten(-2)

        def ffn(x, m):
            y = torch.cat([x, lin(m, f"{t}.cross_attn.to_out")], -1)
            y = lin(y, f"{t}.cross_attn.ffn.0")
            y = F.layer_norm(y, (y.shape[-1],),
                             T(f"{t}.cross_attn.ffn.1.weight"),
                             T(f"{t}.cross_attn.ffn.1.bias"))
            return x + lin(F.gelu(y), f"{t}.cross_attn.ffn.3")

        return ffn(x0, m0), ffn(x1, m1)

    for i in range(depth):
        t = f"transformers.{i}"
        x0 = self_block(x0, ang0, t)
        x1 = self_block(x1, ang1, t)
        x0, x1 = cross_block(x0, x1, t)

    last = f"log_assignment.{depth - 1}"
    p0 = lin(x0, f"{last}.final_proj") / dim ** 0.25
    p1 = lin(x1, f"{last}.final_proj") / dim ** 0.25
    sim = torch.einsum('nd,md->nm', p0, p1)
    z0 = lin(x0, f"{last}.matchability")[..., 0]
    z1 = lin(x1, f"{last}.matchability")[..., 0]
    scores = (F.log_softmax(sim, -1) + F.log_softmax(sim, -2) +
              F.logsigmoid(z0)[:, None] + F.logsigmoid(z1)[None, :])
    return scores.numpy()
