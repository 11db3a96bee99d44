"""SuperPoint training on synthetic corner data.

The reference ships no weights (hard-coded external checkpoint paths,
src/SPextractor.cpp:86); this module reproduces the MagicLeap recipe's first
stage — supervised detector training on synthetic shapes with known corner
ground truth — plus a descriptor contrastive term across warped views, so
the repo's image pipeline is functional out of the box. Runs on CPU in
minutes at reduced width; the sharded multi-chip variant of the step lives
in parallel/train.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dani_slam_tpu.models.superpoint import SuperPoint


# ---------------------------------------------------------------------------
# Synthetic corner images (host-side numpy generator)
# ---------------------------------------------------------------------------

def make_corner_batch(rng: np.random.RandomState, batch: int, h: int, w: int,
                      n_pts: int = 24, shift=(0, 0)):
    """Random bright spots on noisy backgrounds; returns (images [B,H,W,1],
    corner coords [B,n_pts,2] (x,y), valid [B,n_pts])."""
    imgs = rng.uniform(0.1, 0.25, (batch, h, w)).astype(np.float32)
    imgs += rng.randn(batch, h, w).astype(np.float32) * 0.02
    xs = rng.uniform(6, w - 7, (batch, n_pts)).astype(np.float32) + shift[1]
    ys = rng.uniform(6, h - 7, (batch, n_pts)).astype(np.float32) + shift[0]
    valid = (xs > 4) & (xs < w - 5) & (ys > 4) & (ys < h - 5)
    yy, xx = np.mgrid[0:h, 0:w]
    for b in range(batch):
        for i in range(n_pts):
            if not valid[b, i]:
                continue
            du = xx - xs[b, i]
            dv = yy - ys[b, i]
            m = (np.abs(du) < 5) & (np.abs(dv) < 5)
            amp = rng.uniform(0.4, 0.8)
            g = amp * np.exp(-(du ** 2 + dv ** 2) / (2 * 1.5 ** 2))
            imgs[b] = np.where(m, np.maximum(imgs[b], 0.2 + g), imgs[b])
    xy = np.stack([xs, ys], -1)
    return (imgs[..., None], xy.astype(np.float32), valid)


def cell_labels(xy: np.ndarray, valid: np.ndarray, h: int, w: int):
    """Corner coords -> per-cell 65-class labels (8x8 cells; 64 = dustbin)
    matching the detector head's pixel-shuffle layout."""
    hc, wc = h // 8, w // 8
    lab = np.full((xy.shape[0], hc, wc), 64, np.int32)
    for b in range(xy.shape[0]):
        for i in range(xy.shape[1]):
            if not valid[b, i]:
                continue
            x, y = xy[b, i]
            cx, cy = int(x) // 8, int(y) // 8
            if 0 <= cx < wc and 0 <= cy < hc:
                lab[b, cy, cx] = (int(y) % 8) * 8 + (int(x) % 8)
    return lab


# ---------------------------------------------------------------------------
# Losses + training step
# ---------------------------------------------------------------------------

def detector_loss(semi_logits, labels):
    """Cross-entropy over the 65-way cell classification (SuperPoint's
    supervised detector objective)."""
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        semi_logits, labels))


import flax.linen as nn


class SuperPointLogits(nn.Module):
    """SuperPoint trunk exposing raw 65-ch detector logits (layer names are
    IDENTICAL to models.superpoint.SuperPoint, so trained params transfer
    verbatim to the inference module)."""
    descriptor_dim: int = 256
    compute_dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.compute_dtype
        conv = lambda c, k, name: nn.Conv(
            c, (k, k), padding="SAME", dtype=dt, param_dtype=jnp.float32,
            name=name)
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        y = x.astype(dt)
        y = nn.relu(conv(64, 3, "conv1a")(y))
        y = nn.relu(conv(64, 3, "conv1b")(y))
        y = pool(y)
        y = nn.relu(conv(64, 3, "conv2a")(y))
        y = nn.relu(conv(64, 3, "conv2b")(y))
        y = pool(y)
        y = nn.relu(conv(128, 3, "conv3a")(y))
        y = nn.relu(conv(128, 3, "conv3b")(y))
        y = pool(y)
        y = nn.relu(conv(128, 3, "conv4a")(y))
        feat = nn.relu(conv(128, 3, "conv4b")(y))
        cPa = nn.relu(conv(256, 3, "convPa")(feat))
        semi = conv(65, 1, "convPb")(cPa).astype(jnp.float32)
        cDa = nn.relu(conv(256, 3, "convDa")(feat))
        desc = conv(self.descriptor_dim, 1, "convDb")(cDa).astype(jnp.float32)
        desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-8)
        return semi, desc


def train_superpoint(steps: int = 800, batch: int = 8, h: int = 96,
                     w: int = 96, lr: float = 1e-3, seed: int = 0,
                     log_every: int = 0):
    """Train and return flax params (full-size SuperPoint)."""
    rng = np.random.RandomState(seed)
    model = SuperPointLogits()
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, h, w, 1), jnp.float32))
    opt = optax.adam(lr)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost, imgs, labels, imgs_s, labels_s, shift_cells):
        def loss_fn(p):
            semi, desc = model.apply(p, imgs)
            semi_s, desc_s = model.apply(p, imgs_s)
            det = detector_loss(semi, labels) + detector_loss(semi_s,
                                                              labels_s)
            # descriptor consistency: cells shifted by whole cells must keep
            # their descriptor; different cells should differ (InfoNCE over
            # the cell grid)
            B, Hc, Wc, D = desc.shape
            d0 = desc.reshape(B, -1, D)
            d1 = jnp.roll(desc_s, (-shift_cells[0], -shift_cells[1]),
                          axis=(1, 2)).reshape(B, -1, D)
            sim = jnp.einsum('bnd,bmd->bnm', d0, d1) / 0.1
            lab = jnp.arange(Hc * Wc)[None].repeat(B, 0)
            nce = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                sim, lab))
            return det + 0.2 * nce
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, ost2 = opt.update(g, ost)
        return optax.apply_updates(params, up), ost2, loss

    loss = None
    for i in range(steps):
        shift = (8 * rng.randint(0, 2), 8 * rng.randint(0, 2))
        imgs, xy, valid = make_corner_batch(rng, batch, h, w)
        labels = cell_labels(xy, valid, h, w)
        # shifted view: the SAME scene displaced by whole cells (descriptor
        # consistency target is exact under the roll)
        imgs_s = np.roll(imgs, (shift[0], shift[1]), axis=(1, 2))
        xy_sh = xy + np.asarray([shift[1], shift[0]], np.float32)
        valid_sh = valid & (xy_sh[..., 0] < w - 5) & (xy_sh[..., 1] < h - 5)
        labels_s = cell_labels(xy_sh, valid_sh, h, w)
        params, ost, loss = step(params, ost, jnp.asarray(imgs),
                                 jnp.asarray(labels), jnp.asarray(imgs_s),
                                 jnp.asarray(labels_s),
                                 (shift[0] // 8, shift[1] // 8))
        if log_every and i % log_every == 0:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    return params, float(loss)


def save_params(path: str, params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez_compressed(path, **{
        "/".join(str(k.key) for k in kp): np.asarray(v)
        for kp, v in flat})


def load_params(path: str):
    data = np.load(path)
    out = {}
    for k in data.files:
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(data[k])
    return out
