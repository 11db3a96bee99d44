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


# ---------------------------------------------------------------------------
# v2: homography-pair training with per-point distinctive micro-texture.
#
# The v1 descriptor loss (integer-cell roll InfoNCE above) cannot produce
# distinctive descriptors: every training blob is the same isotropic
# Gaussian, so patches in different cells are pixel-identical and the only
# separable signal is background noise. Measured on blob scenes at ~13 px
# flow: same-point descriptor distance == nearest-different distance
# (sep frac 0.13) -> mutual-NN precision 69% -> pose optimization falls into
# the zero-motion basin. v2 fixes the DATA (each point gets a unique
# satellite micro-constellation within the descriptor receptive field) and
# the OBJECTIVE (true homography warps; InfoNCE at point locations across
# views, negatives = every other point in the batch). This is the synthetic
# analogue of the MagicLeap recipe's homographic-adaptation stage
# (reference consumes such a checkpoint at src/SPextractor.cpp:86).
# ---------------------------------------------------------------------------

def make_textured_batch(rng: np.random.RandomState, batch: int, h: int,
                        w: int, n_pts: int = 24, n_sub: int = 4):
    """Scenes whose interest points are individually distinguishable: each
    point = dominant central blob + n_sub unique satellite micro-blobs
    within +-6.5 px (inside the descriptor receptive field). Vectorized
    stamping. Returns (images [B,h,w,1], xy [B,n_pts,2], valid [B,n_pts])."""
    imgs = rng.uniform(0.1, 0.25, (batch, h, w)).astype(np.float32)
    imgs += rng.randn(batch, h, w).astype(np.float32) * 0.02
    xs = rng.uniform(10, w - 11, (batch, n_pts)).astype(np.float32)
    ys = rng.uniform(10, h - 11, (batch, n_pts)).astype(np.float32)
    valid = np.ones((batch, n_pts), bool)
    # spot table: central + satellites, flat [batch*n_pts*(1+n_sub)]
    K = 1 + n_sub
    cx = np.repeat(xs[..., None], K, -1)          # [B,n,K]
    cy = np.repeat(ys[..., None], K, -1)
    ang = rng.uniform(0, 2 * np.pi, (batch, n_pts, K))
    rad = rng.uniform(2.5, 6.5, (batch, n_pts, K))
    cx[..., 1:] += (np.cos(ang) * rad)[..., 1:]
    cy[..., 1:] += (np.sin(ang) * rad)[..., 1:]
    amp = rng.uniform(0.25, 0.6, (batch, n_pts, K)).astype(np.float32)
    amp[..., 0] = rng.uniform(0.45, 0.8, (batch, n_pts))
    sig = rng.uniform(0.7, 1.3, (batch, n_pts, K)).astype(np.float32)
    sig[..., 0] = rng.uniform(1.2, 1.8, (batch, n_pts))
    P, r = 9, 4
    off = np.arange(-r, r + 1)
    u0 = np.round(cx).astype(np.int32)
    v0 = np.round(cy).astype(np.int32)
    dx = off[None, None, None, None, :] + (u0 - cx)[..., None, None]
    dy = off[None, None, None, :, None] + (v0 - cy)[..., None, None]
    g = amp[..., None, None] * np.exp(
        -(dx ** 2 + dy ** 2) / (2 * sig[..., None, None] ** 2))
    bb = np.broadcast_to(np.arange(batch)[:, None, None, None, None],
                         g.shape)
    xs_i = (u0[..., None, None] + off[None, None, None, None, :] +
            np.zeros((P, 1), np.int32))
    ys_i = (v0[..., None, None] + off[None, None, None, :, None] +
            np.zeros((1, P), np.int32))
    inb = ((xs_i >= 0) & (xs_i < w) & (ys_i >= 0) & (ys_i < h))
    np.maximum.at(imgs, (bb[inb], np.clip(ys_i, 0, h - 1)[inb],
                         np.clip(xs_i, 0, w - 1)[inb]),
                  (0.2 + g)[inb])
    xy = np.stack([xs, ys], -1)
    return imgs[..., None], xy.astype(np.float32), valid


def sample_homographies_np(rng: np.random.RandomState, batch: int, h: int,
                           w: int, rot_deg: float = 25.0,
                           scale_rng=(0.85, 1.2), trans_frac: float = 0.1,
                           persp: float = 2e-4) -> np.ndarray:
    """Random homographies img0 -> img1 pixel coords [B,3,3]."""
    Hs = np.zeros((batch, 3, 3), np.float32)
    cx, cy = w / 2.0, h / 2.0
    for b in range(batch):
        th = np.deg2rad(rng.uniform(-rot_deg, rot_deg))
        s = rng.uniform(*scale_rng)
        tx = rng.uniform(-trans_frac, trans_frac) * w
        ty = rng.uniform(-trans_frac, trans_frac) * h
        ca, sa = np.cos(th) * s, np.sin(th) * s
        A = np.array([[ca, -sa, 0.0], [sa, ca, 0.0], [0.0, 0.0, 1.0]])
        A[0, 2] = tx + cx - (A[0, 0] * cx + A[0, 1] * cy)
        A[1, 2] = ty + cy - (A[1, 0] * cx + A[1, 1] * cy)
        A[2, 0] = rng.uniform(-persp, persp)
        A[2, 1] = rng.uniform(-persp, persp)
        Hs[b] = A
    return Hs


def train_superpoint_v2(steps: int = 2500, batch: int = 12, h: int = 120,
                        w: int = 120, n_pts: int = 28, lr: float = 1e-3,
                        seed: int = 0, log_every: int = 0,
                        nce_weight: float = 1.0, temp: float = 0.1):
    """Homography-pair training: detector CE on both views + point-level
    cross-view InfoNCE over the whole batch. Returns (params, last_loss)."""
    from dani_slam_tpu.ops.image import remap_bilinear

    rng = np.random.RandomState(seed)
    model = SuperPointLogits()
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, h, w, 1), jnp.float32))
    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.adam(optax.cosine_decay_schedule(lr, steps)))
    ost = opt.init(params)

    def warp_imgs(imgs, Hs):
        Hinv = jnp.linalg.inv(Hs)
        yy, xx = jnp.mgrid[0:h, 0:w]
        p1 = jnp.stack([xx, yy, jnp.ones_like(xx)], 0).astype(
            jnp.float32).reshape(3, -1)

        def one(img, Hi):
            q = Hi @ p1
            return remap_bilinear(img[..., 0], (q[0] / q[2]).reshape(h, w),
                                  (q[1] / q[2]).reshape(h, w))[..., None]
        return jax.vmap(one)(imgs, Hinv)

    def sample_desc(desc_map, xy):
        """Bilinear sample the /8 descriptor map at pixel coords [n,2]."""
        gx = xy[:, 0] / 8.0 - 0.5
        gy = xy[:, 1] / 8.0 - 0.5
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        fx = gx - x0
        fy = gy - y0
        Hc, Wc = desc_map.shape[0], desc_map.shape[1]

        def at(yi, xi):
            return desc_map[jnp.clip(yi, 0, Hc - 1), jnp.clip(xi, 0, Wc - 1)]
        d = (at(y0, x0) * ((1 - fx) * (1 - fy))[:, None] +
             at(y0, x0 + 1) * (fx * (1 - fy))[:, None] +
             at(y0 + 1, x0) * ((1 - fx) * fy)[:, None] +
             at(y0 + 1, x0 + 1) * (fx * fy)[:, None])
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-8)

    @jax.jit
    def step(params, ost, imgs, Hs, labels0, labels1, xy0, xy1, pvalid,
             gain, bias):
        imgs1 = jnp.clip(warp_imgs(imgs, Hs) * gain + bias, 0.0, 1.0)

        def loss_fn(p):
            semi0, desc0 = model.apply(p, imgs)
            semi1, desc1 = model.apply(p, imgs1)
            det = detector_loss(semi0, labels0) + detector_loss(semi1,
                                                                labels1)
            d0 = jax.vmap(sample_desc)(desc0, xy0)      # [B,n,D]
            d1 = jax.vmap(sample_desc)(desc1, xy1)
            B, n, D = d0.shape
            f0 = d0.reshape(B * n, D)
            f1 = d1.reshape(B * n, D)
            pv = pvalid.reshape(B * n)
            sim = (f0 @ f1.T) / temp                    # [Bn,Bn]
            sim = jnp.where(pv[None, :], sim, -1e9)
            simT = jnp.where(pv[:, None], sim, -1e9)
            lab = jnp.arange(B * n)
            ce0 = optax.softmax_cross_entropy_with_integer_labels(sim, lab)
            ce1 = optax.softmax_cross_entropy_with_integer_labels(simT.T,
                                                                  lab)
            nce = (jnp.sum(jnp.where(pv, ce0 + ce1, 0.0)) /
                   jnp.maximum(jnp.sum(pv), 1.0))
            return det + nce_weight * 0.5 * nce
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, ost2 = opt.update(g, ost)
        return optax.apply_updates(params, up), ost2, loss

    loss = None
    for i in range(steps):
        # scene mixture: textured micro-constellation points (descriptor
        # distinctiveness) alternated with plain isotropic blobs (the v1
        # distribution) so the DETECTOR stays calibrated on featureless
        # spots too — v2.0 trained textured-only under-fired on plain blobs
        # (corner recall 46% vs 79%)
        if i % 3 == 2:
            imgs, xy, valid = make_corner_batch(rng, batch, h, w,
                                                n_pts=n_pts)
        else:
            imgs, xy, valid = make_textured_batch(rng, batch, h, w,
                                                  n_pts=n_pts)
        Hs = sample_homographies_np(rng, batch, h, w)
        xy1 = np.einsum('bij,bnj->bni', Hs, np.concatenate(
            [xy, np.ones_like(xy[..., :1])], -1))
        xy1 = xy1[..., :2] / np.maximum(np.abs(xy1[..., 2:]), 1e-9) * \
            np.sign(xy1[..., 2:])
        in1 = ((xy1[..., 0] > 8) & (xy1[..., 0] < w - 9) &
               (xy1[..., 1] > 8) & (xy1[..., 1] < h - 9))
        pvalid = valid & in1
        labels0 = cell_labels(xy, valid, h, w)
        labels1 = cell_labels(xy1.astype(np.float32), pvalid, h, w)
        gain = rng.uniform(0.8, 1.2, (batch, 1, 1, 1)).astype(np.float32)
        bias = rng.uniform(-0.05, 0.05, (batch, 1, 1, 1)).astype(np.float32)
        params, ost, loss = step(
            params, ost, jnp.asarray(imgs), jnp.asarray(Hs),
            jnp.asarray(labels0), jnp.asarray(labels1), jnp.asarray(xy),
            jnp.asarray(xy1.astype(np.float32)), jnp.asarray(pvalid),
            jnp.asarray(gain), jnp.asarray(bias))
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


if __name__ == "__main__":
    import argparse
    import os

    jax.config.update("jax_compilation_cache_dir", "/tmp/dani_slam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "weights",
        "superpoint_synthetic.npz"))
    args = ap.parse_args()
    params, loss = train_superpoint_v2(steps=args.steps, batch=args.batch,
                                       log_every=50)
    save_params(args.out, params)
    print("final loss", loss, "saved", args.out)
