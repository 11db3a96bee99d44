"""Image preprocessing ops: grayscale, resize, pyramid, rectification.

Replaces the reference's OpenCV preprocessing — cv::cvtColor/resize in the
per-frame preamble (src/System.cc:262-279), ComputePyramid
(src/SPextractor.cpp:631-656), and the stereo rectification remap computed by
Settings (src/Settings.cc). Everything here is pure JAX, fixed-shape, and
designed to stay resident on device: a frame is uploaded once as uint8 and
all derived images (gray, pyramid levels, rectified views) live in HBM.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def rgb_to_gray(img: jax.Array) -> jax.Array:
    """RGB (...,H,W,3) uint8/float -> grayscale (...,H,W) float32 in [0,1]."""
    img = img.astype(jnp.float32)
    if img.shape[-1] == 3:
        g = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    else:
        g = img[..., 0]
    return g / 255.0


def to_gray01(img: jax.Array) -> jax.Array:
    """Accept HxW, HxWx1 or HxWx3, uint8 or float; return HxW float32 [0,1]."""
    if img.ndim >= 3 and img.shape[-1] in (1, 3):
        return rgb_to_gray(img)
    img = img.astype(jnp.float32)
    return jnp.where(jnp.max(img) > 1.5, img / 255.0, img)


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of (H,W) or (H,W,C) via jax.image (XLA gathers fuse
    well; a Pallas version is not profitable — this is bandwidth-bound)."""
    shape = (out_h, out_w) + img.shape[2:]
    return jax.image.resize(img, shape, method="bilinear")


@partial(jax.jit, static_argnames=("n_levels", "scale"))
def gaussian_pyramid(img: jax.Array, n_levels: int, scale: float = 1.2):
    """Image pyramid as a list of arrays (static shapes per level).

    Reference: SPextractor::ComputePyramid (src/SPextractor.cpp:631-656)
    builds nLevels scaled copies with border padding for the cell scan; here
    levels are plain scaled images (the NMS/grid logic handles borders by
    masking instead of padding).
    """
    H, W = img.shape[:2]
    levels = [img]
    for lv in range(1, n_levels):
        s = scale ** lv
        levels.append(resize_bilinear(img, int(round(H / s)), int(round(W / s))))
    return levels


def remap_bilinear(img: jax.Array, map_x: jax.Array, map_y: jax.Array
                   ) -> jax.Array:
    """cv::remap equivalent: sample img at float coords (map_x, map_y).

    Used for stereo rectification (reference: Settings computes M1l/M2l/...
    maps, applied at src/System.cc:262-270).
    """
    H, W = img.shape[:2]
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = map_x - x0
    fy = map_y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    def g(yi, xi):
        return img[yi, xi]

    v00, v01 = g(y0i, x0i), g(y0i, x1i)
    v10, v11 = g(y1i, x0i), g(y1i, x1i)
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    inside = ((map_x >= 0) & (map_x <= W - 1) & (map_y >= 0) & (map_y <= H - 1))
    if img.ndim == 3:
        inside = inside[..., None]
    return jnp.where(inside, out, 0.0)


def depth_from_encoded(depth_raw: jax.Array, depth_factor: float) -> jax.Array:
    """Decode 16-bit TUM-style depth to meters (reference: DepthMapFactor,
    Examples/RGB-D/TUM3.yaml:35, applied in Tracking::GrabImageRGBD)."""
    d = depth_raw.astype(jnp.float32) / depth_factor
    return jnp.where(d <= 0, jnp.inf, d)
