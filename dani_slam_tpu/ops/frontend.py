"""Keypoint selection front-end: NMS, spatially-balanced top-k, dynamic-area
suppression, descriptor sampling.

This is the TPU-shaped equivalent of the reference's extraction pipeline
(reference: SPDetector::getKeyPoints + NMS2 grid suppression
src/SuperPoint.cpp:211-243,277-363; two-threshold cell scan
src/SPextractor.cpp:248-304; DistributeOctTree quad-tree balancing
src/SPextractor.cpp:405-629; dynamic-area keypoint deletion
src/SPextractor.cpp:314-352).

Re-design rationale (SURVEY.md §7 "hard parts"): the quad-tree is inherently
sequential; the TPU equivalent is per-cell top-k — divide the image into a
fixed grid, keep the best k responses per cell (spatial spread), then fill to
the global budget by score. Everything is fixed-shape: the output is always
(N, ...) with a validity mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def nms_heatmap(heat: jax.Array, radius: int = 4) -> jax.Array:
    """Zero out non-local-maxima within a (2r+1)^2 window (reference: NMS2
    dist_thresh=4, src/SuperPoint.cpp:277-363). Ties keep all — downstream
    top-k breaks them by scan order, matching the grid-suppression effect."""
    k = 2 * radius + 1
    m = jax.lax.reduce_window(heat, -jnp.inf, jax.lax.max, (k, k), (1, 1),
                              "SAME")
    return jnp.where(heat >= m, heat, 0.0)


@partial(jax.jit,
         static_argnames=("n_max", "cell", "k_cell", "border", "nms_radius"))
def select_keypoints(heat: jax.Array, n_max: int = 1024, threshold: float = 0.007,
                     cell: int = 16, k_cell: int = 8, border: int = 8,
                     nms_radius: int = 4):
    """Select up to n_max spatially-spread keypoints from a heatmap.

    Returns (xy [n_max,2] float32 (x,y), score [n_max], valid [n_max] bool),
    sorted by descending score. Semantics vs reference: NMS2 + per-cell
    two-threshold scan + DistributeOctTree are approximated by NMS + per-cell
    top-k_cell + global top-n_max over the cell survivors with a score
    threshold (probability threshold, e.g. minThFAST=0.007,
    Examples/RGB-D/TUM3.yaml:53-54).
    """
    H, W = heat.shape
    h = nms_heatmap(heat, nms_radius)

    # border suppression (reference: EDGE_THRESHOLD=19 border,
    # SPextractor.cpp:229-246; we use a configurable border)
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = ((xx >= border) & (xx < W - border) &
           (yy >= border) & (yy < H - border))
    h = jnp.where(inb, h, 0.0)

    # pad to cell multiples
    Hp = -(-H // cell) * cell
    Wp = -(-W // cell) * cell
    hp = jnp.pad(h, ((0, Hp - H), (0, Wp - W)))
    nCy, nCx = Hp // cell, Wp // cell

    # per-cell top-k
    cells = hp.reshape(nCy, cell, nCx, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(nCy * nCx, cell * cell)
    cs, ci = jax.lax.top_k(cells, k_cell)              # [nCells, k_cell]

    # reconstruct pixel coords of candidates
    cell_ids = jnp.arange(nCy * nCx)[:, None]
    cy = (cell_ids // nCx) * cell + ci // cell
    cx = (cell_ids % nCx) * cell + ci % cell

    flat_s = cs.reshape(-1)
    flat_x = cx.reshape(-1)
    flat_y = cy.reshape(-1)

    # global top-n_max among candidates
    n_cand = flat_s.shape[0]
    if n_cand < n_max:
        flat_s = jnp.pad(flat_s, (0, n_max - n_cand))
        flat_x = jnp.pad(flat_x, (0, n_max - n_cand))
        flat_y = jnp.pad(flat_y, (0, n_max - n_cand))
    # argsort, not lax.top_k: TPU top_k lowers to sequential selection
    # (~10 ms at these sizes; full sort is ~0.1 ms — core/state.free_slots)
    top_i = jnp.argsort(-flat_s)[:n_max]
    top_s = jnp.take(flat_s, top_i)
    xy = jnp.stack([jnp.take(flat_x, top_i), jnp.take(flat_y, top_i)],
                   axis=-1).astype(jnp.float32)
    valid = top_s > threshold
    return xy, top_s, valid


def suppress_in_boxes(xy: jax.Array, valid: jax.Array, boxes: jax.Array,
                      box_mask: jax.Array) -> jax.Array:
    """Invalidate keypoints inside any active dynamic box.

    boxes: [B,4] (x1,y1,x2,y2); box_mask: [B] bool. Reference: keypoints
    falling inside YOLO dynamic-class boxes are deleted before entering the
    pipeline (src/SPextractor.cpp:314-352); here it's a mask update.
    """
    x, y = xy[..., 0], xy[..., 1]
    inside = ((x[..., None] >= boxes[..., 0]) & (x[..., None] <= boxes[..., 2]) &
              (y[..., None] >= boxes[..., 1]) & (y[..., None] <= boxes[..., 3]))
    hit = jnp.any(inside & box_mask, axis=-1)
    return valid & ~hit


def sample_descriptors(desc_map: jax.Array, xy: jax.Array, stride: int = 8
                       ) -> jax.Array:
    """Bilinearly sample the dense descriptor map at keypoint pixel coords
    and re-normalize (reference: SPDetector::computeDescriptors
    src/SuperPoint.cpp:246-274 — grid_sampler + renorm).

    desc_map: (Hc, Wc, D) at 1/stride resolution; xy: (N,2) pixel coords.
    Implemented as gather-4 + lerp; on TPU this is a small gather — the heavy
    lifting (the conv tower) already ran on the MXU.
    """
    Hc, Wc, D = desc_map.shape
    # map pixel centers to descriptor-grid coords (align with stride centers)
    gx = (xy[..., 0] + 0.5) / stride - 0.5
    gy = (xy[..., 1] + 0.5) / stride - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = (gx - x0)[..., None]
    fy = (gy - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, Wc - 1)
    x1i = jnp.clip(x0i + 1, 0, Wc - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, Hc - 1)
    y1i = jnp.clip(y0i + 1, 0, Hc - 1)
    v00 = desc_map[y0i, x0i]
    v01 = desc_map[y0i, x1i]
    v10 = desc_map[y1i, x0i]
    v11 = desc_map[y1i, x1i]
    d = ((v00 * (1 - fx) + v01 * fx) * (1 - fy) +
         (v10 * (1 - fx) + v11 * fx) * fy)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-8)


def extract_multiscale(params, gray: jax.Array, n_max: int = 1024,
                       n_levels: int = 3, scale_factor: float = 1.2,
                       threshold: float = 0.007):
    """Multi-level pyramid extraction (reference: SPextractor runs SuperPoint
    once per pyramid level and rescales keypoints back to level-0 coords,
    src/SPextractor.cpp:130-217; per-level target counts via the scale-factor
    geometric series, SPextractor.cpp:115-127).

    Returns dict(xy, score, desc, valid, octave) with per-level budgets
    n_max * (1/s^l) / sum and keypoints in level-0 pixel coordinates.
    """
    from dani_slam_tpu.models import superpoint
    from dani_slam_tpu.ops import image as image_ops

    levels = image_ops.gaussian_pyramid(gray, n_levels, scale_factor)
    inv = [scale_factor ** -l for l in range(n_levels)]
    denom = sum(inv)
    budgets = [max(int(round(n_max * w / denom)), 1) for w in inv]
    budgets[0] += n_max - sum(budgets)     # exact total

    outs = []
    for lvl, (img, budget) in enumerate(zip(levels, budgets)):
        heat, dm = superpoint.apply(params, img)
        out = extract(heat, dm, n_max=budget, threshold=threshold)
        s = scale_factor ** lvl
        outs.append(dict(
            xy=out["xy"] * s, score=out["score"], desc=out["desc"],
            valid=out["valid"],
            octave=jnp.full((budget,), lvl, jnp.int8)))
    return {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}


@partial(jax.jit, static_argnames=("n_max",))
def extract(heat: jax.Array, desc_map: jax.Array, n_max: int = 1024,
            threshold: float = 0.007, boxes: jax.Array | None = None,
            box_mask: jax.Array | None = None):
    """Full extraction: heatmap + dense descriptors -> fixed-size keypoint set.

    Returns dict(xy [N,2], score [N], desc [N,D], valid [N]).
    """
    xy, score, valid = select_keypoints(heat, n_max=n_max, threshold=threshold)
    if boxes is not None:
        valid = suppress_in_boxes(xy, valid, boxes, box_mask)
    desc = sample_descriptors(desc_map, xy)
    return dict(xy=xy, score=score, desc=desc, valid=valid)
