"""Two-view reconstruction: vmapped RANSAC for monocular initialization.

Reference: src/TwoViewReconstruction.cc (930 LoC) — 8-point fundamental +
4-point homography RANSAC in two std::threads, score-ratio model selection,
ReconstructF/ReconstructH motion recovery, CheckRT triangulation census;
invoked via Pinhole::ReconstructWithTwoViews (src/CameraModels/Pinhole.cpp:83)
from Tracking::MonocularInitialization (src/Tracking.cc:2468-2545).

TPU-first re-design: instead of an iterative RANSAC loop with early exit,
ALL hypotheses are evaluated at once — sample B 8-point sets, solve B
essential matrices as one batched SVD, score all B x N residuals as one
masked matmul pass, argmax. Calibrated formulation: we work on normalized
camera rays (K is known), so the 8-point solve yields E directly; the
homography path (planar/low-parallax scenes) runs the same way with 4-point
DLT, and model selection compares robust scores like the reference's
SH/(SH+SF) heuristic. Motion recovery tests the 4 E decompositions (or 8 H
motions) with a vectorized cheirality census — the reference's CheckRT loop
becomes a masked reduction.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie


class TwoViewResult(NamedTuple):
    R21: jax.Array        # (3,3) pose of view2 wrt view1 (maps v1-coords to v2)
    t21: jax.Array        # (3,) unit-norm translation
    pts3d: jax.Array      # [N,3] triangulated points (view-1 frame)
    inliers: jax.Array    # [N] bool (triangulation census survivors)
    n_inliers: jax.Array  # [] int32
    ok: jax.Array         # [] bool — reconstruction accepted
    used_h: jax.Array     # [] bool — homography model chosen


def _eight_point(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Batched 8-point essential/fundamental solve on (B,8,3) ray pairs.
    Returns (B,3,3) E with the singular-value constraint enforced."""
    x1, y1, z1 = r1[..., 0], r1[..., 1], r1[..., 2]
    x2, y2, z2 = r2[..., 0], r2[..., 1], r2[..., 2]
    A = jnp.stack([x2 * x1, x2 * y1, x2 * z1,
                   y2 * x1, y2 * y1, y2 * z1,
                   z2 * x1, z2 * y1, z2 * z1], axis=-1)     # (B,8,9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[..., 8, :].reshape(r1.shape[:-2] + (3, 3))
    # project onto essential manifold: sv = (s,s,0)
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) / 2
    Sfix = jnp.zeros_like(E).at[..., 0, 0].set(s).at[..., 1, 1].set(s)
    return U @ Sfix @ Vt2


def _four_point_h(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Batched 4-point homography DLT on (B,4,3) normalized rays (z=1)."""
    x1 = r1[..., 0] / r1[..., 2]
    y1 = r1[..., 1] / r1[..., 2]
    x2 = r2[..., 0] / r2[..., 2]
    y2 = r2[..., 1] / r2[..., 2]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    row1 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    row2 = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], axis=-1)
    A = jnp.concatenate([row1, row2], axis=-2)               # (B,8,9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[..., 8, :].reshape(r1.shape[:-2] + (3, 3))


def _sampson_sq(E: jax.Array, r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Squared Sampson distance of all pairs under each model.
    E: (B,3,3); r1,r2: (N,3) -> (B,N)."""
    Ex1 = jnp.einsum('bij,nj->bni', E, r1)
    Etx2 = jnp.einsum('bji,nj->bni', E, r2)
    x2Ex1 = jnp.einsum('ni,bni->bn', r2, Ex1)
    den = (Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 +
           Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2)
    return x2Ex1 ** 2 / jnp.maximum(den, 1e-12)


def _h_transfer_sq(H: jax.Array, r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Symmetric squared transfer error of H on normalized coords (B,N)."""
    def transfer(H, a, b):
        p = jnp.einsum('bij,nj->bni', H, a)
        px = p[..., 0] / jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
        py = p[..., 1] / jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
        bx = b[..., 0] / b[..., 2]
        by = b[..., 1] / b[..., 2]
        return (px - bx[None]) ** 2 + (py - by[None]) ** 2
    Hinv = jnp.linalg.inv(H)
    return transfer(H, r1, r2) + transfer(Hinv, r2, r1)


def decompose_essential(E: jax.Array):
    """E -> 4 candidate (R, t): (Ra,t),(Ra,-t),(Rb,t),(Rb,-t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    d1 = jnp.linalg.det(U)[..., None, None]
    d2 = jnp.linalg.det(Vt)[..., None, None]
    U = U * jnp.sign(d1)
    Vt = Vt * jnp.sign(d2)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True).clip(1e-12)
    Rs = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def _check_rt(R21, t21, r1, r2, pair_mask, max_err_sq, min_parallax_cos):
    """Cheirality + reprojection census for one motion hypothesis
    (reference: TwoViewReconstruction::CheckRT). Returns (good [N] bool,
    pts3d [N,3], n_good, parallax_ok)."""
    X = _cam.triangulate_two_view(r1, r2, R21, t21)
    z1 = X[..., 2]
    X2 = lie.se3_apply(R21, t21, X)
    z2 = X2[..., 2]
    # reprojection residual in normalized coords
    e1 = ((X[..., 0] / jnp.where(z1 == 0, 1e-12, z1) - r1[..., 0] / r1[..., 2]) ** 2 +
          (X[..., 1] / jnp.where(z1 == 0, 1e-12, z1) - r1[..., 1] / r1[..., 2]) ** 2)
    e2 = ((X2[..., 0] / jnp.where(z2 == 0, 1e-12, z2) - r2[..., 0] / r2[..., 2]) ** 2 +
          (X2[..., 1] / jnp.where(z2 == 0, 1e-12, z2) - r2[..., 1] / r2[..., 2]) ** 2)
    # parallax between rays to the point
    C2 = -jnp.einsum('ji,j->i', R21, t21)            # cam2 center in v1 frame
    d1 = X
    d2 = X - C2
    cosp = jnp.einsum('ni,ni->n', d1, d2) / (
        jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1)).clip(1e-12)
    good = (pair_mask & (z1 > 0) & (z2 > 0) & (e1 < max_err_sq) &
            (e2 < max_err_sq) & (cosp < 0.99998))
    # parallax of the 50th-best point must be sufficient (reference takes a
    # percentile-ish "min(50th) parallax" check)
    cosp_good = jnp.where(good, cosp, 1.0)
    n_good = jnp.sum(good.astype(jnp.int32))
    kth = jnp.sort(cosp_good)[jnp.minimum(50, cosp_good.shape[0] - 1)]
    parallax_ok = kth < min_parallax_cos
    return good, X, n_good, parallax_ok


@partial(jax.jit, static_argnames=("n_hypo",))
def two_view_init(key, rays1, rays2, pair_mask, focal: jax.Array,
                  n_hypo: int = 256, th_px: float = 3.84 ** 0.5,
                  min_inlier_frac: float = 0.5, min_matches: int = 50,
                  min_parallax_deg: float = 1.0) -> TwoViewResult:
    """Full monocular initialization from matched rays.

    rays1/rays2: [N,3] unprojected (z=1) matched keypoint rays; pair_mask [N];
    focal: pixel focal length (converts the pixel threshold to normalized
    units). Evaluates n_hypo 8-point E models and n_hypo 4-point H models in
    parallel; picks H when its robust score dominates (planar/low-parallax),
    mirroring the SH/(SH+SF)>0.4 selection.
    """
    N = rays1.shape[0]
    th_norm_sq = (th_px / focal) ** 2
    k1, k2 = jax.random.split(key)
    # hypothesis sampling: random indices weighted toward valid pairs — invalid
    # picks are tolerated (their models score poorly)
    p = pair_mask.astype(jnp.float32) + 1e-6
    idx_e = jax.random.categorical(
        k1, jnp.log(p)[None, None, :].repeat(n_hypo, 1).reshape(n_hypo, 1, N)
        .repeat(8, 1), axis=-1)                       # (n_hypo, 8)
    idx_h = jax.random.categorical(
        k2, jnp.log(p)[None, None, :].repeat(n_hypo, 1).reshape(n_hypo, 1, N)
        .repeat(4, 1), axis=-1)                       # (n_hypo, 4)

    # ----- Essential branch -----
    E = _eight_point(rays1[idx_e], rays2[idx_e])
    d_e = _sampson_sq(E, rays1, rays2)                # (B,N)
    inl_e = (d_e < th_norm_sq) & pair_mask[None]
    # robust score like the reference: sum of (th - err) over inliers
    score_e = jnp.sum(jnp.where(inl_e, th_norm_sq - d_e, 0.0), axis=-1)
    be = jnp.argmax(score_e)
    E_best = E[be]
    inl_e_best = inl_e[be]
    s_e = score_e[be]

    # ----- Homography branch -----
    H = _four_point_h(rays1[idx_h], rays2[idx_h])
    d_h = _h_transfer_sq(H, rays1, rays2)
    # symmetric transfer uses 2x the threshold budget (two residuals)
    inl_h = (d_h < 2 * th_norm_sq) & pair_mask[None]
    score_h = jnp.sum(jnp.where(inl_h, 2 * th_norm_sq - d_h, 0.0), axis=-1)
    bh = jnp.argmax(score_h)
    s_h = score_h[bh]

    # model selection: reference uses SH/(SH+SF) > 0.4 (different residual
    # scales; the intent is "prefer H when it explains comparably much")
    use_h = s_h > 0.45 * 2 * (s_h / 2 + s_e)

    # ----- motion recovery -----
    # E path: 4 decompositions
    Rs_e, ts_e = decompose_essential(E_best)
    # H path: recover via homography decomposition — use the calibrated SVD
    # method: H ~ R + t n^T / d. We test the 4 E-style motions of the
    # rotation-dominant part as a pragmatic subset plus identity-rotation.
    H_best = H[bh]
    H_n = H_best / jnp.linalg.svd(H_best, compute_uv=False)[1][..., None, None]
    Rs_h, ts_h = _decompose_homography(H_n)

    Rs = jnp.where(use_h, Rs_h, Rs_e)
    ts = jnp.where(use_h, ts_h, ts_e)

    min_cos = jnp.cos(jnp.deg2rad(min_parallax_deg))
    census = jax.vmap(
        lambda R, t: _check_rt(R, t, rays1, rays2, pair_mask,
                               4 * th_norm_sq, min_cos))(Rs, ts)
    good_all, X_all, n_all, par_all = census
    best = jnp.argmax(n_all)
    n_best = n_all[best]
    n_second = jnp.sort(n_all)[-2]

    n_pairs = jnp.sum(pair_mask.astype(jnp.int32))
    ok = ((n_best >= min_matches) &
          (n_best.astype(jnp.float32) >
           min_inlier_frac * jnp.sum(inl_e_best.astype(jnp.float32))) &
          (n_second < (0.9 * n_best.astype(jnp.float32)).astype(jnp.int32)) &
          par_all[best] & (n_pairs >= min_matches))

    return TwoViewResult(Rs[best], ts[best], X_all[best], good_all[best],
                         n_best, ok, use_h)


def _decompose_homography(H: jax.Array):
    """Calibrated homography motions (4 candidates). Simplified Zhang/Faugeras
    decomposition: H = R + t n^T (after scale normalization by sigma_2).
    Returns (4,3,3) R and (4,3) t candidates; degenerate cases fall back to
    rotation-only (t=0 gets a tiny epsilon to keep triangulation defined)."""
    U, S, Vt = jnp.linalg.svd(H)
    s1, s2, s3 = S[..., 0], S[..., 1], S[..., 2]
    # work in the V basis
    a2 = jnp.maximum(s1 * s1 - s2 * s2, 0.0)
    b2 = jnp.maximum(s2 * s2 - s3 * s3, 0.0)
    denom = jnp.maximum(s1 * s1 - s3 * s3, 1e-12)
    x1 = jnp.sqrt(a2 / denom)
    x3 = jnp.sqrt(b2 / denom)
    sin_t = (s1 - s3) * x1 * x3 / jnp.maximum(s2, 1e-12)
    cos_t = (s1 * x3 * x3 + s3 * x1 * x1) / jnp.maximum(s2, 1e-12)

    def build(e1, e3):
        n = jnp.stack([e1 * x1, jnp.zeros_like(x1), e3 * x3], axis=-1)
        Rp = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        Rp = jnp.zeros((3, 3)).at[0, 0].set(cos_t).at[0, 2].set(
            -e1 * e3 * sin_t).at[1, 1].set(1.0).at[2, 0].set(
            e1 * e3 * sin_t).at[2, 2].set(cos_t)
        tp = (s1 - s3) * jnp.stack([e1 * x1, jnp.zeros_like(x1), -e3 * x3],
                                   axis=-1)
        V = jnp.swapaxes(Vt, -1, -2)
        R = U @ Rp @ Vt
        det = jnp.linalg.det(R)
        R = R * det  # H defined up to sign; fix improper rotations
        t = jnp.einsum('ij,j->i', U, tp) * det
        tn = jnp.linalg.norm(t).clip(1e-9)
        return R, t / tn
    cands = [build(e1, e3) for e1 in (1.0, -1.0) for e3 in (1.0, -1.0)]
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs, ts
