"""Small dense SPD solves without LAPACK custom calls.

Every LM/GN inner loop in this framework solves a small damped SPD system
(6x6 motion-only pose, 15/30-DoF inertial, 96 = 16x6 local-BA Schur,
150 = 10x15 inertial-window Schur). `jnp.linalg.solve` lowers to an LU
(getrf) custom call that is latency-bound on TPU — hundreds of microseconds
to milliseconds per call for matrices this small, and it sits inside
sequential `lax.while_loop` chains (40 calls per tracked frame in
pose_optimize alone; reference semantics: 4x10 LM iterations,
src/Optimizer.cc:814-1110).

These helpers unroll a Cholesky factorization + triangular substitutions at
trace time into plain vector ops (sqrt/div/matvec + static-index
dynamic-update-slices). XLA fuses each column step; there is no custom
call, no pivoting, and the op count is O(n) fused steps — microseconds
instead of the LU latency. Intended for STATIC n up to ~150.

All inputs are assumed symmetric positive definite (the callers damp with
`lam*diag + eps*I`, and gauge-fixed rows carry an identity diagonal).
`jnp.maximum(.., eps)` under the sqrt keeps half-dead systems (masked-out
padding blocks) finite rather than NaN — matching how the damped LU path
behaved on those rows.

Batched use: all helpers broadcast over leading axes (vmap-compatible);
relocalization ranks candidates through vmapped pose solves.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def chol_factor(A: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Lower-triangular L with L L^T = A, for SPD A [..., n, n], n static.

    Unrolled column-Crout: column j is computed from columns < j. Each step
    is a masked matvec + rsqrt — no LAPACK call.
    """
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    rows = jnp.arange(n)
    for j in range(n):
        if j:
            c = A[..., :, j] - jnp.einsum('...ik,...k->...i',
                                          L[..., :, :j], L[..., j, :j])
        else:
            c = A[..., :, j]
        d = jnp.sqrt(jnp.maximum(c[..., j], eps))
        col = jnp.where(rows >= j, c / d[..., None], 0.0)
        L = L.at[..., :, j].set(col)
    return L


def _fwd_sub(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L y = b for lower-triangular L [..., n, n], b [..., n]."""
    n = L.shape[-1]
    y = jnp.zeros_like(b)
    for i in range(n):
        acc = jnp.einsum('...k,...k->...', L[..., i, :i], y[..., :i]) \
            if i else 0.0
        y = y.at[..., i].set((b[..., i] - acc) / L[..., i, i])
    return y


def _bwd_sub(L: jax.Array, y: jax.Array) -> jax.Array:
    """Solve L^T x = y for lower-triangular L [..., n, n], y [..., n]."""
    n = L.shape[-1]
    x = jnp.zeros_like(y)
    for i in reversed(range(n)):
        acc = jnp.einsum('...k,...k->...', L[..., i + 1:, i],
                         x[..., i + 1:]) if i + 1 < n else 0.0
        x = x.at[..., i].set((y[..., i] - acc) / L[..., i, i])
    return x


def chol_solve(A: jax.Array, b: jax.Array, eps: float = 1e-12) -> jax.Array:
    """x = A^-1 b for SPD A [..., n, n], b [..., n]; n static & small.

    Drop-in replacement for `jnp.linalg.solve(A, b)` on the damped GN/LM
    systems of this codebase (pose_optimize 6, inertial 15/30, LBA Schur
    96, inertial-window Schur 150). Systems with n a multiple of 6 and
    n >= 24 take the BLOCKED path: n/6 panel steps (matmul + 6-wide
    unrolled factor) instead of n scalar column steps — the sequential
    latency chain inside every LM iteration shrinks ~6x.
    """
    n = A.shape[-1]
    if n >= 24 and n % 6 == 0:
        return _chol_solve_blocked(A, b, 6, eps)
    L = chol_factor(A, eps)
    return _bwd_sub(L, _fwd_sub(L, b))


def _chol_solve_blocked(A: jax.Array, b: jax.Array, blk: int,
                        eps: float) -> jax.Array:
    """Blocked Cholesky solve: factor in n/blk panel steps, then blocked
    forward/backward substitution reusing the inverted diagonal blocks.
    Each step is one batched matmul + a blk-wide unrolled factor — O(n/blk)
    fused sequential steps instead of O(3n)."""
    n = A.shape[-1]
    nb = n // blk
    L = jnp.zeros_like(A)
    dinvs = []
    for j in range(nb):
        lo = j * blk
        panel = A[..., lo:, lo:lo + blk]
        if j:
            panel = panel - jnp.einsum('...ik,...jk->...ij',
                                       L[..., lo:, :lo],
                                       L[..., lo:lo + blk, :lo])
        D = chol_factor(panel[..., :blk, :], eps)
        Dinv = tri_lower_inv(D)
        below = jnp.einsum('...ik,...jk->...ij', panel[..., blk:, :], Dinv)
        col = jnp.concatenate([D, below], axis=-2)
        L = L.at[..., lo:, lo:lo + blk].set(col)
        dinvs.append(Dinv)
    # forward: L y = b
    y = jnp.zeros_like(b)
    for i in range(nb):
        lo = i * blk
        rhs = b[..., lo:lo + blk]
        if i:
            rhs = rhs - jnp.einsum('...ij,...j->...i',
                                   L[..., lo:lo + blk, :lo], y[..., :lo])
        y = y.at[..., lo:lo + blk].set(
            jnp.einsum('...ij,...j->...i', dinvs[i], rhs))
    # backward: L^T x = y
    x = jnp.zeros_like(b)
    for i in reversed(range(nb)):
        lo, hi = i * blk, i * blk + blk
        rhs = y[..., lo:hi]
        if hi < n:
            rhs = rhs - jnp.einsum('...ji,...j->...i',
                                   L[..., hi:, lo:hi], x[..., hi:])
        x = x.at[..., lo:hi].set(
            jnp.einsum('...ji,...j->...i', dinvs[i], rhs))
    return x


def tri_lower_inv(L: jax.Array) -> jax.Array:
    """Inverse of a lower-triangular L [..., n, n] (row-unrolled)."""
    n = L.shape[-1]
    X = jnp.zeros_like(L)
    eye = jnp.eye(n, dtype=L.dtype)
    for i in range(n):
        if i:
            acc = jnp.einsum('...k,...kj->...j', L[..., i, :i], X[..., :i, :])
        else:
            acc = 0.0
        X = X.at[..., i, :].set((eye[i] - acc) / L[..., i, i:i + 1])
    return X


def chol_inv(A: jax.Array, eps: float = 1e-12) -> jax.Array:
    """A^-1 for SPD A [..., n, n] via Cholesky (Linv^T Linv). Replaces
    `jnp.linalg.inv` on small SPD information/covariance blocks (e.g. the
    9x9 preintegration covariance, ops/solvers.py)."""
    Li = tri_lower_inv(chol_factor(A, eps))
    return jnp.einsum('...ki,...kj->...ij', Li, Li)
