"""Unit tests for ops/linalg.py — unrolled Cholesky solves vs numpy.

These helpers replace `jnp.linalg.solve` (LU custom call, latency-bound on
TPU) inside every LM inner loop; equivalence here is what licenses the
swap on the hot paths (pose_optimize 6x6, inertial 15/30, LBA Schur 96).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dani_slam_tpu.ops import linalg as dla


def _spd(rng, n, cond_ridge=1e-3):
    A = rng.standard_normal((n, n))
    return A @ A.T + cond_ridge * n * np.eye(n)


@pytest.mark.parametrize("n", [2, 6, 15, 30, 96])
def test_chol_solve_matches_numpy(n):
    rng = np.random.default_rng(n)
    A = _spd(rng, n)
    b = rng.standard_normal(n)
    x = np.asarray(dla.chol_solve(jnp.asarray(A, jnp.float32),
                                  jnp.asarray(b, jnp.float32)))
    x_ref = np.linalg.solve(A, b)
    # f32 factorization of an SPD system: residual-relative check
    assert np.linalg.norm(A @ x - b) <= 1e-3 * (np.linalg.norm(b) + 1.0)
    assert np.allclose(x, x_ref, rtol=1e-2, atol=1e-3)


def test_chol_factor_is_cholesky():
    rng = np.random.default_rng(0)
    A = _spd(rng, 12)
    L = np.asarray(dla.chol_factor(jnp.asarray(A, jnp.float32)))
    assert np.allclose(L, np.tril(L))
    assert np.allclose(L @ L.T, A, rtol=1e-4, atol=1e-3)


def test_damped_gauge_rows_like_lm_systems():
    """The LM callers zero gauge rows/cols and put 1 on the diagonal; the
    solve must reproduce LU behavior on that structure."""
    rng = np.random.default_rng(3)
    n = 24
    A = _spd(rng, n)
    # freeze dofs 0..5 the way ba_solve does
    keep = np.ones(n); keep[:6] = 0.0
    A = A * keep[:, None] * keep[None, :]
    A[np.arange(6), np.arange(6)] = 1.0
    A += 1e-8 * np.eye(n)
    b = rng.standard_normal(n) * keep
    x = np.asarray(dla.chol_solve(jnp.asarray(A, jnp.float32),
                                  jnp.asarray(b, jnp.float32)))
    x_ref = np.linalg.solve(A, b)
    assert np.allclose(x, x_ref, rtol=1e-3, atol=1e-4)
    assert np.allclose(x[:6], 0.0, atol=1e-6)


def test_batched_vmap():
    rng = np.random.default_rng(7)
    As = np.stack([_spd(rng, 6) for _ in range(8)])
    bs = rng.standard_normal((8, 6))
    xs = np.asarray(jax.vmap(dla.chol_solve)(
        jnp.asarray(As, jnp.float32), jnp.asarray(bs, jnp.float32)))
    for i in range(8):
        assert np.allclose(xs[i], np.linalg.solve(As[i], bs[i]),
                           rtol=1e-3, atol=1e-4)


def test_chol_inv_and_tri_inv():
    rng = np.random.default_rng(11)
    A = _spd(rng, 9)
    Ainv = np.asarray(dla.chol_inv(jnp.asarray(A, jnp.float32)))
    assert np.allclose(Ainv @ A, np.eye(9), atol=1e-3)
    L = np.linalg.cholesky(A)
    Li = np.asarray(dla.tri_lower_inv(jnp.asarray(L, jnp.float32)))
    assert np.allclose(Li @ L, np.eye(9), atol=1e-4)


def test_half_dead_padding_blocks_stay_finite():
    """Masked-out padding rows (all-zero except damped diagonal) must not
    produce NaN — the LBA window routinely carries unused pose slots."""
    A = np.zeros((12, 12)); A[:6, :6] = _spd(np.random.default_rng(5), 6)
    A[np.arange(6, 12), np.arange(6, 12)] = 1e-8
    b = np.zeros(12); b[:6] = 1.0
    x = np.asarray(dla.chol_solve(jnp.asarray(A, jnp.float32),
                                  jnp.asarray(b, jnp.float32)))
    assert np.all(np.isfinite(x))
    assert np.allclose(A[:6, :6] @ x[:6], b[:6], atol=1e-3)
