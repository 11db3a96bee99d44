"""Pallas kernel tests (interpret mode on CPU; numerics vs the XLA oracle)."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.ops import pallas_kernels as pk

RNG = np.random.RandomState(41)


def make_problem(M=300, N=700, D=64, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(M, D).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = rng.randn(N, D).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    # plant exact matches for the first min(M,N)//2 rows
    k = min(M, N) // 2
    t[:k] = q[:k]
    qxy = rng.uniform(0, 640, (M, 2)).astype(np.float32)
    txy = rng.uniform(0, 640, (N, 2)).astype(np.float32)
    txy[:k] = qxy[:k] + rng.randn(k, 2) * 2
    qv = rng.rand(M) > 0.1
    tv = rng.rand(N) > 0.1
    return (jnp.asarray(q), jnp.asarray(qxy), jnp.asarray(qv),
            jnp.asarray(t), jnp.asarray(txy), jnp.asarray(tv))


class TestWindowMatch:
    def test_matches_xla_oracle(self):
        args = make_problem()
        b1, s1, i1, cb1, ci1 = pk.window_match_topk2(*args, 10.0,
                                                     interpret=True)
        b2, s2, i2, cb2, ci2 = pk.window_match_topk2_xla(*args, 10.0)
        found1 = np.asarray(b1) < 1e8
        found2 = np.asarray(b2) < 1e8
        np.testing.assert_array_equal(found1, found2)
        np.testing.assert_array_equal(np.asarray(i1)[found1],
                                      np.asarray(i2)[found1])
        np.testing.assert_allclose(np.asarray(b1)[found1],
                                   np.asarray(b2)[found1], atol=2e-2)
        sel = found1 & (np.asarray(s1) < 1e8)
        np.testing.assert_allclose(np.asarray(s1)[sel],
                                   np.asarray(s2)[sel], atol=2e-2)
        # column-side (per-target) outputs agree with the oracle
        cfound1 = np.asarray(cb1) < 1e8
        cfound2 = np.asarray(cb2) < 1e8
        np.testing.assert_array_equal(cfound1, cfound2)
        np.testing.assert_array_equal(np.asarray(ci1)[cfound1],
                                      np.asarray(ci2)[cfound1])
        np.testing.assert_allclose(np.asarray(cb1)[cfound1],
                                   np.asarray(cb2)[cfound1], atol=2e-2)

    def test_col_outputs_multi_rowblock(self):
        """Column accumulation must merge across >1 grid step (M > TM)."""
        args = make_problem(M=2 * pk.TM + 17, N=300, seed=7)
        *_, cb1, ci1 = pk.window_match_topk2(*args, 25.0, interpret=True)
        *_, cb2, ci2 = pk.window_match_topk2_xla(*args, 25.0)
        cf = np.asarray(cb2) < 1e8
        np.testing.assert_array_equal(np.asarray(cb1) < 1e8, cf)
        np.testing.assert_array_equal(np.asarray(ci1)[cf],
                                      np.asarray(ci2)[cf])

    def test_planted_matches_found(self):
        q, qxy, qv, t, txy, tv = make_problem(M=128, N=256, seed=3)
        qv = jnp.ones(128, bool)
        tv = jnp.ones(256, bool)
        b, s, i, _, _ = pk.window_match_topk2(q, qxy, qv, t, txy, tv, 10.0,
                                              interpret=True)
        k = 64
        hits = (np.asarray(i[:k]) == np.arange(k)) & (np.asarray(b[:k]) < 0.3)
        assert hits.mean() > 0.9

    def test_no_valid_targets(self):
        q, qxy, qv, t, txy, tv = make_problem(M=64, N=128)
        b, s, i, cb, ci = pk.window_match_topk2(q, qxy, qv, t, txy,
                                                jnp.zeros(128, bool), 10.0,
                                                interpret=True)
        assert float(jnp.min(b)) >= 1e8
        assert float(jnp.min(cb)) >= 1e8

    def test_per_query_radius(self):
        q, qxy, qv, t, txy, tv = make_problem(M=64, N=128, seed=4)
        r = jnp.full((64,), 0.001)   # vanishing windows: no matches
        b, *_ = pk.window_match_topk2(q, qxy, jnp.ones(64, bool), t, txy,
                                      jnp.ones(128, bool), r,
                                      interpret=True)
        # planted targets are ~2px away, outside the 0.001 radius
        assert float(jnp.min(b)) >= 1e8


class TestLbaLandmarkBlocks:
    def test_matches_xla_oracle(self):
        from dani_slam_tpu.ops import pallas_kernels as pk
        rng = np.random.default_rng(0)
        P, N, L = 4, 256, 512
        row_lm = rng.integers(0, L, size=(P, N)).astype(np.int32)
        row_lm[rng.random((P, N)) < 0.3] = -1          # invalid obs
        vals = rng.standard_normal((P, N, 30)).astype(np.float32)
        Hk, gk, Wk = pk.lba_landmark_blocks(jnp.asarray(row_lm),
                                            jnp.asarray(vals), L,
                                            interpret=True)
        Hx, gx, Wx = pk.lba_landmark_blocks_xla(jnp.asarray(row_lm),
                                                jnp.asarray(vals), L)
        np.testing.assert_allclose(np.asarray(Hk), np.asarray(Hx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Wk), np.asarray(Wx),
                                   rtol=1e-5, atol=1e-5)

    def test_oracle_matches_ba_einsums(self):
        """The oracle must equal ba_solve's historical einsum formulation
        (one-hot of valid rows only)."""
        from dani_slam_tpu.ops import pallas_kernels as pk
        rng = np.random.default_rng(1)
        P, N, L = 3, 128, 256
        row_lm = rng.integers(0, L, size=(P, N)).astype(np.int32)
        row_ok = rng.random((P, N)) < 0.7
        vals = rng.standard_normal((P, N, 30)).astype(np.float32)
        ids = np.where(row_ok, row_lm, -1)
        H, g, W = pk.lba_landmark_blocks_xla(jnp.asarray(ids),
                                             jnp.asarray(vals), L)
        onehot = ((row_lm[:, :, None] == np.arange(L)[None, None, :]) &
                  row_ok[:, :, None]).astype(np.float64)
        H_ref = np.einsum('pnl,pnij->lij', onehot,
                          vals[..., :9].reshape(P, N, 3, 3))
        g_ref = np.einsum('pnl,pnk->lk', onehot, vals[..., 9:12])
        W_ref = np.einsum('pnl,pnik->plik', onehot,
                          vals[..., 12:].reshape(P, N, 6, 3))
        np.testing.assert_allclose(np.asarray(H), H_ref, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(W), W_ref, rtol=1e-4,
                                   atol=1e-4)
