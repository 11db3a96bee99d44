"""LightGlue model tests: shapes, masking invariants, trainability."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from dani_slam_tpu.models import lightglue as lg
import pytest

RNG = np.random.RandomState(5)


def tiny_matcher(n=32, d_in=16):
    return lg.init_matcher(jax.random.PRNGKey(0), width=64, height=64, n=n,
                           input_dim=d_in, dim=32, depth=2)


class TestForward:
    def test_shapes(self):
        ms = tiny_matcher()
        xy = jnp.asarray(RNG.uniform(0, 64, (32, 2)), jnp.float32)
        d = jnp.asarray(RNG.randn(32, 16), jnp.float32)
        m = jnp.ones(32, bool)
        idx, score, ok = lg.match(ms, xy, d, m, xy, d, m, threshold=0.0)
        assert idx.shape == (32,) and score.shape == (32,) and ok.shape == (32,)

    def test_padding_invariance(self):
        """Scores of real keypoints must not depend on padded slots."""
        ms = tiny_matcher()
        xy = jnp.asarray(RNG.uniform(0, 64, (32, 2)), jnp.float32)
        d = jnp.asarray(RNG.randn(32, 16), jnp.float32)
        mask_full = jnp.zeros(32, bool).at[:16].set(True)
        xy0n = lg.normalize_keypoints(xy, 64, 64)[None]
        s1, _, _ = lg._forward(ms.model, ms.params, xy0n, xy0n, d[None],
                               d[None], mask_full[None], mask_full[None])
        # poison padded slots
        d_poison = d.at[16:].set(100.0)
        xy_p = xy.at[16:].set(-500.0)
        xy1n = lg.normalize_keypoints(xy_p, 64, 64)[None]
        s2, _, _ = lg._forward(ms.model, ms.params, xy1n, xy1n,
                               d_poison[None], d_poison[None],
                               mask_full[None], mask_full[None])
        np.testing.assert_allclose(np.asarray(s1[0, :16, :16]),
                                   np.asarray(s2[0, :16, :16]), atol=1e-3)

    def test_no_matches_to_invalid(self):
        ms = tiny_matcher()
        xy = jnp.asarray(RNG.uniform(0, 64, (32, 2)), jnp.float32)
        d = jnp.asarray(RNG.randn(32, 16), jnp.float32)
        m0 = jnp.ones(32, bool)
        m1 = jnp.zeros(32, bool)   # no valid targets
        _, _, ok = lg.match(ms, xy, d, m0, xy, d, m1, threshold=0.0)
        assert int(ok.sum()) == 0


@pytest.mark.slow
class TestTraining:
    def test_overfits_identity_matching(self):
        """Train the tiny model to match identical descriptor sets; the
        correct permutation must emerge (verifies gradients flow through
        attention + dual-softmax)."""
        ms = tiny_matcher(n=16, d_in=16)
        model, params = ms.model, ms.params

        def make_batch(key):
            k1, k2, k3 = jax.random.split(key, 3)
            xy0 = jax.random.uniform(k1, (4, 16, 2), minval=-1, maxval=1)
            d0 = jax.random.normal(k2, (4, 16, 16))
            perm = jax.vmap(lambda k: jax.random.permutation(k, 16))(
                jax.random.split(k3, 4))
            xy1 = jnp.take_along_axis(xy0, perm[..., None], axis=1)
            d1 = jnp.take_along_axis(d0, perm[..., None], axis=1)
            # slot j of image1 holds image0's keypoint perm[j]; the match
            # target of image0 query i is therefore the INVERSE permutation
            inv = jnp.argsort(perm, axis=-1)
            return xy0, d0, xy1, d1, inv

        m = jnp.ones((4, 16), bool)
        opt = optax.adam(3e-3)
        ost = opt.init(params)

        @jax.jit
        def step(params, ost, key):
            xy0, d0, xy1, d1, perm = make_batch(key)

            def loss_fn(p):
                scores, _, _ = model.apply(p, xy0, xy1, d0, d1, m, m)
                # negative log-likelihood of the true assignment
                ll = jnp.take_along_axis(scores, perm[..., None],
                                         axis=-1)[..., 0]
                return -jnp.mean(ll)
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, ost = opt.update(g, ost)
            return optax.apply_updates(params, up), ost, loss

        key = jax.random.PRNGKey(1)
        for i in range(60):
            key, sub = jax.random.split(key)
            params, ost, loss = step(params, ost, sub)

        # evaluate accuracy on a fresh batch
        xy0, d0, xy1, d1, perm = make_batch(jax.random.PRNGKey(99))
        scores, _, _ = model.apply(params, xy0, xy1, d0, d1, m, m)
        pred = jnp.argmax(scores, axis=-1)
        acc = float((pred == perm).mean())
        assert acc > 0.9, f"matcher failed to learn: acc={acc}"


class TestSlamIntegration:
    def test_stereo_depth_via_lightglue(self):
        """LightGlue-based stereo matching recovers metric depth once the
        matcher can match (tiny model trained on the identity task)."""
        import sys
        sys.path.insert(0, "tests")
        from dani_slam_tpu.slam import frame as frame_mod

        # identical descriptors left/right, shifted x by true disparity
        rng = np.random.RandomState(3)
        n, d_in = 32, 16
        desc = rng.randn(n, d_in).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        fx, baseline = 300.0, 0.1
        depth_true = rng.uniform(2, 8, n).astype(np.float32)
        disp = fx * baseline / depth_true
        xy_r = rng.uniform(50, 250, (n, 2)).astype(np.float32)
        xy_l = xy_r.copy()
        xy_l[:, 0] += disp

        # matcher sized so the test's pixel range normalizes into the
        # [-1,1] coordinate distribution used during training
        ms = lg.init_matcher(jax.random.PRNGKey(0), width=320, height=320,
                             n=n, input_dim=d_in, dim=32, depth=2)
        # brief training on the identity-matching task so scores are usable
        model, params = ms.model, ms.params
        m = jnp.ones((2, n), bool)
        opt = optax.adam(3e-3)
        ost = opt.init(params)
        key = jax.random.PRNGKey(0)
        @jax.jit
        def step(params, ost, key):
            k1, k2 = jax.random.split(key)
            xy = jax.random.uniform(k1, (2, n, 2), minval=-1, maxval=1)
            dd = jax.random.normal(k2, (2, n, d_in))
            dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)
            def loss_fn(p):
                scores, _, _ = model.apply(p, xy, xy, dd, dd, m, m)
                ll = jnp.take_along_axis(
                    scores, jnp.arange(n)[None, :, None].repeat(2, 0),
                    axis=-1)[..., 0]
                return -jnp.mean(ll)
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, ost2 = opt.update(g, ost)
            return optax.apply_updates(params, up), ost2, loss
        for _ in range(80):
            key, sub = jax.random.split(key)
            params, ost, _ = step(params, ost, sub)
        ms.params = params

        depth = frame_mod.stereo_match_depth_lightglue(
            ms, jnp.asarray(xy_l), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(xy_r), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(fx), jnp.asarray(baseline))
        got = np.asarray(depth)
        okm = np.isfinite(got)
        assert okm.sum() > n * 0.7
        rel = np.abs(got[okm] - depth_true[okm]) / depth_true[okm]
        assert np.median(rel) < 0.05
