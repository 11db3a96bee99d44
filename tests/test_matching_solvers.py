"""Tests for descriptor matching and motion-only pose optimization."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, lie
from dani_slam_tpu.ops import matching, solvers

RNG = np.random.RandomState(7)


def unit_desc(n, d=32, rng=RNG):
    x = rng.randn(n, d).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=-1, keepdims=True))


CAM = cameras.Camera.pinhole(520.0, 520.0, 320.0, 240.0, 640, 480)


class TestMatching:
    def test_identical_descriptors_match(self):
        d = unit_desc(16)
        xy = jnp.asarray(RNG.uniform(50, 400, (16, 2)), jnp.float32)
        m = matching.search_by_projection(
            xy, jnp.ones(16, bool), d, xy, jnp.ones(16, bool), d, radius=5.0)
        assert bool(m.ok.all())
        np.testing.assert_array_equal(np.asarray(m.idx), np.arange(16))

    def test_window_excludes_far_targets(self):
        d = unit_desc(2)
        pxy = jnp.asarray([[100.0, 100.0], [300.0, 300.0]])
        kxy = jnp.asarray([[200.0, 200.0], [305.0, 300.0]])
        m = matching.search_by_projection(
            pxy, jnp.ones(2, bool), d, kxy, jnp.ones(2, bool), d, radius=10.0)
        assert not bool(m.ok[0])      # nothing within 10px of (100,100)
        assert bool(m.ok[1]) and int(m.idx[1]) == 1

    def test_threshold_rejects_bad_desc(self):
        d0 = unit_desc(1)
        d1 = -d0  # opposite direction: L2 distance = 2
        xy = jnp.asarray([[100.0, 100.0]])
        m = matching.search_by_projection(
            xy, jnp.ones(1, bool), d0, xy, jnp.ones(1, bool), d1,
            radius=5.0, th_desc=0.9)
        assert not bool(m.ok[0])

    def test_duplicate_resolution(self):
        # two queries both prefer target 0; only the closer survives
        base = unit_desc(1)
        noise = unit_desc(1, rng=np.random.RandomState(99)) * 0.1
        q = jnp.concatenate([base, base + noise])
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        xy = jnp.asarray([[100.0, 100.0], [101.0, 100.0]])
        m = matching.search_by_projection(
            xy, jnp.ones(2, bool), q,
            jnp.asarray([[100.5, 100.0]]), jnp.ones(1, bool), base,
            radius=5.0)
        assert int(m.ok.sum()) == 1
        assert bool(m.ok[0])  # exact-duplicate descriptor wins (dist 0)

    def test_mutual_requirement(self):
        # q0 ~ t0 strongly; q1 weakly closer to t0 than t1 -> mutual keeps q0
        t = unit_desc(2)
        q = jnp.stack([t[0], t[0] * 0.9 + t[1] * 0.435])
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        xy = jnp.asarray([[10.0, 10.0], [12.0, 10.0]])
        m = matching.search_by_projection(
            xy, jnp.ones(2, bool), q, xy, jnp.ones(2, bool), t,
            radius=50.0, mutual=True)
        assert bool(m.ok[0]) and int(m.idx[0]) == 0

    def test_project_landmarks_frustum(self):
        lm = jnp.asarray([[0.0, 0.0, 2.0],    # ahead
                          [0.0, 0.0, -2.0],   # behind
                          [10.0, 0.0, 2.0]])  # out of view
        xy, vis, _, _ = matching.project_landmarks(
            jnp.eye(3), jnp.zeros(3), CAM, lm, jnp.ones(3, bool))
        np.testing.assert_array_equal(np.asarray(vis), [True, False, False])


class TestPoseOptimize:
    def _setup(self, n=128, noise=0.0, outlier_frac=0.0, seed=0):
        rng = np.random.RandomState(seed)
        pts = rng.randn(n, 3).astype(np.float32)
        pts[:, 2] = rng.uniform(2, 8, n)
        pts[:, 0] *= 1.5
        pts[:, 1] *= 1.0
        xi_true = jnp.asarray([0.1, -0.05, 0.02, 0.02, -0.03, 0.01])
        R_true, t_true = lie.se3_exp(xi_true)
        obs = cameras.project(CAM, lie.se3_apply(R_true, t_true,
                                                 jnp.asarray(pts)))
        obs = obs + noise * jnp.asarray(rng.randn(n, 2), jnp.float32)
        n_out = int(n * outlier_frac)
        if n_out:
            obs = obs.at[:n_out].add(
                jnp.asarray(rng.uniform(30, 80, (n_out, 2)), jnp.float32))
        return jnp.asarray(pts), obs, (R_true, t_true), n_out

    def test_converges_from_identity(self):
        pts, obs, (R_t, t_t), _ = self._setup()
        res = solvers.pose_optimize(jnp.eye(3), jnp.zeros(3), CAM, pts, obs,
                                    jnp.ones(pts.shape[0], bool))
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_t),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_t),
                                   atol=1e-3)
        assert int(res.n_inliers) == pts.shape[0]

    def test_outlier_rejection(self):
        pts, obs, (R_t, t_t), n_out = self._setup(noise=0.5, outlier_frac=0.25)
        res = solvers.pose_optimize(jnp.eye(3), jnp.zeros(3), CAM, pts, obs,
                                    jnp.ones(pts.shape[0], bool))
        # outliers flagged, pose still accurate
        assert int(res.inliers[:n_out].sum()) == 0
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_t),
                                   atol=0.02)

    def test_respects_mask(self):
        pts, obs, _, _ = self._setup()
        mask = jnp.zeros(pts.shape[0], bool).at[:64].set(True)
        res = solvers.pose_optimize(jnp.eye(3), jnp.zeros(3), CAM, pts, obs,
                                    mask)
        assert int(res.n_inliers) <= 64

    def test_depth_residual_improves_scale(self):
        pts, obs, (R_t, t_t), _ = self._setup()
        depth = lie.se3_apply(R_t, t_t, pts)[:, 2]
        res = solvers.pose_optimize(
            jnp.eye(3), jnp.zeros(3), CAM, pts, obs,
            jnp.ones(pts.shape[0], bool), obs_depth=depth, use_depth=True)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_t),
                                   atol=1e-3)

    def test_vmappable(self):
        pts, obs, _, _ = self._setup(n=64)
        f = jax.vmap(lambda R0, t0: solvers.pose_optimize(
            R0, t0, CAM, pts, obs, jnp.ones(64, bool), rounds=2))
        res = f(jnp.stack([jnp.eye(3)] * 3), jnp.zeros((3, 3)))
        assert res.R.shape == (3, 3, 3)


class TestHorn:
    def test_exact_alignment(self):
        P = jnp.asarray(RNG.randn(32, 3), jnp.float32)
        xi = jnp.asarray([0.5, -0.2, 0.1, 0.3, 0.2, -0.4])
        R_t, t_t = lie.se3_exp(xi)
        s_t = 1.7
        Q = s_t * jnp.einsum('ij,nj->ni', R_t, P) + t_t
        R, t, s = solvers.horn_align(P, Q, with_scale=True)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_t), atol=1e-4)
        np.testing.assert_allclose(float(s), s_t, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_t), atol=1e-3)

    def test_no_scale(self):
        P = jnp.asarray(RNG.randn(32, 3), jnp.float32)
        R_t, t_t = lie.se3_exp(jnp.asarray([0.5, -0.2, 0.1, 0.3, 0.2, -0.4]))
        Q = jnp.einsum('ij,nj->ni', R_t, P) + t_t
        R, t, s = solvers.horn_align(P, Q, with_scale=False)
        assert float(s) == 1.0
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_t), atol=1e-4)

    def test_weighted_ignores_outliers(self):
        P = jnp.asarray(RNG.randn(32, 3), jnp.float32)
        R_t, t_t = lie.se3_exp(jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.2, 0.0]))
        Q = jnp.einsum('ij,nj->ni', R_t, P) + t_t
        Q = Q.at[:4].add(5.0)
        w = jnp.ones(32).at[:4].set(0.0)
        R, t, _ = solvers.horn_align(P, Q, w=w)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_t), atol=1e-4)

    def test_batched(self):
        P = jnp.asarray(RNG.randn(5, 16, 3), jnp.float32)
        R, t, s = solvers.horn_align(P, P + 1.0, with_scale=True)
        assert R.shape == (5, 3, 3) and t.shape == (5, 3) and s.shape == (5,)
