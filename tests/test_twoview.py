"""Two-view reconstruction tests on synthetic geometry."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import lie
from dani_slam_tpu.ops import twoview

RNG = np.random.RandomState(11)
FOCAL = jnp.asarray(520.0)


def make_scene(n=200, planar=False, xi=None, noise_px=0.0, seed=5):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    pts[:, 0] *= 2.0
    pts[:, 1] *= 1.5
    if planar:
        pts[:, 2] = 4.0 + 0.3 * pts[:, 0] * 0  # exact plane z=4
    else:
        pts[:, 2] = rng.uniform(3, 10, n)
    pts = jnp.asarray(pts)
    if xi is None:
        xi = jnp.asarray([0.4, 0.1, 0.05, 0.02, -0.06, 0.01])
    R21, t21 = lie.se3_exp(xi)
    t21 = t21 / jnp.linalg.norm(t21)  # unit baseline (mono scale-free)
    p2 = lie.se3_apply(R21, t21, pts)
    r1 = pts / pts[:, 2:3]
    r2 = p2 / p2[:, 2:3]
    if noise_px > 0:
        r1 = r1.at[:, :2].add(
            jnp.asarray(rng.randn(n, 2), jnp.float32) * noise_px / 520.0)
        r2 = r2.at[:, :2].add(
            jnp.asarray(rng.randn(n, 2), jnp.float32) * noise_px / 520.0)
    return r1, r2, (R21, t21), pts


class TestEightPoint:
    def test_essential_epipolar_constraint(self):
        r1, r2, (R, t), _ = make_scene()
        idx = jnp.arange(8)[None]
        E = twoview._eight_point(r1[idx], r2[idx])[0]
        resid = jnp.einsum('ni,ij,nj->n', r2, E, r1)
        assert float(jnp.abs(resid).max()) < 1e-4

    def test_decompose_recovers_motion(self):
        r1, r2, (R_t, t_t), _ = make_scene()
        idx = jnp.arange(8)[None]
        E = twoview._eight_point(r1[idx], r2[idx])[0]
        Rs, ts = twoview.decompose_essential(E[None])
        # one of the 4 candidates matches (up to sign of t)
        errs = []
        for i in range(4):
            eR = float(jnp.abs(Rs[0, i] - R_t).max())
            et = float(jnp.abs(ts[0, i] - t_t).min())
            errs.append(eR + float(jnp.abs(ts[0, i] - t_t).max()))
        assert min(errs) < 1e-3


class TestTwoViewInit:
    def test_general_scene(self):
        r1, r2, (R_t, t_t), pts = make_scene(n=200)
        res = twoview.two_view_init(jax.random.PRNGKey(0), r1, r2,
                                    jnp.ones(200, bool), FOCAL)
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R21), np.asarray(R_t),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t21), np.asarray(t_t),
                                   atol=5e-3)
        # triangulated points match scene up to scale
        inl = np.asarray(res.inliers)
        scale = np.median(np.asarray(res.pts3d[inl][:, 2]) /
                          np.asarray(pts[inl][:, 2]))
        rec = np.asarray(res.pts3d[inl]) / scale
        np.testing.assert_allclose(rec, np.asarray(pts[inl]), atol=0.05)

    def test_with_noise_and_outliers(self):
        r1, r2, (R_t, t_t), _ = make_scene(n=300, noise_px=0.5)
        # corrupt 20% of matches
        r2 = r2.at[:60, :2].add(
            jnp.asarray(RNG.uniform(0.05, 0.2, (60, 2)), jnp.float32))
        res = twoview.two_view_init(jax.random.PRNGKey(1), r1, r2,
                                    jnp.ones(300, bool), FOCAL)
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R21), np.asarray(R_t),
                                   atol=2e-2)
        assert int(res.inliers[:60].sum()) < 10

    def test_insufficient_matches_rejected(self):
        r1, r2, _, _ = make_scene(n=200)
        mask = jnp.zeros(200, bool).at[:30].set(True)
        res = twoview.two_view_init(jax.random.PRNGKey(0), r1, r2, mask, FOCAL)
        assert not bool(res.ok)

    def test_pure_rotation_rejected(self):
        # no parallax: init must be refused
        rng = np.random.RandomState(2)
        pts = jnp.asarray(rng.randn(150, 3).astype(np.float32) +
                          np.array([0, 0, 6], np.float32))
        R21 = lie.so3_exp(jnp.asarray([0.0, 0.1, 0.0]))
        p2 = jnp.einsum('ij,nj->ni', R21, pts)
        r1 = pts / pts[:, 2:3]
        r2 = p2 / p2[:, 2:3]
        res = twoview.two_view_init(jax.random.PRNGKey(0), r1, r2,
                                    jnp.ones(150, bool), FOCAL)
        assert not bool(res.ok)

    def test_planar_scene_homography(self):
        r1, r2, (R_t, t_t), _ = make_scene(n=200, planar=True)
        res = twoview.two_view_init(jax.random.PRNGKey(3), r1, r2,
                                    jnp.ones(200, bool), FOCAL)
        # planar scenes must still produce a correct motion
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R21), np.asarray(R_t),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(res.t21), np.asarray(t_t),
                                   atol=2e-2)
