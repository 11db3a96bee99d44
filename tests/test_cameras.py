"""Camera model tests: projection/unprojection roundtrips, Jacobians,
epipolar geometry, triangulation."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, lie

RNG = np.random.RandomState(1)


def make_pinhole():
    return cameras.Camera.pinhole(520.9, 521.0, 325.1, 249.7, 640, 480)


def make_kb8():
    # EuRoC-like fisheye params
    return cameras.Camera.kb8(190.978, 190.973, 254.932, 256.897,
                              0.00348, 0.000715, -0.00205, 0.000202, 512, 512)


def rand_points(n=64, zmin=0.5, zmax=8.0):
    p = RNG.randn(n, 3).astype(np.float32)
    p[:, 2] = RNG.uniform(zmin, zmax, n)
    p[:, 0] *= 0.5
    p[:, 1] *= 0.5
    return jnp.asarray(p)


class TestPinhole:
    def test_project_unproject(self):
        cam = make_pinhole()
        pts = rand_points()
        px = cameras.project(cam, pts)
        rays = cameras.unproject(cam, px)
        # ray * z should reproduce the point
        rec = rays * pts[:, 2:3]
        np.testing.assert_allclose(np.asarray(rec), np.asarray(pts), atol=1e-3)

    def test_jacobian_vs_numeric(self):
        cam = make_pinhole()
        pts = rand_points(8)
        J = cameras.project_jac(cam, pts)
        eps = 1e-3
        for k in range(3):
            d = jnp.zeros(3).at[k].set(eps)
            num = (cameras.project(cam, pts + d) -
                   cameras.project(cam, pts - d)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J[..., k]), np.asarray(num),
                                       atol=1e-2, rtol=1e-3)

    def test_K_matrix(self):
        cam = make_pinhole()
        K = np.asarray(cam.K)
        assert K[0, 0] == np.float32(520.9) and K[1, 2] == np.float32(249.7)


class TestKB8:
    def test_project_unproject(self):
        cam = make_kb8()
        pts = rand_points()
        px = cameras.project(cam, pts)
        rays = cameras.unproject(cam, px)
        rec = rays * pts[:, 2:3]
        np.testing.assert_allclose(np.asarray(rec), np.asarray(pts), atol=5e-3)

    def test_wide_angle(self):
        cam = make_kb8()
        # points at ~70 deg off-axis still roundtrip
        pts = jnp.asarray([[2.0, 0.0, 1.0], [0.0, -2.0, 1.0]], jnp.float32)
        px = cameras.project(cam, pts)
        rays = cameras.unproject(cam, px)
        rec = rays / rays[:, 2:3]
        np.testing.assert_allclose(np.asarray(rec[:, :2]), np.asarray(pts[:, :2]),
                                   atol=2e-2)

    def test_jacobian_vs_numeric(self):
        cam = make_kb8()
        pts = rand_points(8, 1.0, 4.0)
        J = cameras.project_jac(cam, pts)
        eps = 1e-3
        for k in range(3):
            d = jnp.zeros(3).at[k].set(eps)
            num = (cameras.project(cam, pts + d) -
                   cameras.project(cam, pts - d)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J[..., k]), np.asarray(num),
                                       atol=2e-2, rtol=1e-2)


class TestRadtan:
    def test_distort_undistort_roundtrip(self):
        dist = jnp.asarray([0.2624, -0.9531, -0.0054, 0.0026, 1.1633],
                           jnp.float32)  # TUM fr1 coefficients
        xn = jnp.asarray(RNG.uniform(-0.3, 0.3, (64, 2)), jnp.float32)
        xd = cameras.radtan_distort(dist, xn)
        back = cameras.radtan_undistort(dist, xd, iters=20)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xn), atol=1e-4)

    def test_undistort_keypoints_noop_when_zero_dist(self):
        cam = make_pinhole()
        px = jnp.asarray(RNG.uniform(0, 640, (32, 2)), jnp.float32)
        out = cameras.undistort_keypoints(cam, px)
        np.testing.assert_allclose(np.asarray(out), np.asarray(px), atol=1e-4)


class TestTwoView:
    def test_triangulate_exact(self):
        pts = rand_points(64, 2.0, 6.0)
        xi = jnp.asarray([0.3, 0.05, 0.0, 0.0, 0.05, 0.0], jnp.float32)
        R21, t21 = lie.se3_exp(xi)
        pts2 = lie.se3_apply(R21, t21, pts)
        ray1 = pts / pts[:, 2:3]
        ray2 = pts2 / pts2[:, 2:3]
        X = cameras.triangulate_two_view(ray1, ray2, R21, t21)
        np.testing.assert_allclose(np.asarray(X), np.asarray(pts), atol=1e-2)

    def test_epipolar_error_zero_for_true_matches(self):
        cam = make_pinhole()
        pts = rand_points(32, 2.0, 6.0)
        xi = jnp.asarray([0.2, 0.0, 0.0, 0.0, 0.03, 0.0], jnp.float32)
        R21, t21 = lie.se3_exp(xi)
        pts2 = lie.se3_apply(R21, t21, pts)
        kp1 = cameras.project(cam, pts)
        kp2 = cameras.project(cam, pts2)
        # epipolar_error takes pose of cam1 in cam2 convention: R12 = R21^T
        R12, t12 = lie.se3_inv(R21, t21)
        err = cameras.epipolar_error(cam, cam, kp2, kp1, R21, t21)
        err2 = cameras.epipolar_error(cam, cam, kp1, kp2, R12, t12)
        assert float(jnp.minimum(err, err2).max()) < 1e-4


def test_jit_compatible():
    cam = make_pinhole()
    pts = rand_points(16)
    f = jax.jit(lambda c, p: cameras.project(c, p))
    out = f(cam, pts)
    assert out.shape == (16, 2)
