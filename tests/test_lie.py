"""Unit tests for Lie-group ops against first principles / scipy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from dani_slam_tpu.core import lie

RNG = np.random.RandomState(0)


def rand_phi(n=32, scale=2.0):
    return jnp.asarray(RNG.randn(n, 3) * scale, jnp.float32)


class TestSO3:
    def test_exp_matches_scipy(self):
        phi = rand_phi()
        R = lie.so3_exp(phi)
        R_ref = ScipyRot.from_rotvec(np.asarray(phi)).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)

    def test_exp_log_roundtrip(self):
        phi = jnp.asarray(RNG.randn(64, 3), jnp.float32)  # |phi| < pi mostly
        phi = phi / (1 + jnp.linalg.norm(phi, axis=-1, keepdims=True) / 3.0)
        back = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(phi), atol=1e-5)

    def test_small_angle(self):
        phi = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
        assert not np.any(np.isnan(np.asarray(lie.so3_log(R))))

    def test_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        phi = jnp.asarray((3.14 * axis)[None], jnp.float32)
        back = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(np.asarray(back), np.asarray(phi), atol=2e-3)

    def test_left_jacobian_numeric(self):
        phi = rand_phi(8, 0.8)
        J = lie.so3_left_jacobian(phi)
        eps = 1e-3
        for k in range(3):
            d = jnp.zeros(3, jnp.float32).at[k].set(eps)
            # exp(phi + d) ~ exp(Jl d) exp(phi)
            lhs = lie.so3_exp(phi + d)
            rhs = lie.so3_exp(jnp.einsum('nij,j->ni', J, d)) @ lie.so3_exp(phi)
            np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                       atol=5e-4)

    def test_jacobian_inverse(self):
        phi = rand_phi(16, 1.0)
        J = lie.so3_left_jacobian(phi)
        Jinv = lie.so3_left_jacobian_inv(phi)
        prod = J @ Jinv
        np.testing.assert_allclose(
            np.asarray(prod), np.tile(np.eye(3), (16, 1, 1)), atol=1e-4)

    def test_hat_vee(self):
        phi = rand_phi(4)
        np.testing.assert_allclose(np.asarray(lie.vee(lie.hat(phi))),
                                   np.asarray(phi))


class TestQuat:
    def test_mat_quat_roundtrip(self):
        q = RNG.randn(64, 4)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q *= np.where(q[:, :1] < 0, -1, 1)
        R = lie.quat_to_mat(jnp.asarray(q, jnp.float32))
        q2 = lie.mat_to_quat(R)
        np.testing.assert_allclose(np.asarray(q2), q, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.randn(32, 6), jnp.float32)
        # keep |phi| < pi so the log is the unique inverse
        xi = xi.at[:, 3:].mul(0.8)
        R, t = lie.se3_exp(xi)
        back = lie.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-4)

    def test_inverse(self):
        xi = jnp.asarray(RNG.randn(8, 6), jnp.float32)
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inv(R, t)
        Rc, tc = lie.se3_mul(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-5)

    def test_apply_matches_mat(self):
        xi = jnp.asarray(RNG.randn(4, 6), jnp.float32)
        R, t = lie.se3_exp(xi)
        p = jnp.asarray(RNG.randn(4, 3), jnp.float32)
        T = lie.se3_to_mat(R, t)
        ph = jnp.concatenate([p, jnp.ones((4, 1))], axis=-1)
        expected = jnp.einsum('nij,nj->ni', T, ph)[:, :3]
        np.testing.assert_allclose(np.asarray(lie.se3_apply(R, t, p)),
                                   np.asarray(expected), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.randn(32, 7) * 0.5, jnp.float32)
        R, t, s = lie.sim3_exp(xi)
        back = lie.sim3_log(R, t, s)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-3)

    def test_reduces_to_se3_at_zero_scale(self):
        xi6 = jnp.asarray(RNG.randn(16, 6), jnp.float32)
        xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], axis=-1)
        R7, t7, s7 = lie.sim3_exp(xi7)
        R6, t6 = lie.se3_exp(xi6)
        np.testing.assert_allclose(np.asarray(s7), np.ones(16), atol=1e-6)
        np.testing.assert_allclose(np.asarray(R7), np.asarray(R6), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t7), np.asarray(t6), atol=1e-4)

    def test_mul_inv(self):
        xi = jnp.asarray(RNG.randn(8, 7) * 0.5, jnp.float32)
        R, t, s = lie.sim3_exp(xi)
        Ri, ti, si = lie.sim3_inv(R, t, s)
        Rc, tc, sc = lie.sim3_mul(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(np.asarray(sc), np.ones(8), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Rc), np.tile(np.eye(3), (8, 1, 1)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-4)

    def test_action_composition(self):
        xa = jnp.asarray(RNG.randn(4, 7) * 0.4, jnp.float32)
        xb = jnp.asarray(RNG.randn(4, 7) * 0.4, jnp.float32)
        Ra, ta, sa = lie.sim3_exp(xa)
        Rb, tb, sb = lie.sim3_exp(xb)
        p = jnp.asarray(RNG.randn(4, 3), jnp.float32)
        lhs = lie.sim3_apply(*lie.sim3_mul(Ra, ta, sa, Rb, tb, sb), p)
        rhs = lie.sim3_apply(Ra, ta, sa, lie.sim3_apply(Rb, tb, sb, p))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_jit_and_vmap_compatible():
    xi = jnp.asarray(RNG.randn(8, 6) * 0.7, jnp.float32)
    f = jax.jit(lambda x: lie.se3_log(*lie.se3_exp(x)))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)
    g = jax.vmap(lambda x: lie.so3_exp(x))
    assert g(xi[:, :3]).shape == (8, 3, 3)
