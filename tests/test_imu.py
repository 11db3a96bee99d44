"""IMU preintegration tests against analytic trajectories."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import lie
from dani_slam_tpu.ops import imu

CAL = imu.ImuCalib.default()


def simulate(traj_fn, t0, t1, n, bias_g=None, bias_a=None, seed=None):
    """Generate perfect IMU samples for a world trajectory. traj_fn(t) ->
    (R_wb, p_w, v_w, a_w, w_b). Returns stacked measurement arrays."""
    ts = np.linspace(t0, t1, n + 1)
    gyro, acc, dts = [], [], []
    for i in range(n):
        t = ts[i]
        R, p, v, a, w = traj_fn(t)
        # accelerometer measures specific force in body frame
        f_b = R.T @ (a - np.asarray(imu.G_VEC))
        gyro.append(w)
        acc.append(f_b)
        dts.append(ts[i + 1] - ts[i])
    g = np.asarray(gyro, np.float32)
    a_ = np.asarray(acc, np.float32)
    if bias_g is not None:
        g = g + bias_g
    if bias_a is not None:
        a_ = a_ + bias_a
    if seed is not None:
        rng = np.random.RandomState(seed)
        g = g + rng.randn(*g.shape).astype(np.float32) * 1e-4
        a_ = a_ + rng.randn(*a_.shape).astype(np.float32) * 1e-3
    return (jnp.asarray(g), jnp.asarray(a_),
            jnp.asarray(np.asarray(dts, np.float32)),
            jnp.ones(n, bool))


def const_acc_traj(a_w=np.array([0.5, 0.0, 0.0])):
    def f(t):
        R = np.eye(3)
        p = 0.5 * a_w * t * t
        v = a_w * t
        return R, p, v, a_w, np.zeros(3)
    return f


def rotating_traj(w_z=0.7):
    def f(t):
        from scipy.spatial.transform import Rotation
        R = Rotation.from_rotvec([0, 0, w_z * t]).as_matrix()
        return R, np.zeros(3), np.zeros(3), np.zeros(3), np.array([0, 0, w_z])
    return f


class TestPreintegration:
    def test_static_zero_motion(self):
        # stationary IMU: gyro=0, acc measures -g in body frame
        g, a, dts, v = simulate(lambda t: (np.eye(3), np.zeros(3),
                                           np.zeros(3), np.zeros(3),
                                           np.zeros(3)), 0, 1, 100)
        p = imu.preintegrate(g, a, dts, v, jnp.zeros(3), jnp.zeros(3), CAL)
        np.testing.assert_allclose(np.asarray(p.dR), np.eye(3), atol=1e-5)
        # dV = integral of R(a_meas) = -g_vec * t => dV_z = +9.81
        np.testing.assert_allclose(np.asarray(p.dV), [0, 0, 9.81], atol=1e-3)
        assert abs(float(p.dt) - 1.0) < 1e-6

    def test_constant_acceleration(self):
        g, a, dts, v = simulate(const_acc_traj(), 0, 2, 400)
        p = imu.preintegrate(g, a, dts, v, jnp.zeros(3), jnp.zeros(3), CAL)
        # dV = v(2) - v(0) - g*t  (in body frame == world, R = I)
        np.testing.assert_allclose(np.asarray(p.dV),
                                   [1.0, 0, 9.81 * 2], atol=2e-2)
        # dP = p(2) - v0*t - 0.5 g t^2
        np.testing.assert_allclose(np.asarray(p.dP),
                                   [1.0, 0, 0.5 * 9.81 * 4], rtol=2e-2)

    def test_pure_rotation(self):
        g, a, dts, v = simulate(rotating_traj(0.7), 0, 1, 500)
        p = imu.preintegrate(g, a, dts, v, jnp.zeros(3), jnp.zeros(3), CAL)
        R_expect = np.asarray(lie.so3_exp(jnp.asarray([0, 0, 0.7])))
        np.testing.assert_allclose(np.asarray(p.dR), R_expect, atol=2e-3)

    def test_mask_ignores_padding(self):
        g, a, dts, v = simulate(const_acc_traj(), 0, 1, 100)
        # pad with garbage
        g2 = jnp.concatenate([g, jnp.full((50, 3), 999.0)])
        a2 = jnp.concatenate([a, jnp.full((50, 3), 999.0)])
        dts2 = jnp.concatenate([dts, jnp.full((50,), 0.01)])
        v2 = jnp.concatenate([v, jnp.zeros(50, bool)])
        p1 = imu.preintegrate(g, a, dts, v, jnp.zeros(3), jnp.zeros(3), CAL)
        p2 = imu.preintegrate(g2, a2, dts2, v2, jnp.zeros(3), jnp.zeros(3),
                              CAL)
        np.testing.assert_allclose(np.asarray(p1.dP), np.asarray(p2.dP),
                                   atol=1e-5)
        assert abs(float(p1.dt) - float(p2.dt)) < 1e-6

    def test_bias_jacobian_correction(self):
        """First-order bias correction must approximate re-integration."""
        bg = np.array([0.02, -0.01, 0.015], np.float32)
        ba = np.array([0.05, 0.03, -0.04], np.float32)
        g, a, dts, v = simulate(const_acc_traj(), 0, 1, 200,
                                bias_g=bg, bias_a=ba)
        # integrate at zero bias, then correct to the true bias
        p0 = imu.preintegrate(g, a, dts, v, jnp.zeros(3), jnp.zeros(3), CAL)
        dR_c, dV_c, dP_c = imu.corrected_deltas(p0, jnp.asarray(bg),
                                                jnp.asarray(ba))
        # reference: integrate with the true bias directly
        p1 = imu.preintegrate(g, a, dts, v, jnp.asarray(bg), jnp.asarray(ba),
                              CAL)
        np.testing.assert_allclose(np.asarray(dR_c), np.asarray(p1.dR),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dV_c), np.asarray(p1.dV),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(dP_c), np.asarray(p1.dP),
                                   atol=2e-2)

    def test_residual_zero_for_true_states(self):
        g, a, dts, v = simulate(const_acc_traj(), 0, 1, 200)
        p = imu.preintegrate(g, a, dts, v, jnp.zeros(3), jnp.zeros(3), CAL)
        R1 = jnp.eye(3)
        t1 = jnp.zeros(3)
        v1 = jnp.zeros(3)
        R2 = jnp.eye(3)
        t2 = jnp.asarray([0.25, 0, 0])     # 0.5*0.5*1^2
        v2 = jnp.asarray([0.5, 0, 0])
        r = imu.inertial_residual(p, R1, t1, v1, R2, t2, v2,
                                  jnp.zeros(3), jnp.zeros(3))
        assert float(jnp.abs(r).max()) < 2e-2


class TestInertialInit:
    def test_recovers_gravity_and_scale(self):
        """Keyframe chain under constant acceleration, map scaled by 0.5:
        init must recover scale=2 and gravity direction."""
        from scipy.spatial.transform import Rotation
        # trajectory with rotation so gravity is observable
        def traj(t):
            R = Rotation.from_rotvec([0.3 * t, 0.2 * t, 0]).as_matrix()
            a = np.array([0.4, 0.0, 0.2])
            return R, 0.5 * a * t * t, a * t, a, np.array([0.3, 0.2, 0])
        K = 6
        times = np.linspace(0, 2.5, K)
        Rs, ts = [], []
        preints = []
        for i in range(K):
            R, p, v, _, _ = traj(times[i])
            Rs.append(R)
            ts.append(p * 0.5)       # map scale = 0.5 => true scale s = 2
            if i < K - 1:
                g, a, dts, val = simulate(traj, times[i], times[i + 1], 100)
                preints.append(imu.preintegrate(g, a, dts, val, jnp.zeros(3),
                                                jnp.zeros(3), CAL))
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *preints)
        out = imu.inertial_init(jnp.asarray(np.stack(Rs), jnp.float32),
                                jnp.asarray(np.stack(ts), jnp.float32),
                                None, stacked)
        assert abs(float(out["scale"]) - 2.0) < 0.1
        g_dir = np.asarray(out["gravity"])
        g_dir = g_dir / np.linalg.norm(g_dir)
        np.testing.assert_allclose(g_dir, [0, 0, -1], atol=0.05)
        np.testing.assert_allclose(np.asarray(out["velocities"][0]),
                                   [0, 0, 0], atol=0.1)
