"""Visual-inertial pipeline tests: prediction, initialization, e2e."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, lie, state as mstate
from dani_slam_tpu.ops import imu as imu_ops
from dani_slam_tpu.slam import inertial as inert
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import synthetic

CAM = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
CAPS = mstate.MapCaps(K=64, L=4096, N=256, D=64)


def imu_samples_between(traj_fn, t0, t1, rate=200.0):
    """Perfect IMU for a world trajectory fn(t)->(R_wb, p, v, a, w)."""
    n = max(int((t1 - t0) * rate), 2)
    ts = np.linspace(t0, t1, n + 1)
    gyro, acc, dts = [], [], []
    for i in range(n):
        R, p, v, a, w = traj_fn(ts[i])
        gyro.append(w)
        acc.append(R.T @ (a - np.asarray(imu_ops.G_VEC)))
        dts.append(ts[i + 1] - ts[i])
    return inert.make_window(np.asarray(gyro, np.float32),
                             np.asarray(acc, np.float32),
                             np.asarray(dts, np.float32))


def accel_traj(a_w=np.array([0.6, 0.0, 0.3])):
    """Accelerating straight-line camera looking at +z world targets."""
    def f(t):
        R_wb = np.eye(3)
        p = 0.5 * a_w * t * t
        v = a_w * t
        return R_wb, p, v, a_w, np.zeros(3)
    return f


class TestPrediction:
    def test_predict_matches_truth(self):
        traj = accel_traj()
        t0, t1 = 1.0, 1.2
        win = imu_samples_between(traj, t0, t1)
        st = inert.InertialState()
        R0_wb, p0, v0, _, _ = traj(t0)
        R1_wb, p1, v1, _, _ = traj(t1)
        pre = imu_ops.preintegrate(win.gyro, win.acc, win.dts, win.valid,
                                   jnp.zeros(3), jnp.zeros(3), st.calib)
        R_cw0 = jnp.asarray(R0_wb.T, jnp.float32)
        t_cw0 = jnp.asarray(-R0_wb.T @ p0, jnp.float32)
        R_cw1, t_cw1, v_new = inert.predict_state_imu(
            R_cw0, t_cw0, jnp.asarray(v0, jnp.float32), pre,
            jnp.zeros(3), jnp.zeros(3))
        p_pred = -np.asarray(R_cw1).T @ np.asarray(t_cw1)
        np.testing.assert_allclose(p_pred, p1, atol=2e-3)
        np.testing.assert_allclose(np.asarray(v_new), v1, atol=2e-2)


class TestInertialE2E:
    def _run(self, use_imu: bool, n=40):
        """Accelerating trajectory with IMU; feature dropout in the middle
        breaks constant-velocity prediction but not IMU prediction."""
        world = synthetic.make_world(1500, desc_dim=64, seed=6)

        accel = np.array([1.2, 0.0, 0.0])
        def traj(t):
            R_wb = np.eye(3)
            C = np.array([0.0, 0.0, -10.0]) + 0.5 * accel * t * t
            return R_wb, C, accel * t, accel, np.zeros(3)

        fps = 10.0
        sensor = Sensor.IMU_RGBD if use_imu else Sensor.RGBD
        sys = System(CAM, sensor, caps=CAPS, n_features=256,
                     enable_loop_closing=False)
        sys.tracker.max_frames_between_kf = 4   # KFs often (IMU init data)
        states = []
        errs = []
        for i in range(n):
            t = i / fps
            R_wb, C, v, _, _ = traj(t)
            R_cw = jnp.asarray(R_wb.T, jnp.float32)
            t_cw = jnp.asarray(-R_wb.T @ C, jnp.float32)
            feat, _ = synthetic.render_frame(world, CAM, R_cw, t_cw,
                                             n_max=256, noise_px=0.3,
                                             seed=i, with_depth=True,
                                             time=t)
            win = imu_samples_between(traj, (i - 1) / fps, t) if i else None
            s, R, tt = sys.track_features(
                feat, imu_window=win if use_imu else None)
            states.append(s)
            C_est = -np.asarray(R).T @ np.asarray(tt)
            # map frame == first camera frame; first camera at C0 with R=I
            R0_wb, C0, _, _, _ = traj(0.0)
            C_gt_map = R0_wb.T @ (C - C0)
            if s == "OK":
                errs.append(np.linalg.norm(C_est - C_gt_map))
        return sys, states, errs

    def test_imu_initialization_runs(self):
        sys, states, errs = self._run(use_imu=True)
        assert sys.tracker.inertial.initialized, "IMU never initialized"
        # biases near zero (perfect IMU)
        assert float(jnp.abs(sys.tracker.inertial.bias_g).max()) < 0.01

    def test_tracking_stays_ok(self):
        sys, states, errs = self._run(use_imu=True)
        ok_frac = sum(1 for s in states if s == "OK") / len(states)
        assert ok_frac > 0.9
