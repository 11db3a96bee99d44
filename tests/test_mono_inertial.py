"""Monocular-inertial end-to-end: scale recovery.

Monocular SLAM is scale-free; the IMU observes metric scale + gravity
(reference: InitializeIMU + ApplyScaledRotation rescale the whole map,
src/LocalMapping.cc:1175-1290). This test runs IMU_MONOCULAR on a synthetic
orbit with numerically-derived IMU samples and checks that the map becomes
METRIC after inertial initialization.
"""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from dani_slam_tpu.core import cameras, state as mstate
from dani_slam_tpu.ops import imu as imu_ops
from dani_slam_tpu.slam import inertial as inert
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import synthetic
import pytest

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'

CAM = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
CAPS = mstate.MapCaps(K=64, L=8192, N=512, D=64)

RADIUS, OMEGA = 10.0, 0.5      # orbit radius [m], angular rate [rad/s]


def orbit_pose(t):
    """Analytic orbit (matches utils/synthetic.orbit_trajectory geometry):
    returns (R_cw, t_cw, R_wb, C, v, a)."""
    a_ang = OMEGA * t
    C = np.array([RADIUS * np.sin(a_ang), 0.0, -RADIUS * np.cos(a_ang)])
    v = RADIUS * OMEGA * np.array([np.cos(a_ang), 0.0, np.sin(a_ang)])
    acc = -OMEGA ** 2 * C
    z = -C / np.linalg.norm(C)                   # look at origin
    x = np.cross([0.0, 1.0, 0.0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R_wb = np.stack([x, y, z], axis=1)
    R_cw = R_wb.T
    return R_cw, -R_cw @ C, R_wb, C, v, acc


def imu_window_between(t0, t1, rate=400.0):
    """Numerically-derived IMU samples (gyro from finite rotation
    differences, accel = specific force in body frame)."""
    n = max(int((t1 - t0) * rate), 2)
    ts = np.linspace(t0, t1, n + 1)
    gyro, acc, dts = [], [], []
    for i in range(n):
        dt = ts[i + 1] - ts[i]
        _, _, R0, _, _, a0 = orbit_pose(ts[i])
        _, _, R1, _, _, _ = orbit_pose(ts[i + 1])
        w = Rotation.from_matrix(R0.T @ R1).as_rotvec() / dt
        f_b = R0.T @ (a0 - np.asarray(imu_ops.G_VEC))
        gyro.append(w)
        acc.append(f_b)
        dts.append(dt)
    return inert.make_window(np.asarray(gyro, np.float32),
                             np.asarray(acc, np.float32),
                             np.asarray(dts, np.float32), max_s=64)


class TestMonoInertial:
    def test_scale_recovery(self):
        world = synthetic.make_world(2000, desc_dim=64, seed=21)
        fps = 10.0
        n = 50
        sys = System(CAM, Sensor.IMU_MONOCULAR, caps=CAPS, n_features=512,
                     enable_loop_closing=False)
        sys.tracker.max_frames_between_kf = 3    # KFs often for IMU init
        for i in range(n):
            t = i / fps
            R_cw, t_cw, *_ = orbit_pose(t)
            feat, _ = synthetic.render_frame(
                world, CAM, jnp.asarray(R_cw, jnp.float32),
                jnp.asarray(t_cw, jnp.float32), n_max=512, noise_px=0.3,
                seed=i, time=t)
            win = imu_window_between((i - 1) / fps, t) if i else None
            sys.track_features(feat, imu_window=win)

        assert sys.tracker.inertial.initialized, "IMU never initialized"
        assert sys.tracker.state == "OK"

        # METRIC check without any scale alignment: consecutive-KF camera
        # center distances must match ground truth
        st = sys.tracker.st
        ids = np.nonzero(np.asarray(st.kf_mask))[0]
        times = np.asarray(st.kf_time)[ids]
        order = ids[np.argsort(times)]
        C_est, C_gt = [], []
        for k in order:
            R = np.asarray(st.kf_R[k])
            tt = np.asarray(st.kf_t[k])
            C_est.append(-R.T @ tt)
            _, _, _, C, _, _ = orbit_pose(float(st.kf_time[k]))
            C_gt.append(C)
        C_est = np.stack(C_est)
        C_gt = np.stack(C_gt)
        d_est = np.linalg.norm(np.diff(C_est, axis=0), axis=1)
        d_gt = np.linalg.norm(np.diff(C_gt, axis=0), axis=1)
        keep = d_gt > 0.2       # skip near-identical KF pairs
        ratios = d_est[keep] / d_gt[keep]
        scale_errs = np.abs(ratios - 1.0)
        # without a scale estimate, mono distances would be ~10x off; with
        # gravity/scale init + staged FullInertialBA (stage 0 at init,
        # VIBA1 at 5s — reference profile: <5% at 2s, src/Changelog.md:38)
        # the WHOLE map must be within ~8% of metric, including the two
        # initialization keyframes
        assert np.median(scale_errs) < 0.08, (
            f"map not metric: median scale error "
            f"{np.median(scale_errs):.2%}, ratios {ratios.round(3)}")
        assert np.max(scale_errs) < 0.15, (
            f"segment off-metric: max scale error "
            f"{np.max(scale_errs):.2%}, ratios {ratios.round(3)}")
        assert sys._viba_stage >= 0, "FullInertialBA stage 0 never ran"

        # gravity alignment: world -z is gravity after init, so the orbit
        # plane normal (world y in truth) maps to a fixed axis; check the
        # keyframe "up" axes are consistent (orthogonal to gravity)
        g_dir = np.asarray([0.0, 0.0, -1.0])
        ups = np.stack([-np.asarray(st.kf_R[k])[1] for k in order])
        # all camera -y axes should have a consistent angle to gravity
        cosg = ups @ g_dir
        assert np.std(cosg) < 0.1
