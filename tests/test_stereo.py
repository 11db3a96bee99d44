"""Stereo matching and stereo SLAM tests."""
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, lie, state as mstate
from dani_slam_tpu.slam import frame as frame_mod
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import synthetic
import pytest

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'

CAM = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
BASELINE = 0.12


def render_stereo(world, R_cw, t_cw, n_max=256, noise=0.2, seed=0):
    """Left/right feature sets of the same world points (right camera offset
    by the baseline along +x of the left camera)."""
    featL, tid = synthetic.render_frame(world, CAM, R_cw, t_cw, n_max=n_max,
                                        noise_px=noise, seed=seed,
                                        with_depth=True)
    # right camera: T_rw = T_rl * T_lw with T_rl = (I, [-b,0,0])
    t_r = t_cw + jnp.asarray([-BASELINE, 0.0, 0.0])
    # project the SAME landmark set for exact correspondence
    ids = np.asarray(tid)
    pts = np.asarray(world.points)[np.maximum(ids, 0)]
    pc = np.asarray(lie.se3_apply(R_cw, t_r, jnp.asarray(pts)))
    xy_r = np.asarray(cameras.project(CAM, jnp.asarray(pc)))
    rng = np.random.RandomState(seed + 1)
    xy_r = xy_r + rng.randn(*xy_r.shape) * noise
    validR = np.asarray(featL.valid) & (pc[:, 2] > 0.3)
    featR = frame_mod.FrameFeatures(
        xy=jnp.asarray(xy_r, jnp.float32), desc=featL.desc,
        depth=jnp.full((n_max,), np.inf), valid=jnp.asarray(validR),
        time=featL.time)
    return featL, featR, tid


class TestStereoMatch:
    def test_recovers_metric_depth(self):
        world = synthetic.make_world(1200, desc_dim=64, seed=7)
        R_gt, t_gt = synthetic.orbit_trajectory(1, radius=10.0)
        featL, featR, tid = render_stereo(world, R_gt[0], t_gt[0])
        depth = frame_mod.stereo_match_depth(
            featL.xy, featL.desc, featL.valid,
            featR.xy, featR.desc, featR.valid, CAM.params[0], BASELINE)
        true_d = np.asarray(featL.depth)
        est = np.asarray(depth)
        ok = np.isfinite(est) & np.asarray(featL.valid)
        assert ok.sum() > 100
        rel = np.abs(est[ok] - true_d[ok]) / true_d[ok]
        assert np.median(rel) < 0.05

    def test_no_matches_across_rows(self):
        # keypoints on different scanlines must not match
        xy_l = jnp.asarray([[100.0, 100.0]])
        xy_r = jnp.asarray([[80.0, 150.0]])
        d = jnp.ones((1, 8)) / (8 ** 0.5)
        depth = frame_mod.stereo_match_depth(
            xy_l, d, jnp.ones(1, bool), xy_r, d, jnp.ones(1, bool),
            jnp.asarray(500.0), jnp.asarray(0.1))
        assert not bool(jnp.isfinite(depth[0]))

    def test_negative_disparity_rejected(self):
        xy_l = jnp.asarray([[100.0, 100.0]])
        xy_r = jnp.asarray([[150.0, 100.0]])   # behind camera
        d = jnp.ones((1, 8)) / (8 ** 0.5)
        depth = frame_mod.stereo_match_depth(
            xy_l, d, jnp.ones(1, bool), xy_r, d, jnp.ones(1, bool),
            jnp.asarray(500.0), jnp.asarray(0.1))
        assert not bool(jnp.isfinite(depth[0]))


class TestStereoSLAM:
    def test_tracks_metric_trajectory(self):
        from dani_slam_tpu.utils import eval as ev
        world = synthetic.make_world(1500, desc_dim=64, seed=8)
        n = 30
        R_gt, t_gt = synthetic.orbit_trajectory(n, radius=10.0,
                                                angle_span=0.6)
        caps = mstate.MapCaps(K=64, L=8192, N=256, D=64)
        sys = System(CAM, Sensor.STEREO, caps=caps, n_features=256)
        for i in range(n):
            featL, featR, _ = render_stereo(world, R_gt[i], t_gt[i], seed=i)
            depth = frame_mod.stereo_match_depth(
                featL.xy, featL.desc, featL.valid,
                featR.xy, featR.desc, featR.valid, CAM.params[0], BASELINE)
            feat = featL._replace(depth=depth, time=jnp.asarray(i / 30.0))
            s, R, t = sys.track_features(feat)
        assert s == "OK"
        traj = sys.tracker.trajectory
        est = ev.centers_from_tcw(np.stack([p[1] for p in traj]),
                                  np.stack([p[2] for p in traj]))
        idx = (np.asarray([p[0] for p in traj]) * 30).round().astype(int)
        gt = ev.centers_from_tcw(np.asarray(R_gt)[idx], np.asarray(t_gt)[idx])
        err = ev.ate_rmse(est, gt, with_scale=False)
        assert err < 0.08, f"stereo metric ATE {err:.3f}"


class TestFisheyeStereo:
    def test_fisheye_depth_recovery(self):
        """Unrectified KB8 stereo: lapping-area matching + ray triangulation
        recovers metric depth (reference: ComputeStereoFishEyeMatches
        src/Frame.cc:1060 + KB8 TriangulateMatches
        src/CameraModels/KannalaBrandt8.cpp:306)."""
        from dani_slam_tpu.core import cameras as cam_mod
        from dani_slam_tpu.core import lie

        camL = cam_mod.Camera.kb8(280.0, 280.0, 320.0, 240.0,
                                  -0.01, 0.02, -0.005, 0.001, 640, 480)
        camR = cam_mod.Camera.kb8(282.0, 282.0, 318.0, 242.0,
                                  -0.012, 0.021, -0.004, 0.0012, 640, 480)
        # right camera 11 cm to the left-cam's +x, slight yaw
        ang = 0.02
        R_rl = jnp.asarray(np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]], np.float32))
        t_rl = jnp.asarray([-0.11, 0.0, 0.0])

        rng = np.random.RandomState(3)
        n = 128
        # depths where an 11 cm baseline still clears the reference's
        # parallax gate (cos > 0.9998 rejected, KannalaBrandt8.cpp:342)
        pc_l = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                         rng.uniform(1.5, 4.5, n)], 1).astype(np.float32)
        xy_l = np.asarray(cam_mod.project(camL, jnp.asarray(pc_l)))
        pc_r = np.asarray(lie.se3_apply(R_rl, t_rl, jnp.asarray(pc_l)))
        xy_r = np.asarray(cam_mod.project(camR, jnp.asarray(pc_r)))
        inb = lambda xy: ((xy[:, 0] > 2) & (xy[:, 0] < 638) &
                          (xy[:, 1] > 2) & (xy[:, 1] < 478))
        ok = inb(xy_l) & inb(xy_r) & (pc_r[:, 2] > 0.1)
        desc = rng.randn(n, 64).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        perm = rng.permutation(n)   # right keypoints in scrambled order

        from dani_slam_tpu.slam import frame as frame_mod
        depth = frame_mod.stereo_fisheye_depth(
            camL, camR, jnp.asarray(xy_l), jnp.asarray(desc),
            jnp.asarray(ok), jnp.asarray(xy_r[perm]),
            jnp.asarray(desc[perm]), jnp.asarray(ok[perm]), R_rl, t_rl)
        depth = np.asarray(depth)
        got = np.isfinite(depth) & ok
        assert got.sum() >= 0.8 * ok.sum(), f"{got.sum()}/{ok.sum()} matched"
        err = np.abs(depth[got] - pc_l[got, 2])
        assert np.median(err) < 0.05, f"median depth err {np.median(err):.3f}"
