"""Config parsing, IO, checkpointing and timing tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dani_slam_tpu.core import config as cfg
from dani_slam_tpu.core import state as mstate
from dani_slam_tpu.utils import checkpoint, io as io_utils, timing

TUM3_YAML = """\
%YAML:1.0
# TUM3-style settings (structure of Examples/RGB-D/TUM3.yaml)
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 535.4
Camera1.fy: 539.2
Camera1.cx: 320.1
Camera1.cy: 247.6
Camera1.k1: 0.0
Camera1.k2: 0.0
Camera.width: 640
Camera.height: 480
Camera.fps: 30
RGBD.DepthMapFactor: 5000.0
ORBextractor.nFeatures: 2000
ORBextractor.iniThFAST: 0.015
ORBextractor.minThFAST: 0.007
ORBextractor.nLevels: 1
ORBextractor.scaleFactor: 1.2
"""


class TestConfig:
    def test_parse_tum_style(self):
        s = cfg.Settings.from_yaml(TUM3_YAML)
        assert s.fx == 535.4 and s.cy == 247.6
        assert s.n_features == 2000
        assert s.ini_th == 0.015 and s.min_th == 0.007
        assert s.depth_map_factor == 5000.0
        cam = s.camera()
        assert cam.width == 640

    def test_stereo_bf_conversion(self):
        s = cfg.Settings.from_yaml(
            "Camera1.fx: 500.0\nCamera.bf: 50.0\n")
        assert abs(s.baseline - 0.1) < 1e-9

    def test_defaults(self):
        s = cfg.Settings.from_yaml("")
        assert s.n_features == 1024


class TestTrajectoryIO:
    def _traj(self, n=5):
        from dani_slam_tpu.core import lie
        rng = np.random.RandomState(0)
        out = []
        for i in range(n):
            R, t = lie.se3_exp(jnp.asarray(rng.randn(6) * 0.2, jnp.float32))
            out.append((i / 30.0, np.asarray(R), np.asarray(t)))
        return out

    def test_tum_roundtrip(self, tmp_path):
        traj = self._traj()
        p = str(tmp_path / "traj.txt")
        io_utils.save_trajectory_tum(p, traj)
        rows = np.loadtxt(p)
        assert rows.shape == (5, 8)
        # positions match camera centers
        C0 = -traj[0][1].T @ traj[0][2]
        np.testing.assert_allclose(rows[0, 1:4], C0, atol=1e-5)

    def test_epoch_time_offset_restores_precision(self, tmp_path):
        """Epoch-scale stamps (TUM/EuRoC ~1.4e9 s) quantize in device
        float32 (ulp ~128 s) — runners rebase to sequence-relative time and
        the savers restore t0, so exported rows keep millisecond-distinct
        absolute timestamps for ATE association."""
        t0 = 1305031102.175          # TUM fr3 epoch start
        # the failure mode the rebase prevents: distinct frame times
        # collapse onto ONE f32 value at epoch scale
        assert np.float32(t0 + 1 / 30.0) == np.float32(t0)
        traj = self._traj()
        # simulate the device round-trip of REBASED times (f32-exact)
        traj = [(float(np.float32(tm)), R, t) for (tm, R, t) in traj]
        p = str(tmp_path / "traj_epoch.txt")
        io_utils.save_trajectory_tum(p, traj, time_offset=t0)
        rows = np.loadtxt(p)
        got = rows[:, 0]
        want = t0 + np.asarray([tm for (tm, _, _) in traj])
        np.testing.assert_allclose(got, want, atol=1e-3)
        assert len(np.unique(got)) == len(got), "timestamps collapsed"

    def test_kitti_format(self, tmp_path):
        p = str(tmp_path / "kitti.txt")
        io_utils.save_trajectory_kitti(p, self._traj())
        rows = np.loadtxt(p)
        assert rows.shape == (5, 12)

    def test_associate(self):
        ta = np.asarray([0.0, 0.1, 0.2])
        tb = np.asarray([0.001, 0.105, 0.5])
        pairs = io_utils.associate_timestamps(ta, tb)
        assert pairs == [(0, 0), (1, 1)]


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        caps = mstate.MapCaps(K=8, L=64, N=16, D=8)
        st = mstate.empty_map(caps)
        st, k = mstate.insert_keyframe(
            st, jnp.eye(3), jnp.ones(3), 1.5, jnp.asarray(7),
            jnp.zeros((16, 2)), jnp.ones(16, bool), jnp.zeros((16, 8)),
            jnp.full((16,), jnp.inf), jnp.zeros((16,), jnp.int8),
            jnp.full((16,), -1, jnp.int32))
        cb = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
        p = str(tmp_path / "map.npz")
        checkpoint.save_map(p, st, codebook=cb)
        st2, extras = checkpoint.load_map(p, expect_codebook=cb)
        assert st2.caps == caps
        assert bool(st2.kf_mask[0])
        np.testing.assert_allclose(np.asarray(st2.kf_t[0]), 1.0)
        np.testing.assert_allclose(np.asarray(extras["codebook"]),
                                   np.asarray(cb))

    def test_checksum_mismatch_rejected(self, tmp_path):
        caps = mstate.MapCaps(K=4, L=16, N=8, D=8)
        st = mstate.empty_map(caps)
        cb = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
        p = str(tmp_path / "map.npz")
        checkpoint.save_map(p, st, codebook=cb)
        with pytest.raises(ValueError, match="checksum"):
            checkpoint.load_map(p, expect_codebook=cb + 1.0)


class TestTiming:
    def test_stage_timer(self, tmp_path):
        t = timing.StageTimer()
        with t.stage("track"):
            pass
        t.record("map", 0.01)
        s = t.summary()
        assert "track" in s and s["map"]["mean_ms"] == 10.0
        t.save_csv(str(tmp_path / "stats.csv"))
        t.save_means(str(tmp_path / "means.txt"))
        assert os.path.exists(tmp_path / "stats.csv")


class TestViewer:
    def test_draw_map_and_frame(self, tmp_path):
        import jax.numpy as jnp
        from dani_slam_tpu.utils import viewer
        caps = mstate.MapCaps(K=8, L=64, N=16, D=8)
        st = mstate.empty_map(caps)
        st, _ = mstate.insert_keyframe(
            st, jnp.eye(3), jnp.zeros(3), 0.0, jnp.asarray(0),
            jnp.zeros((16, 2)), jnp.ones(16, bool), jnp.zeros((16, 8)),
            jnp.full((16,), jnp.inf), jnp.zeros((16,), jnp.int8),
            jnp.full((16,), -1, jnp.int32))
        p = str(tmp_path / "map.png")
        viewer.draw_map(st, trajectory=[(0.0, np.eye(3), np.zeros(3))],
                        path=p)
        assert os.path.getsize(p) > 1000
        p2 = str(tmp_path / "frame.png")
        viewer.draw_frame(np.zeros((48, 64)), np.asarray([[10.0, 10.0]]),
                          np.asarray([True]), bindings=np.asarray([3]),
                          boxes=np.asarray([[5.0, 5.0, 20.0, 20.0]]),
                          box_mask=np.asarray([True]), state="OK", path=p2)
        assert os.path.getsize(p2) > 1000


@pytest.mark.slow
class TestSystemPersistence:
    def test_save_load_atlas_and_relocalize(self, tmp_path):
        """Build a small map, save, load into a fresh System, verify the
        returning camera relocalizes against the loaded map (reference:
        localization-from-saved-Atlas workflow, System.cc:162)."""
        import jax.numpy as jnp
        from dani_slam_tpu.core import cameras
        from dani_slam_tpu.slam.system import Sensor, System
        from dani_slam_tpu.utils import synthetic
        CAM = cameras.Camera.pinhole(500., 500., 320., 240., 640, 480)
        caps = mstate.MapCaps(K=32, L=4096, N=256, D=64)
        world = synthetic.make_world(1200, desc_dim=64, seed=11)
        R_gt, t_gt = synthetic.orbit_trajectory(12, radius=10.,
                                                angle_span=0.25)
        sys1 = System(CAM, Sensor.RGBD, caps=caps, n_features=256, seed=3)
        for i in range(12):
            feat, _ = synthetic.render_frame(world, CAM, R_gt[i], t_gt[i],
                                             n_max=256, noise_px=0.3,
                                             seed=i, with_depth=True,
                                             time=i / 30.0)
            sys1.track_features(feat)
        p = str(tmp_path / "atlas.npz")
        sys1.save_atlas(p)

        sys2 = System(CAM, Sensor.RGBD, caps=caps, n_features=256, seed=3)
        sys2.load_atlas(p)
        assert sys2.n_keyframes() == sys1.n_keyframes()
        # a frame from a mapped viewpoint relocalizes
        feat, _ = synthetic.render_frame(world, CAM, R_gt[5], t_gt[5],
                                         n_max=256, noise_px=0.3, seed=99,
                                         with_depth=True, time=1.0)
        s, R, t = sys2.track_features(feat)
        assert s == "OK"

    def test_keyframe_trajectory_save(self, tmp_path):
        import jax.numpy as jnp
        from dani_slam_tpu.core import cameras
        from dani_slam_tpu.slam.system import Sensor, System
        from dani_slam_tpu.utils import synthetic
        CAM = cameras.Camera.pinhole(500., 500., 320., 240., 640, 480)
        caps = mstate.MapCaps(K=32, L=4096, N=256, D=64)
        world = synthetic.make_world(1000, desc_dim=64, seed=12)
        R_gt, t_gt = synthetic.orbit_trajectory(10, radius=10.,
                                                angle_span=0.3)
        sys1 = System(CAM, Sensor.RGBD, caps=caps, n_features=256)
        for i in range(10):
            feat, _ = synthetic.render_frame(world, CAM, R_gt[i], t_gt[i],
                                             n_max=256, noise_px=0.3,
                                             seed=i, with_depth=True,
                                             time=i / 30.0)
            sys1.track_features(feat)
        p = str(tmp_path / "kf.txt")
        sys1.save_keyframe_trajectory_tum(p)
        rows = np.loadtxt(p)
        assert rows.shape[0] == sys1.n_keyframes() and rows.shape[1] == 8
