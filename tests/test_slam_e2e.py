"""End-to-end SLAM tests on synthetic worlds (the system-level harness the
reference lacks; SURVEY.md §4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dani_slam_tpu.core import cameras, state as mstate
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import eval as ev
from dani_slam_tpu.utils import synthetic

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'

CAM = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
CAPS = mstate.MapCaps(K=64, L=8192, N=512, D=64)


def run_sequence(sensor, n_frames=40, n_points=1500, radius=10.0,
                 angle_span=0.8, noise_px=0.3, seed=0):
    world = synthetic.make_world(n_points, desc_dim=64, seed=seed)
    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=radius,
                                            angle_span=angle_span)
    sys = System(CAM, sensor, caps=CAPS, n_features=512, seed=seed)
    states = []
    for i in range(n_frames):
        feat, _ = synthetic.render_frame(
            world, CAM, R_gt[i], t_gt[i], n_max=512, noise_px=noise_px,
            seed=seed * 1000 + i, with_depth=(sensor == Sensor.RGBD),
            time=i / 30.0)
        s, R, t = sys.track_features(feat)
        states.append(s)
    return sys, states, (R_gt, t_gt)


class TestMonocular:
    def test_initializes_and_tracks(self):
        sys, states, (R_gt, t_gt) = run_sequence(Sensor.MONOCULAR)
        assert states[-1] == "OK"
        n_ok = sum(1 for s in states if s == "OK")
        assert n_ok >= 30
        assert sys.n_keyframes() >= 2
        assert sys.n_landmarks() > 100

    def test_trajectory_accuracy_scaled_ate(self):
        sys, states, (R_gt, t_gt) = run_sequence(Sensor.MONOCULAR)
        traj = sys.tracker.trajectory
        est = ev.centers_from_tcw(np.stack([p[1] for p in traj]),
                                  np.stack([p[2] for p in traj]))
        times = np.asarray([p[0] for p in traj])
        idx = (times * 30).round().astype(int)
        gt = ev.centers_from_tcw(np.asarray(R_gt)[idx], np.asarray(t_gt)[idx])
        # monocular: scale-aligned ATE; world units ~ meters, orbit r=10
        err = ev.ate_rmse(est, gt, with_scale=True)
        assert err < 0.15, f"scaled ATE {err:.3f} m too high"


class TestRGBD:
    def test_initializes_first_frame(self):
        sys, states, _ = run_sequence(Sensor.RGBD, n_frames=10)
        assert states[0] == "OK"

    def test_metric_trajectory_accuracy(self):
        sys, states, (R_gt, t_gt) = run_sequence(Sensor.RGBD)
        assert all(s == "OK" for s in states)
        traj = sys.tracker.trajectory
        est = ev.centers_from_tcw(np.stack([p[1] for p in traj]),
                                  np.stack([p[2] for p in traj]))
        times = np.asarray([p[0] for p in traj])
        idx = (times * 30).round().astype(int)
        gt = ev.centers_from_tcw(np.asarray(R_gt)[idx], np.asarray(t_gt)[idx])
        err = ev.ate_rmse(est, gt, with_scale=False)  # metric, no scale align
        assert err < 0.05, f"metric ATE {err:.3f} m too high"

    def test_map_grows_and_culls(self):
        sys, states, _ = run_sequence(Sensor.RGBD, n_frames=30)
        assert sys.n_landmarks() > 200
        assert sys.n_landmarks() < CAPS.L


class TestRobustness:
    def test_survives_feature_dropout(self):
        # half the frames have far fewer features
        world = synthetic.make_world(1200, desc_dim=64, seed=3)
        R_gt, t_gt = synthetic.orbit_trajectory(30, radius=10.0,
                                                angle_span=0.6)
        sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=512)
        ok = 0
        for i in range(30):
            n = 512 if i % 2 == 0 else 150
            feat, _ = synthetic.render_frame(
                world, CAM, R_gt[i], t_gt[i], n_max=n, noise_px=0.3,
                seed=7000 + i, with_depth=True, time=i / 30.0)
            # pad to fixed N
            if n < 512:
                pad = 512 - n
                feat = type(feat)(
                    xy=jnp.pad(feat.xy, ((0, pad), (0, 0))),
                    desc=jnp.pad(feat.desc, ((0, pad), (0, 0))),
                    depth=jnp.pad(feat.depth, (0, pad),
                                  constant_values=np.inf),
                    valid=jnp.pad(feat.valid, (0, pad)),
                    time=feat.time)
            s, _, _ = sys.track_features(feat)
            ok += s == "OK"
        assert ok >= 28


class TestPipelined:
    def test_pipelined_matches_sync_results(self):
        """Deferred-decision mode must produce an equivalent trajectory."""
        import dani_slam_tpu.slam.system as system_mod
        outs = {}
        for pipelined in (False, True):
            sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=512,
                         pipelined=pipelined)
            world = synthetic.make_world(1500, desc_dim=64, seed=0)
            R_gt, t_gt = synthetic.orbit_trajectory(25, radius=10.0,
                                                    angle_span=0.5)
            for i in range(25):
                feat, _ = synthetic.render_frame(
                    world, CAM, R_gt[i], t_gt[i], n_max=512, noise_px=0.3,
                    seed=i, with_depth=True, time=i / 30.0)
                sys.track_features(feat)
            sys.shutdown()
            traj = sys.tracker.trajectory
            outs[pipelined] = np.stack([p[2] for p in traj])
        assert len(outs[True]) >= 23
        # trajectories should be near-identical (KF timing may differ by one
        # frame, shifting poses slightly)
        n = min(len(outs[True]), len(outs[False]))
        diff = np.abs(outs[True][:n] - outs[False][:n]).max()
        assert diff < 0.05, f"pipelined trajectory diverged: {diff}"


class TestKeyFrameCulling:
    def test_redundant_kfs_removed(self):
        """A camera that barely moves creates redundant KFs; culling must
        bound keyframe growth (reference: KeyFrameCulling
        src/LocalMapping.cc:904)."""
        world = synthetic.make_world(1200, desc_dim=64, seed=9)
        R_gt, t_gt = synthetic.orbit_trajectory(40, radius=10.0,
                                                angle_span=0.05)  # ~static
        sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=512,
                     enable_loop_closing=False)
        sys.tracker.max_frames_between_kf = 2   # force frequent KFs
        for i in range(40):
            feat, _ = synthetic.render_frame(
                world, CAM, R_gt[i], t_gt[i], n_max=512, noise_px=0.3,
                seed=i, with_depth=True, time=i / 30.0)
            sys.track_features(feat)
        # ~21 KFs would be created without culling; the 90%-redundancy
        # rule (reference threshold) culls the clearly redundant ones
        assert sys.n_keyframes() <= 17, f"{sys.n_keyframes()} KFs kept"
        assert sys.tracker.state == "OK"

    def test_long_revisit_backlog_converges(self):
        """Sustained revisits: three full orbits over the same world. The
        2-kills-per-KF culling cap only AMORTIZES removal — this pins down
        that the backlog converges: the keyframe count must saturate
        instead of growing linearly with each revisit, and stay well
        inside the K cap (round-3 review: nothing measured whether the map
        stays within capacity on long loops; reference: KeyFrameCulling
        runs every mapping cycle, src/LocalMapping.cc:904)."""
        world = synthetic.make_world(1600, desc_dim=64, seed=11)
        n_per_orbit, n_orbits = 60, 3
        n = n_per_orbit * n_orbits
        R_gt, t_gt = synthetic.orbit_trajectory(
            n, radius=10.0, angle_span=n_orbits * 2 * np.pi)
        sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=512,
                     enable_loop_closing=False)
        sys.tracker.max_frames_between_kf = 3   # sustained KF pressure
        kf_at_orbit_end = []
        ok = 0
        for i in range(n):
            feat, _ = synthetic.render_frame(
                world, CAM, R_gt[i], t_gt[i], n_max=512, noise_px=0.3,
                seed=i, with_depth=True, time=i / 30.0)
            s, _, _ = sys.track_features(feat)
            ok += s == "OK"
            if (i + 1) % n_per_orbit == 0:
                sys._resolve_kf_pull()
                kf_at_orbit_end.append(sys.n_keyframes())
        assert ok >= 0.9 * n, f"only {ok}/{n} frames tracked"
        # saturation: revisit orbits must not keep growing the map — the
        # third orbit adds at most a couple of KFs over the second
        assert kf_at_orbit_end[2] - kf_at_orbit_end[1] <= 3, kf_at_orbit_end
        # and the total stays well inside the capacity
        assert kf_at_orbit_end[-1] <= CAPS.K // 2, kf_at_orbit_end


class TestLocalizationMode:
    def test_tracks_without_extending_map(self):
        """Localization mode: pose tracking continues, the map is frozen
        (reference: ActivateLocalizationMode src/System.cc:488)."""
        world = synthetic.make_world(1500, desc_dim=64, seed=13)
        R_gt, t_gt = synthetic.orbit_trajectory(30, radius=10.0,
                                                angle_span=0.5)
        sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=512)
        for i in range(12):
            feat, _ = synthetic.render_frame(world, CAM, R_gt[i], t_gt[i],
                                             n_max=512, noise_px=0.3,
                                             seed=i, with_depth=True,
                                             time=i / 30.0)
            sys.track_features(feat)
        sys.activate_localization_mode()
        kf_before = sys.n_keyframes()
        lm_before = sys.n_landmarks()
        ok = 0
        for i in range(12, 30):
            feat, _ = synthetic.render_frame(world, CAM, R_gt[i], t_gt[i],
                                             n_max=512, noise_px=0.3,
                                             seed=i, with_depth=True,
                                             time=i / 30.0)
            s, _, _ = sys.track_features(feat)
            ok += s == "OK"
        assert sys.n_keyframes() == kf_before
        assert sys.n_landmarks() == lm_before
        assert ok >= 16

    def test_vo_keeps_tracking_outside_map(self):
        """Leaving the mapped region in localization mode: temporal
        last-frame VO points keep the pose alive (reference: UpdateLastFrame
        temporal points + mbVO mode, src/Tracking.cc:2801-2873,2090-2134)."""
        world = synthetic.make_world(3000, desc_dim=64, seed=21,
                                     box=((-6.0, 6.0), (-4.0, 4.0),
                                          (-6.0, 18.0)))
        # forward path: map the first stretch, then keep walking into
        # unmapped territory with mapping frozen
        R_gt, t_gt = synthetic.forward_trajectory(40, step=0.25)
        sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=512)
        for i in range(10):
            feat, _ = synthetic.render_frame(world, CAM, R_gt[i], t_gt[i],
                                             n_max=512, noise_px=0.3,
                                             seed=i, with_depth=True,
                                             time=i / 30.0)
            sys.track_features(feat)
        sys.activate_localization_mode()
        ok = 0
        for i in range(10, 40):
            feat, _ = synthetic.render_frame(world, CAM, R_gt[i], t_gt[i],
                                             n_max=512, noise_px=0.3,
                                             seed=i, with_depth=True,
                                             time=i / 30.0)
            s, R, t = sys.track_features(feat)
            ok += s == "OK"
        # 7.5 m traveled past the mapped stretch — VO must carry most frames
        assert ok >= 24, f"only {ok}/30 frames tracked"
        C = -np.asarray(R).T @ np.asarray(t)
        C_gt = -np.asarray(R_gt[39]).T @ np.asarray(t_gt[39])
        assert np.linalg.norm(C - C_gt) < 0.8, (C, C_gt)


class TestTimestampJump:
    def test_stream_cut_starts_new_map(self):
        """A >1 s timestamp gap stashes the map and restarts (reference:
        src/Tracking.cc:1839-1875)."""
        world = synthetic.make_world(1500, desc_dim=64, seed=5)
        R_gt, t_gt = synthetic.orbit_trajectory(30, radius=10.0,
                                                angle_span=0.5)
        sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=512)
        sys.min_kfs_to_stash = 2
        for i in range(24):
            feat, _ = synthetic.render_frame(world, CAM, R_gt[i], t_gt[i],
                                             n_max=512, noise_px=0.3, seed=i,
                                             with_depth=True, time=i / 30.0)
            sys.track_features(feat, timestamp=i / 30.0)
        assert sys.tracker.state == "OK"
        assert sys.n_keyframes() >= sys.min_kfs_to_stash
        n_maps_before = sys.atlas.n_maps()
        # 5-second stream cut
        t2 = 24 / 30.0 + 5.0
        feat, _ = synthetic.render_frame(world, CAM, R_gt[24], t_gt[24],
                                         n_max=512, noise_px=0.3, seed=24,
                                         with_depth=True, time=t2)
        sys.track_features(feat, timestamp=t2)
        # the old map was stashed into the atlas and tracking restarted
        assert sys.atlas.n_maps() == n_maps_before + 1
