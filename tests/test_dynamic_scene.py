"""Dynamic-scene end-to-end test — the flagship DANI-SLAM behavior.

Reference: keypoints on moving objects corrupt the map and the pose
estimate; deleting keypoints inside dynamic-class boxes
(src/SPextractor.cpp:314-352) and vetoing keyframes in dynamic-dominated
views (src/Tracking.cc:3252-3280) preserves accuracy. This test builds a
world with a coherently-moving point cluster and verifies that supplying
dynamic boxes measurably improves trajectory accuracy.
"""
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, lie, state as mstate
from dani_slam_tpu.ops import frontend
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import eval as ev
from dani_slam_tpu.utils import synthetic
import pytest

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'

CAM = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
CAPS = mstate.MapCaps(K=64, L=8192, N=512, D=64)


def run_dynamic_sequence(mask_dynamic: bool, n_frames=35, n_static=500,
                         n_moving=1500, seed=0):
    """Static world + a moving cluster crossing the view. The moving points
    travel coherently (like a vehicle), which is the poison case for SLAM:
    RANSAC can lock onto the consistent-but-moving structure."""
    rng = np.random.RandomState(seed)
    static = synthetic.make_world(n_static, desc_dim=64, seed=seed)
    moving0 = synthetic.make_world(n_moving, desc_dim=64, seed=seed + 99)
    # concentrate the moving cluster in front of the camera's view
    # the mover must DOMINATE the view to poison tracking — a small moving
    # minority is already rejected by the Huber/chi2 machinery (verified:
    # 12% movers leave ATE at 2 mm with no masking at all)
    mv_pts0 = np.asarray(moving0.points) * 0.9 + np.asarray([0, 0, 1.0])
    vel = np.asarray([0.18, 0.04, 0.0])          # m/frame, coherent motion

    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                            angle_span=0.5)
    sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=512,
                 enable_loop_closing=False)
    for i in range(n_frames):
        mv_pts = mv_pts0 + vel * i
        world_i = synthetic.SyntheticWorld(
            points=jnp.concatenate([static.points, jnp.asarray(
                mv_pts, jnp.float32)]),
            desc=jnp.concatenate([static.desc, moving0.desc]))
        feat, tid = synthetic.render_frame(
            world_i, CAM, R_gt[i], t_gt[i], n_max=512, noise_px=0.3,
            seed=seed * 100 + i, with_depth=True, time=i / 30.0)
        if mask_dynamic:
            # bounding box of the moving cluster in this view (what YOLO
            # would produce for the moving object)
            pc = np.asarray(lie.se3_apply(R_gt[i], t_gt[i],
                                          jnp.asarray(mv_pts, jnp.float32)))
            vis = pc[:, 2] > 0.3
            if vis.sum() > 3:
                uv = np.asarray(cameras.project(
                    CAM, jnp.asarray(pc[vis], jnp.float32)))
                box = jnp.asarray([[uv[:, 0].min() - 5, uv[:, 1].min() - 5,
                                    uv[:, 0].max() + 5, uv[:, 1].max() + 5]],
                                  jnp.float32)
                valid2 = frontend.suppress_in_boxes(
                    feat.xy, feat.valid, box, jnp.asarray([True]))
                feat = feat._replace(valid=valid2)
        sys.track_features(feat)
    traj = sys.tracker.trajectory
    est = ev.centers_from_tcw(np.stack([p[1] for p in traj]),
                              np.stack([p[2] for p in traj]))
    idx = (np.asarray([p[0] for p in traj]) * 30).round().astype(int)
    gt = ev.centers_from_tcw(np.asarray(R_gt)[idx], np.asarray(t_gt)[idx])
    return ev.ate_rmse(est, gt, with_scale=False), sys


class TestDynamicScene:
    def test_masking_improves_accuracy(self):
        ate_masked, sys_m = run_dynamic_sequence(mask_dynamic=True)
        ate_unmasked, _ = run_dynamic_sequence(mask_dynamic=False)
        # masked run must be accurate in absolute terms...
        assert ate_masked < 0.06, f"masked ATE {ate_masked:.3f}"
        # ...and clearly better than tracking through the moving object
        assert ate_masked < ate_unmasked * 0.7, (
            f"masking did not help: {ate_masked:.3f} vs {ate_unmasked:.3f}")

    def test_masked_map_contains_no_moving_landmarks(self):
        """Landmarks created inside the dynamic region would be at stale
        positions; with masking the map must be static-only (checked via
        reprojection consistency of the final map)."""
        _, sys_m = run_dynamic_sequence(mask_dynamic=True)
        st = sys_m.tracker.st
        # all landmarks should have healthy found/visible ratios — moving
        # points would decay (their projections drift off)
        mask = np.asarray(st.lm_mask)
        ratio = (np.asarray(st.lm_found)[mask] /
                 np.maximum(np.asarray(st.lm_visible)[mask], 1))
        assert np.median(ratio) > 0.5
