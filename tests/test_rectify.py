"""Stereo rectification: geometry of the rectifying rotations and remap
grids (reference: Settings M1l/M2l/M1r/M2r via cv::stereoRectify +
initUndistortRectifyMap, src/Settings.cc; applied at src/System.cc:262-279).
"""
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from dani_slam_tpu.core import cameras, config as cfg
from dani_slam_tpu.ops import rectify


def make_stereo_pair():
    """Two slightly-rotated cameras with a mostly-x baseline + distortion."""
    cam_l = cameras.Camera.pinhole(450.0, 452.0, 320.0, 240.0, 640, 480,
                                   dist=(-0.28, 0.07, 1e-4, -2e-5, 0.0))
    cam_r = cameras.Camera.pinhole(455.0, 457.0, 318.0, 242.0, 640, 480,
                                   dist=(-0.28, 0.07, 1e-5, 2e-5, 0.0))
    # x2 = R x1 + T : right camera 11 cm to the left's right, small rotation
    R = Rotation.from_rotvec([0.01, -0.02, 0.005]).as_matrix()
    T = np.array([-0.11, 0.001, -0.002])
    return cam_l, cam_r, R, T


class TestStereoRectify:
    def test_rectifying_rotations_align_baseline(self):
        cam_l, cam_r, R, T = make_stereo_pair()
        R1, R2, K_new, b = rectify.stereo_rectify(
            np.eye(3), None, np.eye(3), None, R, T, (640, 480))
        # rotations are orthonormal
        np.testing.assert_allclose(R1 @ R1.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-10)
        # rectified relative rotation is identity: R2 R R1^T = I
        np.testing.assert_allclose(R2 @ R @ R1.T, np.eye(3), atol=1e-10)
        # rectified baseline is along +-x only
        t_rect = R2 @ T
        assert abs(abs(t_rect[0]) - b) < 1e-10
        assert abs(t_rect[1]) < 1e-10 and abs(t_rect[2]) < 1e-10

    def test_rows_align_and_disparity_metric(self):
        """Project random 3D points through both RECTIFIED cameras: rows
        must match and disparity must equal f*b/z."""
        cam_l, cam_r, R, T = make_stereo_pair()
        R1, R2, K_new, b = rectify.stereo_rectify(
            np.eye(3), None, np.eye(3), None, R, T, (640, 480))
        rng = np.random.RandomState(0)
        X1 = rng.uniform([-2, -1.5, 3], [2, 1.5, 10], (200, 3))  # cam1 frame
        Xr1 = X1 @ R1.T                      # rectified-left frame
        Xr2 = (X1 @ R.T + T) @ R2.T          # rectified-right frame
        p1 = (Xr1 / Xr1[:, 2:]) @ K_new.T
        p2 = (Xr2 / Xr2[:, 2:]) @ K_new.T
        np.testing.assert_allclose(p1[:, 1], p2[:, 1], atol=1e-6)
        disp = p1[:, 0] - p2[:, 0]
        z = Xr1[:, 2]
        np.testing.assert_allclose(disp, K_new[0, 0] * b / z, rtol=1e-6)

    def test_remap_grid_points_at_raw_projection(self):
        """map[rect_pixel] must equal the RAW (distorted) projection of the
        same ray — the initUndistortRectifyMap contract."""
        cam_l, cam_r, R, T = make_stereo_pair()
        rec = rectify.build_rectifier(cam_l, cam_r, R, T, (640, 480))
        K_new = np.array([[float(rec.cam.params[0]), 0,
                           float(rec.cam.params[2])],
                          [0, float(rec.cam.params[1]),
                           float(rec.cam.params[3])],
                          [0, 0, 1]])
        R1, R2, _, _ = rectify.stereo_rectify(
            np.eye(3), None, np.eye(3), None, R, T, (640, 480))
        rng = np.random.RandomState(1)
        X1 = rng.uniform([-1, -0.8, 3], [1, 0.8, 8], (50, 3))
        # rectified pixel of each point
        Xr = X1 @ R1.T
        p_rect = (Xr / Xr[:, 2:]) @ K_new.T
        # raw projection through the distorted model
        p_raw = np.asarray(cameras.project(cam_l, jnp.asarray(X1,
                                                              jnp.float32)))
        # sample the map at the rectified pixel (bilinear)
        mp = np.asarray(rec.map_l)
        for pr, praw in zip(p_rect, p_raw):
            u, v = pr[0], pr[1]
            if not (1 <= u < 638 and 1 <= v < 478):
                continue
            u0, v0 = int(u), int(v)
            fu, fv = u - u0, v - v0
            val = (mp[v0, u0] * (1 - fu) * (1 - fv) +
                   mp[v0, u0 + 1] * fu * (1 - fv) +
                   mp[v0 + 1, u0] * (1 - fu) * fv +
                   mp[v0 + 1, u0 + 1] * fu * fv)
            np.testing.assert_allclose(val, praw, atol=0.05)

    def test_settings_builds_rectifier(self):
        yaml = """%YAML:1.0
---
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera2.fx: 457.587
Camera2.fy: 456.134
Camera2.cx: 379.999
Camera2.cy: 255.238
Camera2.k1: -0.28368365
Camera2.k2: 0.07451284
Camera2.p1: -0.00010473
Camera2.p2: -3.55590700e-05
Camera.width: 752
Camera.height: 480
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [0.999997256477797, 0.002312067192432, 0.000376008102320, 0.110074137800478,
        -0.002317135723275, 0.999898048506644, 0.014089835846691, 0.000399121547014,
        -0.000343393120620, -0.014090668452683, 0.999900662638081, -0.000853702503358,
         0.0, 0.0, 0.0, 1.0]
"""
        s = cfg.Settings.from_yaml(yaml)
        rec = s.stereo_rectifier()
        assert rec is not None
        # EuRoC baseline ~11 cm
        assert 0.10 < rec.baseline < 0.12
        assert rec.map_l.shape == (480, 752, 2)
        # rectified camera is pinhole without distortion
        assert rec.cam.width == 752

    def test_no_rectifier_without_extrinsics(self):
        s = cfg.Settings.from_yaml("%YAML:1.0\nCamera1.fx: 458.0\n")
        assert s.stereo_rectifier() is None
