"""End-to-end test of the dataset-runner CLI on a generated TUM-format
sequence (the reference's verification style: example binaries as
integration tests, SURVEY.md §4)."""
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'

sys.path.insert(0, os.path.dirname(__file__))

SETTINGS = """%YAML:1.0
Camera1.fx: 300.0
Camera1.fy: 300.0
Camera1.cx: 160.0
Camera1.cy: 120.0
Camera.width: 320
Camera.height: 240
RGBD.DepthMapFactor: 5000.0
ORBextractor.nFeatures: 256
"""


def write_pgm(path, img, maxv):
    with open(path, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n{maxv}\n".encode())
        f.write(img.astype(">u2" if maxv > 255 else "u1").tobytes())


@pytest.fixture(scope="module")
def tum_dataset(tmp_path_factory):
    from test_image_pipeline import render_image
    seq = tmp_path_factory.mktemp("tum_mini")
    os.makedirs(seq / "rgb")
    os.makedirs(seq / "depth")
    rng = np.random.RandomState(2)
    pts = rng.uniform(-4, 4, (400, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(4, 9, 400)
    colors = rng.uniform(120, 215, 400).astype(np.float32)
    assoc = []
    rgb_list = ["# ts path"]
    for i in range(5):
        t = i / 30.0
        img, depth = render_image(jnp.asarray(pts), colors, jnp.eye(3),
                                  jnp.asarray([-0.05 * i, 0.0, 0.0],
                                              jnp.float32))
        write_pgm(str(seq / "rgb" / f"{i}.pgm"), img, 255)
        write_pgm(str(seq / "depth" / f"{i}.pgm"), depth, 65535)
        assoc.append(f"{t:.4f} rgb/{i}.pgm {t:.4f} depth/{i}.pgm")
        rgb_list.append(f"{t:.4f} rgb/{i}.pgm")
    (seq / "assoc.txt").write_text("\n".join(assoc))
    (seq / "rgb.txt").write_text("\n".join(rgb_list))
    (seq / "settings.yaml").write_text(SETTINGS)
    return seq


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args):
    env = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=env, cwd=REPO, timeout=600)


class TestRgbdTumCLI:
    def test_full_run(self, tum_dataset, tmp_path):
        out = str(tmp_path) + "/"
        r = run_cli([f"{REPO}/examples/rgbd_tum.py",
                     str(tum_dataset / "settings.yaml"), str(tum_dataset),
                     str(tum_dataset / "assoc.txt"), "--out-prefix", out])
        assert r.returncode == 0, r.stderr[-800:]
        traj = np.loadtxt(out + "CameraTrajectory.txt")
        assert traj.shape[0] >= 4 and traj.shape[1] == 8
        assert os.path.exists(out + "ExecMean.txt")

    def test_evaluate_ate_cli(self, tum_dataset, tmp_path):
        # self-comparison: ATE of a trajectory against itself is 0
        out = str(tmp_path) + "/"
        r = run_cli([f"{REPO}/examples/rgbd_tum.py",
                     str(tum_dataset / "settings.yaml"), str(tum_dataset),
                     str(tum_dataset / "assoc.txt"), "--out-prefix", out])
        assert r.returncode == 0, r.stderr[-800:]
        r2 = run_cli([f"{REPO}/examples/evaluate_ate.py",
                      out + "CameraTrajectory.txt",
                      out + "CameraTrajectory.txt"])
        assert r2.returncode == 0, r2.stderr[-500:]
        line = [l for l in r2.stdout.splitlines() if "rmse" in l][0]
        assert float(line.split()[1]) < 1e-6


@pytest.fixture(scope="module")
def kitti_dataset(tmp_path_factory):
    """Tiny KITTI-odometry-format stereo sequence (image_0/ image_1/
    times.txt) rendered from the shared synthetic scene."""
    from test_image_pipeline import render_image
    seq = tmp_path_factory.mktemp("kitti_mini")
    os.makedirs(seq / "image_0")
    os.makedirs(seq / "image_1")
    rng = np.random.RandomState(4)
    pts = rng.uniform(-4, 4, (400, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(4, 9, 400)
    colors = rng.uniform(120, 215, 400).astype(np.float32)
    baseline = 0.2
    times = []
    for i in range(5):
        t = i / 10.0
        t_l = jnp.asarray([-0.05 * i, 0.0, 0.0], jnp.float32)
        img_l, _ = render_image(jnp.asarray(pts), colors, jnp.eye(3), t_l)
        # right camera: shifted by +baseline along x (T_cw translation
        # gains -R*C with C = C_left + [b,0,0])
        t_r = t_l + jnp.asarray([-baseline, 0.0, 0.0], jnp.float32)
        img_r, _ = render_image(jnp.asarray(pts), colors, jnp.eye(3), t_r)
        write_pgm(str(seq / "image_0" / f"{i:06d}.png"), img_l, 255)
        write_pgm(str(seq / "image_1" / f"{i:06d}.png"), img_r, 255)
        times.append(f"{t:.6e}")
    # (PGM bytes with .png names — the loaders sniff magic, not suffixes)
    (seq / "times.txt").write_text("\n".join(times))
    (seq / "settings.yaml").write_text(SETTINGS + "Camera.bf: 60.0\n")
    return seq


class TestStereoKittiCLI:
    def test_full_run(self, kitti_dataset, tmp_path):
        out = str(tmp_path) + "/"
        r = run_cli([f"{REPO}/examples/stereo_kitti.py",
                     str(kitti_dataset / "settings.yaml"),
                     str(kitti_dataset), "--out-prefix", out])
        assert r.returncode == 0, r.stderr[-800:]
        traj = np.loadtxt(out + "CameraTrajectory.txt")
        # KITTI format: 12 numbers per row (3x4 pose)
        assert traj.shape[0] >= 4 and traj.shape[1] == 12


TUMVI_SETTINGS = """%YAML:1.0
Camera1.type: "KannalaBrandt8"
Camera1.fx: 140.0
Camera1.fy: 140.0
Camera1.cx: 160.0
Camera1.cy: 120.0
Camera1.k0: 0.0034
Camera1.k1: 0.0008
Camera1.k2: 0.0
Camera1.k3: 0.0
Camera1.overlappingBegin: 0
Camera1.overlappingEnd: 320
Camera2.type: "KannalaBrandt8"
Camera2.fx: 140.0
Camera2.fy: 140.0
Camera2.cx: 160.0
Camera2.cy: 120.0
Camera2.k0: 0.0034
Camera2.k1: 0.0008
Camera2.k2: 0.0
Camera2.k3: 0.0
Camera2.overlappingBegin: 0
Camera2.overlappingEnd: 320
Camera.width: 320
Camera.height: 240
Stereo.T_c1_c2: !!opencv-matrix
   rows: 4
   cols: 4
   dt: f
   data: [1.0, 0.0, 0.0, 0.3,
          0.0, 1.0, 0.0, 0.0,
          0.0, 0.0, 1.0, 0.0,
          0.0, 0.0, 0.0, 1.0]
ORBextractor.nFeatures: 256
IMU.NoiseGyro: 0.00016
IMU.NoiseAcc: 0.0028
IMU.GyroWalk: 0.000022
IMU.AccWalk: 0.00086
IMU.Frequency: 200.0
"""


@pytest.fixture(scope="module")
def tumvi_dataset(tmp_path_factory):
    """Tiny TUM-VI mav0-format stereo-fisheye sequence: KB8 cameras,
    lateral constant-velocity motion, gravity-only IMU."""
    from dani_slam_tpu.core import cameras
    seq = tmp_path_factory.mktemp("tumvi_mini")
    for sub in ("cam0/data", "cam1/data", "imu0"):
        os.makedirs(seq / "mav0" / sub)
    rng = np.random.RandomState(6)
    pts = rng.uniform(-4, 4, (400, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2.5, 6, 400)
    colors = rng.uniform(120, 215, 400).astype(np.float32)
    cam = cameras.Camera.kb8(140.0, 140.0, 160.0, 120.0,
                             0.0034, 0.0008, 0.0, 0.0, 320, 240)

    def render_kb8(t_cw):
        pc = np.asarray(pts) + np.asarray(t_cw)[None, :]
        z = pc[:, 2]
        uv = np.asarray(cameras.project(cam, jnp.asarray(pc, jnp.float32)))
        vis = (z > 0.5) & (uv[:, 0] > 4) & (uv[:, 0] < 316) & \
              (uv[:, 1] > 4) & (uv[:, 1] < 236)
        img = np.full((240, 320), 40.0, np.float32)
        yy, xx = np.mgrid[0:240, 0:320]
        for i in np.argsort(-z):
            if not vis[i]:
                continue
            du, dv = xx - uv[i, 0], yy - uv[i, 1]
            m = (np.abs(du) < 6) & (np.abs(dv) < 6)
            g = colors[i] * np.exp(-(du ** 2 + dv ** 2) / (2 * 2.0 ** 2))
            img = np.where(m, np.maximum(img, 40 + g), img)
        return img.astype(np.uint8)

    rows0, rows1 = ["#t,fn"], ["#t,fn"]
    for i in range(6):
        ns = int(i / 10.0 * 1e9)
        img_l = render_kb8([-0.06 * i, 0.0, 0.0])
        img_r = render_kb8([-0.06 * i - 0.3, 0.0, 0.0])
        write_pgm(str(seq / "mav0" / "cam0" / "data" / f"{ns}.png"),
                  img_l, 255)
        write_pgm(str(seq / "mav0" / "cam1" / "data" / f"{ns}.png"),
                  img_r, 255)
        rows0.append(f"{ns},{ns}.png")
        rows1.append(f"{ns},{ns}.png")
    (seq / "mav0" / "cam0" / "data.csv").write_text("\n".join(rows0))
    (seq / "mav0" / "cam1" / "data.csv").write_text("\n".join(rows1))
    # constant-velocity motion: gyro 0, accelerometer reads -g only
    from dani_slam_tpu.ops import imu as imu_ops
    g_meas = -np.asarray(imu_ops.G_VEC)
    imu_rows = ["#t,wx,wy,wz,ax,ay,az"]
    for k in range(120):
        ns = int(k * 5e-3 * 1e9)
        imu_rows.append(f"{ns},0,0,0,{g_meas[0]},{g_meas[1]},{g_meas[2]}")
    (seq / "mav0" / "imu0" / "data.csv").write_text("\n".join(imu_rows))
    (seq / "settings.yaml").write_text(TUMVI_SETTINGS)
    return seq


class TestStereoInertialTumViCLI:
    def test_full_run(self, tumvi_dataset, tmp_path):
        """KB8 fisheye stereo + IMU through the real runner (reference:
        Examples/Stereo-Inertial/stereo_inertial_tum_vi.cc)."""
        out = str(tmp_path) + "/"
        r = run_cli([f"{REPO}/examples/stereo_inertial_tum_vi.py",
                     str(tumvi_dataset / "settings.yaml"),
                     str(tumvi_dataset), "--out-prefix", out])
        assert r.returncode == 0, r.stderr[-800:]
        # EuRoC trajectory format is CSV: t_ns,px,py,pz,qw,qx,qy,qz
        traj = np.loadtxt(out + "CameraTrajectory.txt", delimiter=",")
        assert traj.shape[0] >= 4 and traj.shape[1] == 8
