"""Real-data parity recipe (reference: evaluation/evaluate_ate_scale.py +
the BASELINE.json TUM fr3_walking_xyz config).

This environment ships no TUM sequences and no official checkpoints, so the
test SKIPS unless the operator points it at real data. The day data is
available, parity is one command:

    DANI_TUM_SEQ=/data/rgbd_dataset_freiburg3_walking_xyz \\
    DANI_SUPERPOINT_PT=/ckpts/superpoint_v1.pth \\
    DANI_LIGHTGLUE_PT=/ckpts/superpoint_lightglue.pth \\
    DANI_YOLOV5_PT=/ckpts/yolov5s.pt \\
        python -m pytest tests/test_real_data_recipe.py -v

DANI_TUM_SEQ must contain rgb/, depth/, a TUM association file
(assoc.txt / associations.txt, or rgb.txt+depth.txt to auto-associate)
and groundtruth.txt. The checkpoint variables are each optional — absent
ones fall back to the shipped synthetic weights (metrically meaningless on
real imagery, which is why the ATE gate only applies when ALL of them are
provided). DANI_ATE_GATE overrides the pass threshold in meters
(default 0.030, ~the reference's fr3_walking_xyz RMSE +5%; its Table-style
headline numbers are ~0.025 m with dynamic masking on).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

SEQ = os.environ.get("DANI_TUM_SEQ", "")
SP_PT = os.environ.get("DANI_SUPERPOINT_PT", "")
LG_PT = os.environ.get("DANI_LIGHTGLUE_PT", "")
YOLO_PT = os.environ.get("DANI_YOLOV5_PT", "")

pytestmark = pytest.mark.skipif(
    not SEQ, reason="real-data recipe: set DANI_TUM_SEQ to a TUM RGB-D "
    "sequence directory (and optionally DANI_SUPERPOINT_PT / "
    "DANI_LIGHTGLUE_PT / DANI_YOLOV5_PT to official checkpoints)")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fr3 settings (reference: Examples/RGB-D/TUM3.yaml)
TUM3_SETTINGS = """\
Camera.type: PinHole
Camera.fx: 535.4
Camera.fy: 539.2
Camera.cx: 320.1
Camera.cy: 247.6
Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 1024
"""


def _find_associations(tmp_path):
    for name in ("assoc.txt", "associations.txt", "fr3_assoc.txt"):
        p = os.path.join(SEQ, name)
        if os.path.exists(p):
            return p
    # associate rgb.txt/depth.txt by nearest timestamp (the TUM tooling's
    # associate.py semantics, 20 ms gate)
    def load_list(name):
        rows = []
        with open(os.path.join(SEQ, name)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                t, rel = line.split()[:2]
                rows.append((float(t), rel))
        return rows

    rgb = load_list("rgb.txt")
    dep = load_list("depth.txt")
    td = np.asarray([t for t, _ in dep])
    out = []
    used = set()
    for t, rel in rgb:
        j = int(np.argmin(np.abs(td - t)))
        if abs(td[j] - t) < 0.02 and j not in used:
            used.add(j)
            out.append(f"{t:.6f} {rel} {td[j]:.6f} {dep[j][1]}")
    assoc = tmp_path / "assoc.txt"
    assoc.write_text("\n".join(out) + "\n")
    return str(assoc)


@pytest.mark.slow
def test_tum_rgbd_ate(tmp_path):
    """Run rgbd_tum on the real sequence with whatever official checkpoints
    are provided, evaluate ATE against groundtruth.txt, and gate when the
    full official-model stack is in play (BASELINE.json: ATE RMSE within 5%
    of the reference on fr3_walking_xyz)."""
    gt = os.path.join(SEQ, "groundtruth.txt")
    assert os.path.exists(gt), f"no groundtruth.txt in {SEQ}"
    assoc = _find_associations(tmp_path)
    settings = tmp_path / "settings.yaml"
    settings.write_text(TUM3_SETTINGS)
    out = str(tmp_path / "run_")

    cmd = [sys.executable, os.path.join(ROOT, "examples", "rgbd_tum.py"),
           str(settings), SEQ, assoc, "--out-prefix", out]
    if SP_PT:
        cmd += ["--superpoint-pt", SP_PT]
    if LG_PT:
        cmd += ["--lightglue-pt", LG_PT]
    if YOLO_PT:
        cmd += ["--yolov5-pt", YOLO_PT]
    else:
        cmd += ["--detector"]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    assert res.returncode == 0, res.stderr[-4000:]
    traj = out + "CameraTrajectory.txt"
    assert os.path.exists(traj)

    res2 = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", "evaluate_ate.py"),
         gt, traj], capture_output=True, text=True, timeout=600)
    assert res2.returncode == 0, res2.stderr[-2000:]
    print(res2.stdout)
    rmse = None
    for line in res2.stdout.splitlines():
        if line.startswith("absolute_translational_error.rmse"):
            rmse = float(line.split()[1])
    assert rmse is not None, res2.stdout

    official_stack = bool(SP_PT and LG_PT and YOLO_PT)
    gate = float(os.environ.get("DANI_ATE_GATE", "0.030"))
    if official_stack:
        assert rmse <= gate, (
            f"ATE RMSE {rmse:.4f} m exceeds the {gate:.3f} m gate "
            f"(reference fr3_walking_xyz +5%)")
    else:
        # synthetic weights on real imagery: record, don't gate
        print(f"[recipe] partial stack (synthetic weights in play): "
              f"ATE RMSE {rmse:.4f} m — informational only")
