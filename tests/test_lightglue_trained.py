"""Shipped LightGlue weights: match quality + System auto-wiring.

Round-1 review: LightGlue ran random-init and was never the primary
matcher. The shipped weights (models/lightglue_train.py, synthetic
homography pairs over the shipped SuperPoint) must deliver real match
quality at the reference's accept gate (score >= 0.05 + mutual,
src/LightGlue.cpp:98-122), and the System must wire the matcher as primary
for SearchByBoW / SearchForTriangulation (src/LGmatcher.cpp:314,983).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from dani_slam_tpu.models import lightglue as lg

MATCHER = lg.load_default_matcher(160, 160)


@pytest.mark.skipif(MATCHER is None, reason="shipped LightGlue weights "
                    "required")
class TestTrainedLightGlue:
    def test_heldout_precision_recall(self):
        from dani_slam_tpu.models import lightglue_train as lgt
        prec, rec, n_gt = lgt.evaluate_matcher(
            MATCHER.params, MATCHER.model, n_pairs=8, batch=4, n_kp=128,
            seed=4321)
        assert n_gt > 100
        assert prec >= 0.70, f"precision {prec:.3f}"
        assert rec >= 0.60, f"recall {rec:.3f}"

    def test_system_auto_wires_matcher(self):
        from dani_slam_tpu.core import cameras, state as mstate
        from dani_slam_tpu.slam.system import Sensor, System
        cam = cameras.Camera.pinhole(300.0, 300.0, 160.0, 120.0, 320, 240)
        # D=256 caps -> the trained matcher loads and reaches the tracker
        sys256 = System(cam, Sensor.RGBD,
                        caps=mstate.MapCaps(K=8, L=512, N=64, D=256),
                        enable_loop_closing=False,
                        enable_relocalization=False)
        assert sys256.matcher is not None
        assert sys256.tracker.matcher is sys256.matcher
        # synthetic-feature maps (D=64) keep the descriptor-NN path
        sys64 = System(cam, Sensor.RGBD,
                       caps=mstate.MapCaps(K=8, L=512, N=64, D=64),
                       enable_loop_closing=False,
                       enable_relocalization=False)
        assert sys64.matcher is None
