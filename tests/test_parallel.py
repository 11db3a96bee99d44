"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dani_slam_tpu.parallel import mesh as pmesh
from dani_slam_tpu.parallel import train as ptrain

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'


class TestShardedBA:
    def test_matches_single_device(self):
        import sys
        sys.path.insert(0, "tests")
        from test_ba import CAM, make_problem
        from dani_slam_tpu.ops import ba as ba_ops

        (R0, t0, fixed, lm0, lmv, okf, olm, oxy, ov,
         (R_t, t_t, pts)) = make_problem(pose_err=0.02, pt_err=0.05, L=120)
        # pad L to a multiple of 8 devices
        pad = 128 - lm0.shape[0]
        lm0p = jnp.pad(lm0, ((0, pad), (0, 0)))
        lmvp = jnp.pad(lmv, (0, pad))
        ref = ba_ops.ba_solve(R0, t0, fixed, lm0p, lmvp, CAM, okf, olm, oxy,
                              ov, iters=10)
        m = pmesh.make_mesh(8)
        out = pmesh.sharded_ba_solve(m, R0, t0, fixed, lm0p, lmvp, CAM,
                                     okf, olm, oxy, ov, iters=10)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.lm_pos),
                                   np.asarray(ref.lm_pos), atol=1e-2)

    def test_sharding_actually_applied(self):
        m = pmesh.make_mesh(8)
        lm = jnp.zeros((128, 3))
        lmv = jnp.ones(128, bool)
        lm_s, lmv_s = pmesh.shard_landmarks(m, lm, lmv)
        assert len(lm_s.sharding.device_set) == 8


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_cache():
    """The sharded-training compiles below are the largest CPU compiles in
    the suite; after ~60 test files the accumulated executable cache has
    twice segfaulted XLA:CPU at exactly this point (jax compiler
    backend_compile_and_load). Dropping the caches first keeps the compile
    within bounds; the handful of recompiles afterwards is cheap."""
    jax.clear_caches()
    yield


class TestShardedTraining:
    def test_one_step_runs_and_descends(self):
        # deterministic init (fixed PRNG keys), so re-running with more
        # steps measures actual optimization progress on the same problem
        _, loss1 = ptrain.train_superpoint_sharded(8, steps=1, lr=1e-3)
        _, loss20 = ptrain.train_superpoint_sharded(8, steps=20, lr=1e-3)
        assert np.isfinite(loss20)
        assert loss20 < loss1, (loss1, loss20)

    def test_mesh_shape(self):
        m = ptrain.make_mesh_2d(8)
        assert m.shape["data"] == 4 and m.shape["model"] == 2


class TestShardedGBA:
    def test_matches_single_device(self):
        """Landmark-sharded whole-map PCG GBA == the single-device solve
        (the SURVEY §2.4 'GBA on a second chip' scaling path)."""
        import sys
        sys.path.insert(0, "tests")
        from test_loop_reloc import TestLoopClosing
        from dani_slam_tpu.slam import loopclosing as lc

        st, kf_ids, _, _ = TestLoopClosing()._drifted_loop_state(
            K=8, drift=0.1)
        ref = lc.global_bundle_adjustment(st, _cam_of(), iters=6)
        m = pmesh.make_mesh(8)
        out = pmesh.sharded_gba(m, st, _cam_of(), iters=6)
        np.testing.assert_allclose(np.asarray(out.t)[np.asarray(st.kf_mask)],
                                   np.asarray(ref.kf_t)[np.asarray(st.kf_mask)],
                                   atol=1e-3)
        lmm = np.asarray(st.lm_mask)
        np.testing.assert_allclose(np.asarray(out.lm_pos)[lmm],
                                   np.asarray(ref.lm_pos)[lmm], atol=1e-2)


def _cam_of():
    from test_loop_reloc import CAM
    return CAM
