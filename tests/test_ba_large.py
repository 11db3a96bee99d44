"""PCG (Schur-free) bundle adjustment: equivalence with the explicit-Schur
solver and memory-scalability at the default MapCaps."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tests")
from test_ba import CAM, make_problem  # noqa: E402

from dani_slam_tpu.core import lie  # noqa: E402
from dani_slam_tpu.ops import ba as ba_ops  # noqa: E402
from dani_slam_tpu.ops import ba_large  # noqa: E402
import pytest

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'


class TestFullInertialBA:
    """Whole-map VI BA via the Schur-free PCG path (reference:
    Optimizer::FullInertialBA src/Optimizer.cc:392)."""

    def _problem(self, **kw):
        from test_viba import make_vi_problem, CAL
        return make_vi_problem(**kw), CAL

    def test_matches_viba_on_window(self):
        from dani_slam_tpu.ops import viba
        p, CAL = self._problem()
        P = p["R0"].shape[0]
        L = p["lm0"].shape[0]
        args = (p["R0"], p["t0"], p["v0"], jnp.zeros((P, 3)),
                jnp.zeros((P, 3)), p["fixed"], p["lm0"], jnp.ones(L, bool),
                CAM, p["obs_lm"], p["obs_xy"], p["obs_valid"], p["preints"],
                jnp.ones(P - 1, bool), CAL)
        ref = viba.viba_solve(*args, iters=10)
        out = ba_large.full_inertial_ba(*args, iters=10, cg_iters=60)
        R_t, t_t, v_t, pts = p["truth"]
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(t_t),
                                   atol=0.03)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(v_t),
                                   atol=0.15)
        # agrees with the explicit-Schur VI solver
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                                   atol=0.02)

    def test_staged_bias_prior_pins_bias(self):
        """With the strong stage-1 priors (1e2, 1e10) the solved biases must
        stay pinned near zero even under noisy visuals (the reference's
        first FullInertialBA stage, src/LocalMapping.cc:183-233)."""
        p, CAL = self._problem(noise_px=1.0)
        P = p["R0"].shape[0]
        L = p["lm0"].shape[0]
        out = ba_large.full_inertial_ba(
            p["R0"], p["t0"], p["v0"], jnp.zeros((P, 3)), jnp.zeros((P, 3)),
            p["fixed"], p["lm0"], jnp.ones(L, bool), CAM,
            p["obs_lm"], p["obs_xy"], p["obs_valid"], p["preints"],
            jnp.ones(P - 1, bool), CAL, prior_g=1e2, prior_a=1e10,
            iters=8, cg_iters=40)
        assert float(jnp.abs(out.ba).max()) < 1e-3
        assert np.isfinite(float(out.cost))

    def test_tbc_variant(self):
        from test_viba import _test_tbc
        from dani_slam_tpu.ops import imu as imu_ops
        R_bc, t_bc = _test_tbc()
        p, CAL = self._problem(tbc=(R_bc, t_bc))
        calib = imu_ops.ImuCalib(
            CAL.noise_gyro, CAL.noise_acc, CAL.walk_gyro, CAL.walk_acc,
            jnp.asarray(R_bc, jnp.float32), jnp.asarray(t_bc, jnp.float32))
        P = p["R0"].shape[0]
        L = p["lm0"].shape[0]
        out = ba_large.full_inertial_ba(
            p["R0"], p["t0"], p["v0"], jnp.zeros((P, 3)), jnp.zeros((P, 3)),
            p["fixed"], p["lm0"], jnp.ones(L, bool), CAM,
            p["obs_lm"], p["obs_xy"], p["obs_valid"], p["preints"],
            jnp.ones(P - 1, bool), calib, iters=10, cg_iters=60)
        R_t, t_t, v_t, pts = p["truth"]
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(t_t),
                                   atol=0.03)


class TestPCGEquivalence:
    def test_matches_explicit_schur(self):
        (R0, t0, fixed, lm0, lmv, okf, olm, oxy, ov,
         (R_t, t_t, pts)) = make_problem(pose_err=0.03, pt_err=0.08,
                                         noise_px=0.3, L=120)
        ref = ba_ops.ba_solve(R0, t0, fixed, lm0, lmv, CAM, okf, olm, oxy,
                              ov, iters=10)
        out = ba_large.ba_solve_pcg(R0, t0, fixed, lm0, lmv, CAM, okf, olm,
                                    oxy, ov, iters=10, cg_iters=60)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.lm_pos[lmv]),
                                   np.asarray(ref.lm_pos[lmv]), atol=1e-2)

    def test_recovers_truth(self):
        (R0, t0, fixed, lm0, lmv, okf, olm, oxy, ov,
         (R_t, t_t, pts)) = make_problem(pose_err=0.03, pt_err=0.08, L=200)
        out = ba_large.ba_solve_pcg(R0, t0, fixed, lm0, lmv, CAM, okf, olm,
                                    oxy, ov, iters=12, cg_iters=60)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(t_t),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.lm_pos[lmv]),
                                   np.asarray(pts[lmv]), atol=5e-3)

    def test_masks_respected(self):
        (R0, t0, fixed, lm0, lmv, okf, olm, oxy, ov,
         _) = make_problem(pose_err=0.02, pt_err=0.05, L=64)
        lmv = lmv.at[5].set(False)
        ov = ov & (olm != 7)
        lm_before = lm0[5]
        out = ba_large.ba_solve_pcg(R0, t0, fixed, lm0, lmv, CAM, okf, olm,
                                    oxy, ov, iters=6)
        np.testing.assert_allclose(np.asarray(out.lm_pos[5]),
                                   np.asarray(lm_before))

    def test_scales_to_default_caps_shapes(self):
        """The explicit-Schur solver cannot even allocate at the default
        MapCaps (one-hot [256,1024,32768] + H_pl [256,32768,6,3] ~ 34 TB).
        The PCG solver runs the same shapes in O(M) memory. Small
        keyframe/landmark COUNTS keep the test fast; the ARRAYS are at full
        capacity, which is what determines the memory footprint."""
        K, N, L = 256, 1024, 32768
        rng = np.random.RandomState(0)
        P_real, L_real = 6, 400
        pts = np.zeros((L, 3), np.float32)
        pts[:L_real] = rng.randn(L_real, 3) * [3, 2, 1] + [0, 0, 8]
        lmv = jnp.asarray(np.arange(L) < L_real)
        R0 = jnp.broadcast_to(jnp.eye(3), (K, 3, 3)).astype(jnp.float32)
        t_true = np.zeros((K, 3), np.float32)
        t_true[:P_real] = rng.randn(P_real, 3) * 0.3
        obs_kf = jnp.repeat(jnp.arange(K), N)
        obs_lm_np = rng.randint(0, L_real, (K, N))
        pc = pts[obs_lm_np] + t_true[:, None]
        ov_np = (np.arange(K)[:, None] < P_real) & (pc[..., 2] > 0.5)
        from dani_slam_tpu.core import cameras
        xy = cameras.project(CAM, jnp.asarray(pc.reshape(-1, 3)))
        t_noise = rng.randn(K, 3).astype(np.float32) * 0.02
        t_noise[:2] = 0.0          # anchors stay exact (gauge)
        t0 = jnp.asarray(t_true + t_noise)
        fixed = jnp.asarray((np.arange(K) >= P_real) | (np.arange(K) < 2))
        out = ba_large.ba_solve_pcg(
            R0, jnp.asarray(t0), fixed, jnp.asarray(pts), lmv, CAM,
            obs_kf, jnp.asarray(obs_lm_np.reshape(-1)), xy,
            jnp.asarray(ov_np.reshape(-1)), iters=4, cg_iters=30)
        assert np.isfinite(float(out.cost))
        # optimized non-fixed poses moved toward truth
        err0 = np.linalg.norm(np.asarray(t0)[2:P_real] - t_true[2:P_real])
        err1 = np.linalg.norm(np.asarray(out.t)[2:P_real] -
                              t_true[2:P_real])
        assert err1 < 0.5 * err0
