"""Bundle adjustment tests on synthetic multi-view scenes."""
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, lie
from dani_slam_tpu.ops import ba

CAM = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)


def make_problem(P=4, L=120, noise_px=0.0, pose_err=0.0, pt_err=0.0, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.randn(L, 3).astype(np.float32)
    pts[:, 0] *= 3.0
    pts[:, 1] *= 2.0
    pts[:, 2] = rng.uniform(4, 12, L)
    pts = jnp.asarray(pts)

    poses = []
    for p in range(P):
        xi = jnp.asarray([0.3 * p, 0.02 * p, 0.0, 0.0, 0.05 * p, 0.0],
                         jnp.float32)
        poses.append(lie.se3_exp(xi))
    R_true = jnp.stack([p[0] for p in poses])
    t_true = jnp.stack([p[1] for p in poses])

    # observations: every pose sees every landmark (dense; masks tested
    # separately)
    obs_kf = jnp.repeat(jnp.arange(P), L)
    obs_lm = jnp.tile(jnp.arange(L), P)
    pc = jnp.einsum('pij,lj->pli', R_true, pts) + t_true[:, None]
    xy = cameras.project(CAM, pc.reshape(-1, 3))
    if noise_px:
        xy = xy + noise_px * jnp.asarray(rng.randn(P * L, 2), jnp.float32)
    obs_valid = jnp.ones(P * L, bool)

    # perturb initial estimates
    R0, t0 = R_true, t_true
    if pose_err:
        dxi = jnp.asarray(rng.randn(P, 6) * pose_err, jnp.float32)
        # keep the two anchor poses at truth (two fixed poses pin the
        # monocular scale gauge; with one, scale is free and the recovered
        # translations legitimately differ from truth)
        dxi = dxi.at[0].set(0.0).at[1].set(0.0)
        dR, dt = lie.se3_exp(dxi)
        R0 = dR @ R_true
        t0 = jnp.einsum('pij,pj->pi', dR, t_true) + dt
    lm0 = pts + (jnp.asarray(rng.randn(L, 3) * pt_err, jnp.float32)
                 if pt_err else 0.0)

    fixed = jnp.zeros(P, bool).at[0].set(True).at[1].set(True)
    return (R0, t0, fixed, lm0, jnp.ones(L, bool),
            obs_kf, obs_lm, xy, obs_valid, (R_true, t_true, pts))


class TestBA:
    def test_noise_free_recovery(self):
        (R0, t0, fixed, lm0, lmv, okf, olm, oxy, ov,
         (R_t, t_t, pts)) = make_problem(pose_err=0.02, pt_err=0.05)
        res = ba.ba_solve(R0, t0, fixed, lm0, lmv, CAM, okf, olm, oxy, ov,
                          iters=15)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_t),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_t),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.lm_pos), np.asarray(pts),
                                   atol=5e-3)

    def test_fixed_pose_untouched(self):
        (R0, t0, fixed, lm0, lmv, okf, olm, oxy, ov, _) = make_problem(
            pose_err=0.02, pt_err=0.05)
        res = ba.ba_solve(R0, t0, fixed, lm0, lmv, CAM, okf, olm, oxy, ov,
                          iters=5)
        np.testing.assert_array_equal(np.asarray(res.R[0]), np.asarray(R0[0]))
        np.testing.assert_array_equal(np.asarray(res.t[0]), np.asarray(t0[0]))

    def test_outlier_observations_flagged(self):
        (R0, t0, fixed, lm0, lmv, okf, olm, oxy, ov,
         (R_t, t_t, pts)) = make_problem(noise_px=0.5, pose_err=0.01,
                                         pt_err=0.02)
        oxy = oxy.at[:20].add(50.0)  # 20 gross outliers
        res = ba.ba_solve(R0, t0, fixed, lm0, lmv, CAM, okf, olm, oxy, ov,
                          iters=15)
        assert int(res.obs_inlier[:20].sum()) == 0
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_t),
                                   atol=0.03)

    def test_invalid_obs_ignored(self):
        (R0, t0, fixed, lm0, lmv, okf, olm, oxy, ov, _) = make_problem()
        # poison half the observations but mark them invalid
        oxy = oxy.at[::2].set(jnp.nan)
        ov = ov.at[::2].set(False)
        res = ba.ba_solve(R0, t0, fixed, lm0, lmv, CAM, okf, olm, oxy, ov,
                          iters=3)
        assert np.isfinite(np.asarray(res.t)).all()
        assert np.isfinite(float(res.cost))

    def test_reduces_reprojection_error(self):
        (R0, t0, fixed, lm0, lmv, okf, olm, oxy, ov,
         (R_t, t_t, pts)) = make_problem(noise_px=1.0, pose_err=0.05,
                                         pt_err=0.2)
        r0, _, _ = ba._residuals(R0, t0, CAM, lm0, okf, olm, oxy)
        before = float(jnp.mean(jnp.sum(r0 * r0, -1)))
        res = ba.ba_solve(R0, t0, fixed, lm0, lmv, CAM, okf, olm, oxy, ov,
                          iters=15)
        r1, _, _ = ba._residuals(res.R, res.t, CAM, res.lm_pos, okf, olm, oxy)
        after = float(jnp.mean(jnp.sum(r1 * r1, -1)))
        assert after < before * 0.05
