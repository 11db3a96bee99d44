"""Sim3 RANSAC, Sim3 refinement, and essential-graph optimization tests."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, lie
from dani_slam_tpu.ops import posegraph, sim3

RNG = np.random.RandomState(23)
CAM = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)


def make_sim3_pair(n=100, outliers=0, noise=0.0, s_true=1.4):
    rng = np.random.RandomState(8)
    p1 = rng.randn(n, 3).astype(np.float32)
    p1[:, 2] = rng.uniform(3, 8, n)
    p1 = jnp.asarray(p1)
    xi = jnp.asarray([0.3, -0.1, 0.2, 0.1, -0.15, 0.05, np.log(s_true)],
                     jnp.float32)
    R12, t12, s12 = lie.sim3_exp(xi)
    # pts2 = T12^-1 (pts1)
    Ri, ti, si = lie.sim3_inv(R12, t12, s12)
    p2 = lie.sim3_apply(Ri, ti, si, p1)
    if noise:
        p2 = p2 + noise * jnp.asarray(rng.randn(n, 3), jnp.float32)
    if outliers:
        p2 = p2.at[:outliers].add(
            jnp.asarray(rng.uniform(1, 3, (outliers, 3)), jnp.float32))
    return p1, p2, (R12, t12, s12)


class TestSim3Ransac:
    def test_exact_recovery(self):
        p1, p2, (R_t, t_t, s_t) = make_sim3_pair()
        res = sim3.sim3_ransac(jax.random.PRNGKey(0), CAM, CAM, p1, p2,
                               jnp.ones(p1.shape[0], bool))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_t),
                                   atol=1e-3)
        np.testing.assert_allclose(float(res.s), float(s_t), atol=1e-3)

    def test_with_outliers(self):
        p1, p2, (R_t, t_t, s_t) = make_sim3_pair(outliers=30, noise=0.005)
        res = sim3.sim3_ransac(jax.random.PRNGKey(1), CAM, CAM, p1, p2,
                               jnp.ones(p1.shape[0], bool))
        assert bool(res.ok)
        np.testing.assert_allclose(float(res.s), float(s_t), atol=0.05)
        assert int(res.inliers[:30].sum()) < 5

    def test_fix_scale(self):
        p1, p2, _ = make_sim3_pair(s_true=1.0)
        res = sim3.sim3_ransac(jax.random.PRNGKey(2), CAM, CAM, p1, p2,
                               jnp.ones(p1.shape[0], bool), fix_scale=True)
        assert float(res.s) == 1.0
        assert bool(res.ok)


class TestOptimizeSim3:
    def test_refines_perturbed_estimate(self):
        p1, p2, (R_t, t_t, s_t) = make_sim3_pair(noise=0.002)
        obs1 = cameras.project(CAM, p1)
        obs2 = cameras.project(CAM, p2)
        dxi = jnp.asarray([0.05, -0.03, 0.02, 0.01, -0.02, 0.01, 0.03])
        dR, dt, ds = lie.sim3_exp(dxi)
        R0, t0, s0 = lie.sim3_mul(dR, dt, ds, R_t, t_t, s_t)
        R, t, s, inl, n = sim3.optimize_sim3(
            CAM, CAM, R0, t0, s0, p1, obs1, p2, obs2,
            jnp.ones(p1.shape[0], bool))
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_t), atol=2e-3)
        np.testing.assert_allclose(float(s), float(s_t), rtol=5e-3)
        assert int(n) > 90


class TestEssentialGraph:
    def _chain(self, K=10, drift=0.02):
        """Simulated loop: true poses around a circle; odometry accumulates
        drift; loop edge closes first-last."""
        rng = np.random.RandomState(3)
        R_true, t_true, s_true = [], [], []
        for k in range(K):
            a = 2 * np.pi * k / K
            xi = jnp.asarray([np.sin(a), 0.1 * k, np.cos(a),
                              0.0, a * 0.3, 0.0, 0.0], jnp.float32)
            R, t, s = lie.sim3_exp(xi)
            R_true.append(R)
            t_true.append(t)
            s_true.append(s)
        R_true = jnp.stack(R_true)
        t_true = jnp.stack(t_true)
        s_true = jnp.stack(s_true)

        # noisy odometry chain -> drifted estimates
        R_est = [np.asarray(R_true[0])]
        t_est = [np.asarray(t_true[0])]
        s_est = [1.0]
        for k in range(1, K):
            Rr, tr, sr = posegraph.relative_sim3(
                R_true[k], t_true[k], s_true[k],
                R_true[k - 1], t_true[k - 1], s_true[k - 1])
            dxi = jnp.asarray(rng.randn(7) * drift, jnp.float32)
            dR, dt, ds = lie.sim3_exp(dxi)
            Rr2, tr2, sr2 = lie.sim3_mul(dR, dt, ds, Rr, tr, sr)
            Rk, tk, sk = lie.sim3_mul(
                Rr2, tr2, sr2, jnp.asarray(R_est[-1]),
                jnp.asarray(t_est[-1]), jnp.asarray(s_est[-1]))
            R_est.append(np.asarray(Rk))
            t_est.append(np.asarray(tk))
            s_est.append(float(sk))
        return (R_true, t_true, s_true,
                jnp.asarray(np.stack(R_est), jnp.float32),
                jnp.asarray(np.stack(t_est), jnp.float32),
                jnp.asarray(np.asarray(s_est), jnp.float32))

    def test_loop_closure_reduces_drift(self):
        K = 10
        R_true, t_true, s_true, R_est, t_est, s_est = self._chain(K)

        # edges: consecutive chain + loop edge 0-(K-1)
        edge = jnp.zeros((K, K), bool)
        for k in range(K - 1):
            edge = edge.at[k, k + 1].set(True)
        edge = edge.at[0, K - 1].set(True)

        # measurements: TRUE relative sim3 for every pair (only edges used)
        Rm = jnp.zeros((K, K, 3, 3))
        tm = jnp.zeros((K, K, 3))
        sm = jnp.ones((K, K))
        for i in range(K):
            for j in range(K):
                Rr, tr, sr = posegraph.relative_sim3(
                    R_true[i], t_true[i], s_true[i],
                    R_true[j], t_true[j], s_true[j])
                Rm = Rm.at[i, j].set(Rr)
                tm = tm.at[i, j].set(tr)
                sm = sm.at[i, j].set(sr)

        fixed = jnp.zeros(K, bool).at[0].set(True)
        mask = jnp.ones(K, bool)
        R_o, t_o, s_o = posegraph.optimize_essential_graph(
            R_est, t_est, s_est, edge, Rm, tm, sm, fixed, mask)

        def total_err(Rs, ts):
            return float(sum(np.linalg.norm(np.asarray(ts[k]) -
                                            np.asarray(t_true[k]))
                             for k in range(K)))
        before = total_err(R_est, t_est)
        after = total_err(R_o, t_o)
        assert after < before * 0.2, f"{before=} {after=}"

    def test_4dof_preserves_gravity(self):
        """Yaw+translation graph (reference: OptimizeEssentialGraph4DoF
        src/Optimizer.cc:5292): closes a yaw-drift loop while keeping each
        camera's gravity direction EXACTLY unchanged (the update is a
        world-z rotation + translation only)."""
        K = 10
        rng = np.random.RandomState(5)
        # gravity-aligned trajectory with fixed pitch, varying yaw
        R_true, t_true = [], []
        for k in range(K):
            yaw = 2 * np.pi * k / K
            R_wc = (lie.so3_exp(jnp.asarray([0.0, 0.0, yaw])) @
                    lie.so3_exp(jnp.asarray([0.3, 0.0, 0.0])))
            C = jnp.asarray([3 * np.sin(yaw), 3 * np.cos(yaw), 0.1 * k],
                            jnp.float32)
            R_cw = R_wc.T
            R_true.append(R_cw)
            t_true.append(-R_cw @ C)
        R_true = jnp.stack(R_true)
        t_true = jnp.stack(t_true)

        # drifted estimates: cumulative yaw + translation error
        R_est, t_est = [np.asarray(R_true[0])], [np.asarray(t_true[0])]
        for k in range(1, K):
            dyaw = 0.02 * k
            dRz = lie.so3_exp(jnp.asarray([0.0, 0.0, dyaw]))
            R_wc = (dRz @ R_true[k].T)
            C = -R_true[k].T @ t_true[k] + jnp.asarray(
                rng.randn(3) * 0.05, jnp.float32)
            R_cw = R_wc.T
            R_est.append(np.asarray(R_cw))
            t_est.append(np.asarray(-R_cw @ C))
        R_est = jnp.asarray(np.stack(R_est), jnp.float32)
        t_est = jnp.asarray(np.stack(t_est), jnp.float32)

        edge = jnp.zeros((K, K), bool)
        for k in range(K - 1):
            edge = edge.at[k, k + 1].set(True)
        edge = edge.at[0, K - 1].set(True)
        # Edge4DoF measurements from TRUTH: dR = Ri Rj^T, dt = Ri(-Rj^T tj)+ti
        Rm = jnp.einsum('iab,jcb->ijac', R_true, R_true)
        tm = (-jnp.einsum('ijab,jb->ija', Rm, t_true) +
              t_true[:, None, :])
        fixed = jnp.zeros(K, bool).at[0].set(True)
        R_o, t_o = posegraph.optimize_essential_graph_4dof(
            R_est, t_est, edge, Rm, tm, fixed, jnp.ones(K, bool), iters=15)

        def err(Rs, ts):
            return float(sum(
                np.linalg.norm(-np.asarray(Rs[k]).T @ np.asarray(ts[k]) -
                               (-np.asarray(R_true[k]).T @
                                np.asarray(t_true[k])))
                for k in range(K)))
        assert err(R_o, t_o) < err(R_est, t_est) * 0.3
        # gravity direction in each camera frame is bitwise-preserved up to
        # float tolerance: updates rotate about world z only
        g = np.asarray([0.0, 0.0, -1.0])
        g_before = np.einsum('kij,j->ki', np.asarray(R_est), g)
        g_after = np.einsum('kij,j->ki', np.asarray(R_o), g)
        np.testing.assert_allclose(g_after, g_before, atol=5e-5)

    def test_build_edges(self):
        K = 6
        covis = jnp.zeros((K, K), jnp.int32).at[1, 2].set(150).at[2, 1].set(150)
        parent = jnp.asarray([-1, 0, 1, 2, 3, 4], jnp.int32)
        loops = jnp.zeros((K, K), bool).at[0, 5].set(True)
        mask = jnp.ones(K, bool)
        e = posegraph.build_essential_edges(covis, parent, loops, mask)
        e = np.asarray(e)
        assert e[1, 0] and e[0, 1]       # spanning tree
        assert e[1, 2] and e[2, 1]       # strong covis
        assert e[0, 5] and e[5, 0]       # loop
        assert not e[0, 0]
        assert not e[0, 3]
