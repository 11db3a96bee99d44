"""Two-hop SearchInNeighbors fuse (reference: LocalMapping::SearchInNeighbors
covisible-of-covisible target extension, src/LocalMapping.cc:735-748).

A landmark observed only by a SECOND-hop neighbor (covisible with a
covisible keyframe, zero shared observations with the new keyframe) must
still fuse: reverse direction binds it to the new keyframe's unbound
keypoint, forward direction binds the new keyframe's landmarks into the
second-hop target. One-hop-only fuse (n_neighbors2=0) leaves both unbound —
re-triangulation would then mint duplicates."""
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, state as mstate
from dani_slam_tpu.slam import mapping

CAPS = mstate.MapCaps(K=8, L=256, N=128, D=32)
CAM = cameras.Camera.pinhole(100.0, 100.0, 32.0, 32.0, 64, 64)


def _unit_descs(n, d, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, d)
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def _build():
    """KF1 sees groups A+B, KF2 sees B+C (+ unbound keypoints matching A),
    the new KF0 sees A (+ unbound keypoints matching C). Covisibility:
    KF0-KF1 via A, KF1-KF2 via B, KF0-KF2 none."""
    nA = nB = nC = 30
    n_lm = nA + nB + nC
    rng = np.random.RandomState(1)
    x = rng.uniform(-1.4, 1.4, n_lm)
    y = rng.uniform(-1.4, 1.4, n_lm)
    pos = np.stack([x, y, np.full(n_lm, 5.0)], 1).astype(np.float32)
    desc = _unit_descs(n_lm, CAPS.D)
    uv = np.stack([100.0 * x / 5.0 + 32.0, 100.0 * y / 5.0 + 32.0], 1)
    A = np.arange(0, nA)
    B = np.arange(nA, nA + nB)
    C = np.arange(nA + nB, n_lm)

    st = mstate.empty_map(CAPS)
    view = pos - np.asarray([0, 0, -1.0])
    dist = np.linalg.norm(view, axis=1)
    st, slots = mstate.insert_landmarks(
        st, jnp.asarray(pos), jnp.asarray(desc),
        jnp.asarray(view / dist[:, None]),
        jnp.asarray(dist * 0.5), jnp.asarray(dist * 2.0),
        jnp.zeros(n_lm, jnp.int32), jnp.zeros(n_lm, jnp.int32),
        jnp.ones(n_lm, bool))
    slots = np.asarray(slots)

    def kf(groups_bound, groups_free):
        ids = np.concatenate([np.concatenate(groups_bound)] +
                             ([np.concatenate(groups_free)]
                              if groups_free else []))
        n = len(ids)
        xy = np.zeros((CAPS.N, 2), np.float32)
        de = np.zeros((CAPS.N, CAPS.D), np.float32)
        valid = np.zeros(CAPS.N, bool)
        bind = np.full(CAPS.N, -1, np.int32)
        xy[:n] = uv[ids]
        de[:n] = desc[ids]
        valid[:n] = True
        nb = sum(len(g) for g in groups_bound)
        bind[:nb] = slots[np.concatenate(groups_bound)]
        return (jnp.asarray(xy), jnp.asarray(valid), jnp.asarray(de),
                jnp.full((CAPS.N,), jnp.inf), jnp.zeros(CAPS.N, jnp.int8),
                jnp.asarray(bind))

    st, k1 = mstate.insert_keyframe(st, jnp.eye(3), jnp.zeros(3), 0.0,
                                    jnp.asarray(0), *kf([A, B], []))
    st, k2 = mstate.insert_keyframe(st, jnp.eye(3), jnp.zeros(3), 1.0,
                                    jnp.asarray(1), *kf([B, C], [A]))
    st, k0 = mstate.insert_keyframe(st, jnp.eye(3), jnp.zeros(3), 2.0,
                                    jnp.asarray(2), *kf([A], [C]))
    return st, int(k0), int(k1), int(k2), slots, (A, B, C)


def _bound_count(st, k, lm_slots):
    obs = np.asarray(st.obs_lm[k])
    return sum(1 for s in lm_slots if s in set(obs[obs >= 0]))


class TestTwoHopFuse:
    def test_one_hop_misses_second_neighbors(self):
        st, k0, k1, k2, slots, (A, B, C) = _build()
        st2 = mapping.fuse_into_neighbors(st, CAM, jnp.asarray(k0),
                                          n_neighbors=1, n_neighbors2=0)
        assert _bound_count(st2, k0, slots[C]) == 0
        assert _bound_count(st2, k2, slots[A]) == 0

    def test_two_hop_fuses_both_directions(self):
        st, k0, k1, k2, slots, (A, B, C) = _build()
        st2 = mapping.fuse_into_neighbors(st, CAM, jnp.asarray(k0),
                                          n_neighbors=1, n_neighbors2=2)
        # reverse: the second-hop target's exclusive landmarks (C) bind to
        # kf_new's unbound keypoints
        assert _bound_count(st2, k0, slots[C]) >= 25
        # forward: kf_new's landmarks (A) bind into the second-hop target
        assert _bound_count(st2, k2, slots[A]) >= 25
        # observation bookkeeping stays consistent
        obs = np.asarray(st2.obs_lm)
        n = np.zeros(CAPS.L, np.int32)
        for row in obs:
            for li in row[row >= 0]:
                n[li] += 1
        np.testing.assert_array_equal(np.asarray(st2.lm_n_obs), n)

    def test_two_hop_dedupes_repeated_candidates(self):
        """A second-hop keyframe reachable through SEVERAL one-hop
        neighbors appears once in the target set (the reference's
        mnFuseTargetForKF stamp): observation counts must not double."""
        st, k0, k1, k2, slots, (A, B, C) = _build()
        st2 = mapping.fuse_into_neighbors(st, CAM, jnp.asarray(k0),
                                          n_neighbors=3, n_neighbors2=3)
        obs = np.asarray(st2.obs_lm)
        # no keypoint slot binds the same landmark twice within one KF
        for k in range(CAPS.K):
            row = obs[k][obs[k] >= 0]
            assert len(row) == len(set(row.tolist()))
