"""Unit tests for the functional MapState container."""
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import state as mstate

CAPS = mstate.MapCaps(K=8, L=64, N=16, D=8)


def kf_args(n_valid=16, bind=None):
    N = CAPS.N
    kp = jnp.zeros((N, 2))
    kp_mask = jnp.zeros((N,), bool).at[:n_valid].set(True)
    desc = jnp.zeros((N, CAPS.D))
    depth = jnp.full((N,), jnp.inf)
    octave = jnp.zeros((N,), jnp.int8)
    obs = bind if bind is not None else jnp.full((N,), -1, jnp.int32)
    return kp, kp_mask, desc, depth, octave, obs


class TestSlots:
    def test_first_free_slot(self):
        mask = jnp.zeros(8, bool).at[0].set(True).at[1].set(True)
        assert int(mstate.first_free_slot(mask)) == 2

    def test_free_slots_ranked(self):
        mask = jnp.zeros(8, bool).at[0].set(True).at[3].set(True)
        slots = np.asarray(mstate.free_slots(mask, 3))
        np.testing.assert_array_equal(slots, [1, 2, 4])


class TestKeyframes:
    def test_insert_updates_covisibility(self):
        st = mstate.empty_map(CAPS)
        # landmarks 0..7
        st, slots = mstate.insert_landmarks(
            st, jnp.zeros((16, 3)), jnp.zeros((16, CAPS.D)),
            jnp.zeros((16, 3)), jnp.zeros(16), jnp.ones(16),
            jnp.zeros(16, jnp.int32), jnp.zeros(16, jnp.int32),
            jnp.zeros(16, bool).at[:8].set(True))
        bind1 = jnp.full((16,), -1, jnp.int32).at[0].set(0).at[1].set(1)
        st, k0 = mstate.insert_keyframe(st, jnp.eye(3), jnp.zeros(3), 0.0,
                                        jnp.asarray(0), *kf_args(bind=bind1))
        # second KF shares landmark 1 only
        bind2 = jnp.full((16,), -1, jnp.int32).at[3].set(1).at[4].set(2)
        st, k1 = mstate.insert_keyframe(st, jnp.eye(3), jnp.zeros(3), 1.0,
                                        jnp.asarray(1), *kf_args(bind=bind2))
        assert int(st.covis[k0, k1]) == 1
        assert int(st.covis[k1, k0]) == 1
        assert int(st.spanning_parent[k1]) == int(k0)
        # observation counts
        assert int(st.lm_n_obs[1]) == 2
        assert int(st.lm_n_obs[0]) == 1

    def test_cull_keyframe_reparents(self):
        st = mstate.empty_map(CAPS)
        st, slots = mstate.insert_landmarks(
            st, jnp.zeros((16, 3)), jnp.zeros((16, CAPS.D)),
            jnp.zeros((16, 3)), jnp.zeros(16), jnp.ones(16),
            jnp.zeros(16, jnp.int32), jnp.zeros(16, jnp.int32),
            jnp.zeros(16, bool).at[:4].set(True))
        bind = jnp.full((16,), -1, jnp.int32).at[0].set(0)
        ks = []
        for i in range(3):
            st, k = mstate.insert_keyframe(st, jnp.eye(3), jnp.zeros(3),
                                           float(i), jnp.asarray(i),
                                           *kf_args(bind=bind))
            ks.append(int(k))
        # chain parents 0<-1<-2; cull middle
        st2 = mstate.cull_keyframe(st, jnp.asarray(ks[1]))
        assert not bool(st2.kf_mask[ks[1]])
        assert int(st2.spanning_parent[ks[2]]) == ks[0]
        # landmark obs count decremented
        assert int(st2.lm_n_obs[0]) == int(st.lm_n_obs[0]) - 1

    def test_best_covisible_ignores_dead(self):
        st = mstate.empty_map(CAPS)
        st = st.__class__(**{
            **{f.name: getattr(st, f.name)
               for f in __import__('dataclasses').fields(st)},
            "kf_mask": jnp.zeros(8, bool).at[0].set(True).at[1].set(True),
            "covis": jnp.zeros((8, 8), jnp.int32).at[0, 1].set(10)
                     .at[0, 2].set(99)})  # kf2 dead but high covis
        idx, vals = mstate.best_covisible(st, jnp.asarray(0), 2)
        assert int(idx[0]) == 1

    def test_local_map_landmark_mask(self):
        st = mstate.empty_map(CAPS)
        st, slots = mstate.insert_landmarks(
            st, jnp.zeros((16, 3)), jnp.zeros((16, CAPS.D)),
            jnp.zeros((16, 3)), jnp.zeros(16), jnp.ones(16),
            jnp.zeros(16, jnp.int32), jnp.zeros(16, jnp.int32),
            jnp.zeros(16, bool).at[:4].set(True))
        bind = jnp.full((16,), -1, jnp.int32).at[0].set(2)
        st, k0 = mstate.insert_keyframe(st, jnp.eye(3), jnp.zeros(3), 0.0,
                                        jnp.asarray(0), *kf_args(bind=bind))
        sel = jnp.zeros(8, bool).at[int(k0)].set(True)
        lm_mask = mstate.local_map_landmark_mask(st, sel)
        assert bool(lm_mask[2]) and not bool(lm_mask[0])


class TestLandmarks:
    def test_cull_detaches_observations(self):
        st = mstate.empty_map(CAPS)
        st, slots = mstate.insert_landmarks(
            st, jnp.zeros((16, 3)), jnp.zeros((16, CAPS.D)),
            jnp.zeros((16, 3)), jnp.zeros(16), jnp.ones(16),
            jnp.zeros(16, jnp.int32), jnp.zeros(16, jnp.int32),
            jnp.zeros(16, bool).at[:2].set(True))
        bind = jnp.full((16,), -1, jnp.int32).at[0].set(0).at[1].set(1)
        st, k0 = mstate.insert_keyframe(st, jnp.eye(3), jnp.zeros(3), 0.0,
                                        jnp.asarray(0), *kf_args(bind=bind))
        kill = jnp.zeros(64, bool).at[0].set(True)
        st2 = mstate.cull_landmarks(st, kill)
        assert not bool(st2.lm_mask[0])
        assert int(st2.obs_lm[k0, 0]) == -1       # detached
        assert int(st2.obs_lm[k0, 1]) == 1        # untouched

    def test_insert_respects_capacity(self):
        caps = mstate.MapCaps(K=4, L=8, N=4, D=4)
        st = mstate.empty_map(caps)
        # fill all 8 slots
        st, s1 = mstate.insert_landmarks(
            st, jnp.zeros((8, 3)), jnp.zeros((8, 4)), jnp.zeros((8, 3)),
            jnp.zeros(8), jnp.ones(8), jnp.zeros(8, jnp.int32),
            jnp.zeros(8, jnp.int32), jnp.ones(8, bool))
        assert int(st.lm_mask.sum()) == 8
        # further inserts must not clobber occupied slots
        st2, s2 = mstate.insert_landmarks(
            st, jnp.ones((4, 3)), jnp.zeros((4, 4)), jnp.zeros((4, 3)),
            jnp.zeros(4), jnp.ones(4), jnp.zeros(4, jnp.int32),
            jnp.zeros(4, jnp.int32), jnp.ones(4, bool))
        assert int(st2.lm_mask.sum()) == 8
        np.testing.assert_allclose(np.asarray(st2.lm_pos),
                                   np.asarray(st.lm_pos))
