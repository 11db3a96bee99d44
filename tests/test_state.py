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


class TestAddObservationsMulti:
    def test_matches_sequential_chain_with_shared_landmarks(self):
        """The fuse pass binds the SAME landmark into several neighbors;
        the fused multi-row update must equal the per-keyframe chain
        (counts accumulate per binding, all binders' bits set)."""
        import jax
        st = mstate.empty_map(CAPS)
        st, slots = mstate.insert_landmarks(
            st, jnp.zeros((16, 3)), jnp.zeros((16, CAPS.D)),
            jnp.zeros((16, 3)), jnp.zeros(16), jnp.ones(16),
            jnp.zeros(16, jnp.int32), jnp.zeros(16, jnp.int32),
            jnp.ones(16, bool))
        for i in range(3):
            st, _ = mstate.insert_keyframe(
                st, jnp.eye(3), jnp.zeros(3), float(i), jnp.asarray(i),
                *kf_args())
        kfs = jnp.asarray([0, 1, 2], jnp.int32)
        lm_idx = jnp.asarray(list(range(16)), jnp.int32)
        rng = np.random.default_rng(0)
        kp_idx = jnp.asarray(
            np.stack([rng.permutation(16) for _ in range(3)]), jnp.int32)
        # landmark 0 bound by ALL three keyframes; 1 by two; rest scattered
        valid = np.zeros((3, 16), bool)
        valid[:, 0] = True
        valid[:2, 1] = True
        valid[0, 5] = valid[1, 7] = valid[2, 9] = True
        valid = jnp.asarray(valid)

        st_multi = mstate.add_observations_multi(st, kfs, kp_idx, lm_idx,
                                                 valid)
        st_seq = st
        for i in range(3):
            st_seq = mstate.add_observations(st_seq, kfs[i], kp_idx[i],
                                             lm_idx, valid[i])
        for name in ("obs_lm", "lm_n_obs", "lm_obs_bits"):
            np.testing.assert_array_equal(
                np.asarray(getattr(st_multi, name)),
                np.asarray(getattr(st_seq, name)), err_msg=name)
        assert int(st_multi.lm_n_obs[0]) == 3
        assert int(st_multi.lm_n_obs[1]) == 2


class TestTwoKillRedundantCull:
    """cull_redundant_keyframes removes up to TWO redundant KFs per call,
    scoring the second with the first kill's observations discounted
    (sequential-cull semantics, reference LocalMapping::KeyFrameCulling
    src/LocalMapping.cc:904)."""
    CAPS2 = mstate.MapCaps(K=8, L=128, N=64, D=8)

    def _kf(self, bind):
        N = self.CAPS2.N
        return (jnp.zeros((N, 2)), jnp.ones((N,), bool),
                jnp.zeros((N, self.CAPS2.D)), jnp.full((N,), jnp.inf),
                jnp.zeros((N,), jnp.int8), bind)

    def _base(self, binds):
        st = mstate.empty_map(self.CAPS2)
        st, _ = mstate.insert_landmarks(
            st, jnp.zeros((128, 3)), jnp.zeros((128, self.CAPS2.D)),
            jnp.zeros((128, 3)), jnp.zeros(128), jnp.ones(128),
            jnp.zeros(128, jnp.int32), jnp.zeros(128, jnp.int32),
            jnp.ones(128, bool))
        for b in binds:
            st, _ = mstate.insert_keyframe(
                st, jnp.eye(3), jnp.zeros(3), 0.0, jnp.asarray(0),
                *self._kf(jnp.asarray(b, jnp.int32)))
        return st

    @staticmethod
    def _obs_counts(st):
        obs = np.asarray(st.obs_lm)
        n = np.zeros(st.caps.L, np.int32)
        for row in obs:
            for l in row[row >= 0]:
                n[l] += 1
        return n

    def test_two_fully_redundant_neighbors_killed_in_one_call(self):
        from dani_slam_tpu.slam import mapping
        # 5 KFs all observing the same 40 landmarks -> n_obs=5 each
        bind = [list(range(40)) + [-1] * 24] * 5
        st = self._base(bind)
        st2 = mapping.cull_redundant_keyframes(st, jnp.asarray(4))
        kept = int(np.sum(np.asarray(st2.kf_mask)))
        assert kept == 3  # two of KF1..KF3 culled; origin+center protected
        # invariants: n_obs matches the obs table; killed bits cleared
        np.testing.assert_array_equal(np.asarray(st2.lm_n_obs),
                                      self._obs_counts(st2))
        killed = np.where(~np.asarray(st2.kf_mask)[:5])[0]
        bits = np.asarray(st2.lm_obs_bits)
        for k in killed:
            assert not np.any(bits[:, k // 32] & (1 << (k % 32)))

    def test_second_kill_respects_first_kills_discount(self):
        from dani_slam_tpu.slam import mapping
        # group A (40 lms) seen by KF0..KF3 (n_obs=4, barely redundant);
        # center KF4 sees a disjoint group B. Killing ONE of KF1..KF3 drops
        # group A to n_obs=3, so the second candidate must NOT be killed.
        bindA = list(range(40)) + [-1] * 24
        bindB = list(range(60, 100)) + [-1] * 24
        st = self._base([bindA, bindA, bindA, bindA, bindB])
        st2 = mapping.cull_redundant_keyframes(st, jnp.asarray(4))
        kept = int(np.sum(np.asarray(st2.kf_mask)))
        assert kept == 4, "exactly one of the n_obs=4 observers may go"
        np.testing.assert_array_equal(np.asarray(st2.lm_n_obs),
                                      self._obs_counts(st2))


class TestSensorAwareCulling(TestTwoKillRedundantCull):
    """Sensor-aware KeyFrameCulling policy (reference:
    src/LocalMapping.cc:904-1056): close-point-only counting for
    depth sensors, temporal-chain guards for inertial maps, and the
    configurable per-pass kill cap."""

    def _base_t(self, binds, times=None, spread=0.0, depth=None):
        """Like _base but with per-KF timestamps and optional pose spread
        (x offset per KF) and a shared per-keypoint depth row."""
        import dataclasses
        st = mstate.empty_map(self.CAPS2)
        st, _ = mstate.insert_landmarks(
            st, jnp.zeros((128, 3)), jnp.zeros((128, self.CAPS2.D)),
            jnp.zeros((128, 3)), jnp.zeros(128), jnp.ones(128),
            jnp.zeros(128, jnp.int32), jnp.zeros(128, jnp.int32),
            jnp.ones(128, bool))
        N = self.CAPS2.N
        dep = (jnp.asarray(depth) if depth is not None
               else jnp.full((N,), jnp.inf))
        for i, b in enumerate(binds):
            t = times[i] if times is not None else float(i)
            st, _ = mstate.insert_keyframe(
                st, jnp.eye(3), jnp.asarray([spread * i, 0.0, 0.0]),
                t, jnp.asarray(i),
                jnp.zeros((N, 2)), jnp.ones((N,), bool),
                jnp.zeros((N, self.CAPS2.D)), dep,
                jnp.zeros((N,), jnp.int8), jnp.asarray(b, jnp.int32))
        return st

    def test_close_only_ignores_far_points(self):
        from dani_slam_tpu.slam import mapping
        # 40 redundant close points + 32 far singleton points per KF:
        # overall redundancy 40/72 < 0.9 (no kill), close-only 40/40 = 1.0
        N = self.CAPS2.N
        binds = []
        for i in range(5):
            row = list(range(40)) + list(range(40 + 17 * i, 57 + 17 * i))
            row += [-1] * (N - len(row))
            binds.append(row)
        depth = np.full(N, 50.0)
        depth[:40] = 1.0                     # close, under close_depth=3
        st = self._base_t(binds, depth=depth)
        st_far = mapping.cull_redundant_keyframes(
            st, jnp.asarray(4), close_only=False)
        assert int(np.sum(np.asarray(st_far.kf_mask))) == 5
        st_close = mapping.cull_redundant_keyframes(
            st, jnp.asarray(4), close_only=True, close_depth=3.0)
        assert int(np.sum(np.asarray(st_close.kf_mask))) == 3
        np.testing.assert_array_equal(np.asarray(st_close.lm_n_obs),
                                      self._obs_counts(st_close))

    def test_inertial_blocks_small_maps(self):
        from dani_slam_tpu.slam import mapping
        bind = [list(range(40)) + [-1] * 24] * 5
        st = self._base_t(bind, times=[0.0, 0.1, 0.2, 0.3, 0.4])
        st2 = mapping.cull_redundant_keyframes(
            st, jnp.asarray(4), inertial=True, nd_window=6)
        assert int(np.sum(np.asarray(st2.kf_mask))) == 5  # map <= Nd: no cull
        st3 = mapping.cull_redundant_keyframes(
            st, jnp.asarray(4), inertial=True, nd_window=4)
        assert int(np.sum(np.asarray(st3.kf_mask))) < 5   # map > Nd: culls

    def test_inertial_time_gap_guard(self):
        import dataclasses
        from dani_slam_tpu.slam import mapping
        bind = [list(range(40)) + [-1] * 24] * 6
        # 1.0 s spacing -> post-kill gap 2.0 s: only allowed once the IMU is
        # initialized AND the candidate left the Nd temporal window; poses
        # spread >2 cm so the barely-moved branch stays off
        st = self._base_t(bind, times=[0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
                          spread=0.5)
        st2 = mapping.cull_redundant_keyframes(
            st, jnp.asarray(5), inertial=True, nd_window=2)
        assert int(np.sum(np.asarray(st2.kf_mask))) == 6  # not initialized
        st_on = dataclasses.replace(st, imu_initialized=jnp.ones((), bool))
        st3 = mapping.cull_redundant_keyframes(
            st_on, jnp.asarray(5), inertial=True, nd_window=2)
        assert int(np.sum(np.asarray(st3.kf_mask))) < 6
        # 10 s spacing: post-kill gap 20 s > 3 s — never allowed
        st_wide = self._base_t(bind, times=[0, 10, 20, 30, 40, 50],
                               spread=0.5)
        st_wide = dataclasses.replace(st_wide,
                                      imu_initialized=jnp.ones((), bool))
        st4 = mapping.cull_redundant_keyframes(
            st_wide, jnp.asarray(5), inertial=True, nd_window=2)
        assert int(np.sum(np.asarray(st4.kf_mask))) == 6

    def test_inertial_dense_chain_and_newest_protected(self):
        from dani_slam_tpu.slam import mapping
        bind = [list(range(40)) + [-1] * 24] * 6
        # 0.2 s spacing -> gap 0.4 s < 0.5 s: killable even pre-init,
        # but never the two newest
        st = self._base_t(bind, times=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
                          spread=0.5)
        st2 = mapping.cull_redundant_keyframes(
            st, jnp.asarray(5), inertial=True, nd_window=2, max_kills=6)
        mask = np.asarray(st2.kf_mask)
        assert mask[5] and mask[0]            # center + origin protected
        assert mask[4]                        # second-newest protected
        assert int(mask.sum()) < 6            # middle ones culled

    def test_max_kills_cap(self):
        from dani_slam_tpu.slam import mapping
        bind = [list(range(40)) + [-1] * 24] * 7
        st = self._base_t(bind)
        st3 = mapping.cull_redundant_keyframes(st, jnp.asarray(6),
                                               max_kills=3)
        assert int(np.sum(np.asarray(st3.kf_mask))) == 4
        np.testing.assert_array_equal(np.asarray(st3.lm_n_obs),
                                      self._obs_counts(st3))
