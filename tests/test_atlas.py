"""Atlas multi-map tests: map creation on loss, transform, merge."""
import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras, lie, state as mstate
from dani_slam_tpu.slam import atlas as atlas_mod
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import synthetic
import pytest

pytestmark = pytest.mark.slow  # e2e tier; fast tier runs -m 'not slow'

CAM = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
CAPS = mstate.MapCaps(K=64, L=4096, N=256, D=64)


def small_map(seed=0, n_kf=3, offset=0.0):
    world = synthetic.make_world(800, desc_dim=64, seed=seed)
    R_gt, t_gt = synthetic.orbit_trajectory(n_kf, radius=10.0,
                                            angle_span=0.2)
    st = mstate.empty_map(CAPS)
    for k in range(n_kf):
        feat, _ = synthetic.render_frame(world, CAM, R_gt[k], t_gt[k],
                                         n_max=CAPS.N, seed=seed * 10 + k,
                                         with_depth=True)
        rays = cameras.unproject(CAM, feat.xy)
        Xc = rays * feat.depth[:, None]
        Xw = lie.se3_apply(*lie.se3_inv(R_gt[k], t_gt[k]), Xc) + offset
        good = feat.valid & jnp.isfinite(feat.depth)
        st, slots = mstate.insert_landmarks(
            st, Xw, feat.desc, Xw, jnp.zeros(CAPS.N) + 0.5,
            jnp.zeros(CAPS.N) + 50.0, jnp.full((CAPS.N,), k, jnp.int32),
            jnp.full((CAPS.N,), k, jnp.int32), good)
        bind = jnp.where(good & (slots >= 0), slots, -1)
        st, _ = mstate.insert_keyframe(
            st, R_gt[k], t_gt[k] - offset * 0, k / 5.0, jnp.asarray(k),
            feat.xy, feat.valid, feat.desc, feat.depth,
            jnp.zeros((CAPS.N,), jnp.int8), bind)
    return st


class TestTransform:
    def test_identity(self):
        st = small_map()
        st2 = atlas_mod.transform_map(st, jnp.eye(3), jnp.zeros(3),
                                      jnp.ones(()))
        np.testing.assert_allclose(np.asarray(st2.lm_pos),
                                   np.asarray(st.lm_pos), atol=1e-5)
        np.testing.assert_allclose(np.asarray(st2.kf_t),
                                   np.asarray(st.kf_t), atol=1e-4)

    def test_rigid_preserves_reprojection(self):
        st = small_map()
        xi = jnp.asarray([0.5, -0.3, 0.2, 0.1, 0.2, -0.1])
        R, t = lie.se3_exp(xi)
        st2 = atlas_mod.transform_map(st, R, t, jnp.ones(()))
        # reprojection of landmark into its KF must be unchanged
        k = 0
        obs = st.obs_lm[k]
        row = int(np.nonzero(np.asarray(obs) >= 0)[0][0])
        lm = int(obs[row])
        p1 = cameras.project(CAM, lie.se3_apply(
            st.kf_R[k], st.kf_t[k], st.lm_pos[lm]))
        p2 = cameras.project(CAM, lie.se3_apply(
            st2.kf_R[k], st2.kf_t[k], st2.lm_pos[lm]))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=0.05)


class TestMerge:
    def test_merge_capacity_and_content(self):
        a = small_map(seed=1, n_kf=3)
        b = small_map(seed=2, n_kf=2)
        merged, kf_map, lm_map, ok = atlas_mod.merge_into(a, b)
        assert bool(ok)
        assert int(merged.kf_mask.sum()) == 5
        assert int(merged.lm_mask.sum()) == \
            int(a.lm_mask.sum()) + int(b.lm_mask.sum())
        # a source keyframe's content survived at its mapped slot
        src_k = int(np.nonzero(np.asarray(b.kf_mask))[0][0])
        dst_k = int(kf_map[src_k])
        np.testing.assert_allclose(np.asarray(merged.kf_t[dst_k]),
                                   np.asarray(b.kf_t[src_k]))
        # observation ids translated
        src_obs = np.asarray(b.obs_lm[src_k])
        dst_obs = np.asarray(merged.obs_lm[dst_k])
        row = np.nonzero(src_obs >= 0)[0][0]
        assert dst_obs[row] == int(lm_map[src_obs[row]])

    def test_merge_rejected_when_full(self):
        caps = mstate.MapCaps(K=4, L=256, N=64, D=64)
        a = mstate.empty_map(caps)
        a = a.__class__(**{**{f.name: getattr(a, f.name) for f in
                              __import__('dataclasses').fields(a)},
                           "kf_mask": jnp.ones(4, bool)})
        b = mstate.empty_map(caps)
        b = b.__class__(**{**{f.name: getattr(b, f.name) for f in
                              __import__('dataclasses').fields(b)},
                           "kf_mask": jnp.ones(4, bool)})
        _, _, _, ok = atlas_mod.merge_into(a, b)
        assert not bool(ok)


class TestAtlasE2E:
    def test_new_map_on_unrecoverable_loss_then_merge(self):
        """Teleport to a disjoint area -> tracking cannot recover -> a new
        map starts there; teleport back to the first area -> a third map
        starts and place recognition WELDS it into the stored first map
        (reference: lost -> CreateMapInAtlas; revisit -> MergeLocal)."""
        world_a = synthetic.make_world(1500, desc_dim=64, seed=4)
        # world B: same box, shifted far away, different descriptors
        wb = synthetic.make_world(1500, desc_dim=64, seed=14)
        world_b = wb._replace(points=wb.points +
                              jnp.asarray([500.0, 0.0, 0.0]))
        R_a, t_a = synthetic.orbit_trajectory(30, radius=10.0,
                                              angle_span=0.4)
        # orbit B around the shifted center
        R_b = R_a
        t_b = jnp.stack([t_a[i] - R_a[i] @ jnp.asarray([500.0, 0.0, 0.0])
                         for i in range(30)])

        # stable per-phase render seeds: hash(str) is salted per process
        # (PYTHONHASHSEED), which made this test nondeterministic and let a
        # regression ship in round 2 — seeds must be literals
        seeds = {"A": 111, "B": 555, "A2": 111}
        sys = System(CAM, Sensor.RGBD, caps=CAPS, n_features=256,
                     enable_relocalization=False)
        sys.lost_frames_before_new_map = 3
        sys.min_kfs_to_stash = 2
        phases = ([("A", world_a, R_a, t_a, i) for i in range(25)] +
                  [("B", world_b, R_b, t_b, i) for i in range(25)] +
                  [("A2", world_a, R_a, t_a, i) for i in range(25)])
        max_maps = 0
        for fi, (tag, world, Rs, ts, i) in enumerate(phases):
            feat, _ = synthetic.render_frame(
                world, CAM, Rs[i], ts[i], n_max=256, noise_px=0.3,
                seed=seeds[tag] + i, with_depth=True, time=fi / 30.0)
            sys.track_features(feat)
            max_maps = max(max_maps, sys.atlas.n_maps())
        # maps were created for the disjoint areas (A stashed at B entry,
        # B stashed at A2 entry)...
        assert max_maps >= 2, "no new map was ever created"
        # ...and the revisit merged the third map into the stored first one,
        # CONSUMING a stored map (n_maps must DROP below its peak)
        assert sys.atlas.n_maps() < max_maps, "no merge happened"
        assert sys.tracker.state == "OK"
        # the merged active map carries the stored A keyframes + A2's own
        assert sys.n_keyframes() >= 4

        # BoW preservation across the merge (round-1 review: the stored
        # map's rows were zeroed): relocalization against an ORIGINAL
        # first-map view must still succeed after the weld
        feat, _ = synthetic.render_frame(
            world_a, CAM, R_a[2], t_a[2], n_max=256, noise_px=0.3,
            seed=seeds["A"] + 2, with_depth=True, time=99.0)
        out = sys._relocalize(sys.tracker, feat)
        assert out is not None, "reloc against pre-merge keyframes failed"
        R_rel, t_rel, bind, _reloc_kf = out
        # the map world frame is camera-0's frame (first pose = identity):
        # expected pose is the gt RELATIVE pose to frame 0
        from dani_slam_tpu.core import lie
        R_exp, t_exp = lie.se3_mul(R_a[2], t_a[2],
                                   *lie.se3_inv(R_a[0], t_a[0]))
        np.testing.assert_allclose(np.asarray(t_rel), np.asarray(t_exp),
                                   atol=0.1)

        # welding quality: the moved current KF's observations reproject
        # tightly after SearchAndFuse + welding BA
        st = sys.tracker.st
        k = sys.tracker.ref_kf
        obs = np.asarray(st.obs_lm[k])
        sel = obs >= 0
        assert sel.sum() > 30
        from dani_slam_tpu.core import cameras as camod
        lm = np.asarray(st.lm_pos)[obs[sel]]
        pc = np.asarray(st.kf_R[k]) @ lm.T + np.asarray(st.kf_t[k])[:, None]
        px = np.asarray(camod.project(CAM, jnp.asarray(pc.T, jnp.float32)))
        err = np.linalg.norm(px - np.asarray(st.kf_kp[k])[sel], axis=1)
        assert np.median(err) < 2.0, f"weld reprojection {np.median(err)}"
