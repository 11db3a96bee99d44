"""Profile the per-frame track program stage by stage on the real device.

Replays the bench workload to a mid-sequence state, then times each
sub-program of track_frame_step separately. Perf scratch tool, not a test.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dani_slam_jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dani_slam_tpu.core import cameras, state as mstate
from dani_slam_tpu.models import superpoint as sp_mod
from dani_slam_tpu.ops import matching, solvers
from dani_slam_tpu.slam import frame as frame_mod, tracking as trk
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import synthetic


def timeit(name, fn, *args, reps=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return out


def main():
    cam = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
    caps = mstate.MapCaps()
    n_feat = 1024
    n_frames = 30
    sp_params = sp_mod.load_default_params()

    rng = np.random.RandomState(0)
    R_gt, t_gt = synthetic.orbit_trajectory(n_frames, radius=10.0,
                                            angle_span=0.35 / 2)
    pts_list = []
    per_batch = 160
    for j in list(range(0, n_frames, 6)) + [n_frames - 1]:
        gx, gy = np.meshgrid(np.linspace(40, 600, 16),
                             np.linspace(40, 440, 10))
        u = (gx + rng.uniform(-12, 12, gx.shape)).ravel()[:per_batch]
        v = (gy + rng.uniform(-12, 12, gy.shape)).ravel()[:per_batch]
        z = rng.uniform(4.0, 11.0, per_batch)
        rays = np.stack([(u - 320.0) / 500.0, (v - 240.0) / 500.0,
                         np.ones(per_batch)], 1)
        pc = (rays * z[:, None]).astype(np.float32)
        Rj, tj = np.asarray(R_gt[j]), np.asarray(t_gt[j])
        pts_list.append((Rj.T @ (pc - tj).T).T.astype(np.float32))
    pts = np.concatenate(pts_list, 0)
    bright = rng.uniform(150, 230, len(pts)).astype(np.float32)
    dfac = jnp.asarray(5000.0, jnp.float32)
    thr = jnp.asarray(0.012, jnp.float32)
    nobox = (jnp.zeros((1, 4), jnp.float32), jnp.zeros((1,), bool))

    sys = System(cam, Sensor.RGBD, caps=caps, sp_params=sp_params,
                 n_features=n_feat, pipelined=True)
    for i in range(n_frames):
        im, de = synthetic.render_image_depth(pts, bright, cam, R_gt[i],
                                              t_gt[i], seed=i)
        feat = frame_mod._frame_rgbd_program(
            sp_params, jnp.asarray(im), jnp.asarray(de), cam,
            jnp.asarray(i / 30.0, jnp.float32), dfac, thr,
            nobox[0], nobox[1], n_max=n_feat, use_boxes=False)
        sys.track_features(feat)
    sys.shutdown()
    st = sys.tracker.st
    print(f"state: {int(np.asarray(st.kf_mask).sum())} KFs, "
          f"{int(np.asarray(st.lm_mask).sum())} landmarks", flush=True)

    tr = sys.tracker
    bind = tr.last_bind
    R, t = tr.R, tr.t
    Rv, tv = (tr.vel if tr.vel is not None else (jnp.eye(3), jnp.zeros(3)))
    k_dev = tr.ref_kf_dev
    mm = sys.matcher

    timeit("track_frame_step (fused)", trk.track_frame_step,
           st, cam, feat, bind, R, t, Rv, tv, k_dev, use_depth=True,
           has_vel=True, matcher_model=mm.model, matcher_params=mm.params)
    timeit("track_motion_model r=15", trk.track_motion_model,
           st, cam, feat, bind, R, t, radius=15.0, use_depth=True)
    timeit("track_local_map", trk.track_local_map,
           st, cam, feat, bind, R, t, use_depth=True)
    timeit("track_reference_keyframe (LG)", trk.track_reference_keyframe,
           st, cam, feat, k_dev, R, t, use_depth=True,
           matcher_model=mm.model, matcher_params=mm.params)

    # track_local_map internals
    has = (bind >= 0) & jnp.take(st.lm_mask, jnp.maximum(bind, 0))
    lm_sel = st.lm_mask

    @jax.jit
    def proj_all():
        return matching.project_landmarks(R, t, cam, st.lm_pos, lm_sel,
                                          st.lm_normal, st.lm_dist_min,
                                          st.lm_dist_max)
    xy, vis, _, dist = timeit("project_landmarks (L=32768)", proj_all)

    octv = matching.predict_scale_level(dist, st.lm_dist_max)
    rad = 4.0 * trk.SCALE_FACTOR ** octv

    @jax.jit
    def big_search():
        return matching.search_by_projection(
            xy, vis, st.lm_desc, feat.xy, feat.valid, feat.desc, radius=rad)
    timeit("search_by_projection (L=32768xN=1024)", big_search)

    @jax.jit
    def kf_select():
        K = st.caps.K
        seen = jnp.zeros((st.caps.L,), bool).at[
            jnp.where(has, bind, 0)].max(has)
        obs_valid = st.obs_lm >= 0
        obs_safe = jnp.where(obs_valid, st.obs_lm, 0)
        overlap = jnp.sum(jnp.take(seen, obs_safe) & obs_valid, axis=1)
        kf_sel = st.kf_mask & (overlap > 0)
        neigh = jnp.any((st.covis > 10) & kf_sel[None, :], axis=1)
        kf_sel = kf_sel | (st.kf_mask & neigh)
        lm_sel2 = mstate.local_map_landmark_mask(st, kf_sel)
        return lm_sel2 & ~seen
    timeit("local KF/landmark selection", kf_select)

    lm_pos_b = st.lm_pos[jnp.where(has, bind, 0)]
    octf = feat.octave_or_zeros().astype(jnp.float32)
    inv_s2 = trk.SCALE_FACTOR ** (-2.0 * octf)

    @jax.jit
    def pose_opt4():
        return solvers.pose_optimize(R, t, cam, lm_pos_b, feat.xy, has,
                                     inv_sigma2=inv_s2,
                                     obs_depth=feat.depth, use_depth=True,
                                     rounds=4)
    timeit("pose_optimize rounds=4 (N=1024)", pose_opt4)

    @jax.jit
    def pose_opt2():
        return solvers.pose_optimize(R, t, cam, lm_pos_b, feat.xy, has,
                                     inv_sigma2=inv_s2,
                                     obs_depth=feat.depth, use_depth=True,
                                     rounds=2)
    timeit("pose_optimize rounds=2", pose_opt2)

    # motion-model internals: N=1024 x N=1024 search
    lm_ids = jnp.where(has, bind, 0)

    @jax.jit
    def mm_search():
        xy2, vis2, _, dist2 = matching.project_landmarks(
            R, t, cam, st.lm_pos[lm_ids], has)
        oc = matching.predict_scale_level(dist2, st.lm_dist_max[lm_ids])
        return matching.search_by_projection(
            xy2, vis2, st.lm_desc[lm_ids], feat.xy, feat.valid, feat.desc,
            radius=15.0 * trk.SCALE_FACTOR ** oc)
    timeit("motion-model search (1024x1024)", mm_search)

    # LightGlue single pair
    from dani_slam_tpu.models import lightglue as lg

    @jax.jit
    def lg_one():
        return lg.match_pair(mm.model, mm.params, st.kf_kp[k_dev],
                             st.kf_desc[k_dev], st.kf_kp_mask[k_dev],
                             feat.xy, feat.desc, feat.valid,
                             cam.width, cam.height)
    timeit("lightglue match_pair (1 pair)", lg_one)

    # frontend for scale
    timeit("frontend program", frame_mod._frame_rgbd_program,
           sp_params, jnp.asarray(im), jnp.asarray(de), cam,
           jnp.asarray(0.5, jnp.float32), dfac, thr, nobox[0], nobox[1],
           n_max=n_feat, use_boxes=False)


if __name__ == "__main__":
    main()
