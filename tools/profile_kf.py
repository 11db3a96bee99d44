"""Profile the keyframe-step stages on the real device.

Builds a realistic mid-sequence MapState by replaying the bench workload,
then times each mapping sub-program separately (amortized over repeats).
Not part of the test suite — a perf scratch tool.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dani_slam_jax_cache")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dani_slam_tpu.core import cameras, state as mstate
from dani_slam_tpu.models import superpoint as sp_mod
from dani_slam_tpu.slam import frame as frame_mod, mapping
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import synthetic


def timeit(name, fn, *args, reps=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
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
    feats = []
    for i in range(n_frames):
        im, de = synthetic.render_image_depth(pts, bright, cam, R_gt[i],
                                              t_gt[i], seed=i)
        feat = frame_mod._frame_rgbd_program(
            sp_params, jnp.asarray(im), jnp.asarray(de), cam,
            jnp.asarray(i / 30.0, jnp.float32), dfac, thr,
            nobox[0], nobox[1], n_max=n_feat, use_boxes=False)
        feats.append(feat)
        sys.track_features(feat)
    sys.shutdown()
    st = sys.tracker.st
    print(f"state: {int(np.asarray(st.kf_mask).sum())} KFs, "
          f"{int(np.asarray(st.lm_mask).sum())} landmarks")

    k = sys.tracker.ref_kf_dev
    feat = feats[-1]
    bind = sys.tracker.last_bind
    R, t = sys.tracker.R, sys.tracker.t
    mm = sys.matcher

    # full fused keyframe step
    timeit("keyframe_step (full, do_ba=True)", mapping.keyframe_step,
           st, cam, feat.xy, feat.valid, feat.desc, feat.depth, bind, R, t,
           feat.time, jnp.asarray(99), use_depth=True, do_ba=True,
           max_depth=40.0, feat_octave=feat.octave_or_zeros(),
           matcher_model=mm.model, matcher_params=mm.params)
    timeit("keyframe_step (do_ba=False)", mapping.keyframe_step,
           st, cam, feat.xy, feat.valid, feat.desc, feat.depth, bind, R, t,
           feat.time, jnp.asarray(99), use_depth=True, do_ba=False,
           max_depth=40.0, feat_octave=feat.octave_or_zeros(),
           matcher_model=mm.model, matcher_params=mm.params)

    # stages
    st2, k2 = mstate.insert_keyframe(
        st, R, t, feat.time, jnp.asarray(99), feat.xy, feat.valid, feat.desc,
        feat.depth, feat.octave_or_zeros(), bind)
    timeit("insert_keyframe", jax.jit(mstate.insert_keyframe),
           st, R, t, feat.time, jnp.asarray(99), feat.xy, feat.valid,
           feat.desc, feat.depth, feat.octave_or_zeros(), bind)
    timeit("create_depth_landmarks", mapping.create_depth_landmarks,
           st2, cam, k2, max_depth=40.0)
    timeit("create_new_landmarks (LightGlue x5)",
           mapping.create_new_landmarks, st2, cam, k2,
           matcher_model=mm.model, matcher_params=mm.params)
    timeit("create_new_landmarks (desc-NN)",
           mapping.create_new_landmarks, st2, cam, k2)
    timeit("fuse_into_neighbors", mapping.fuse_into_neighbors, st2, cam, k2)
    timeit("fuse_into_neighbors (two-hop x4)", mapping.fuse_into_neighbors,
           st2, cam, k2, n_neighbors2=4)
    timeit("local_bundle_adjustment", mapping.local_bundle_adjustment,
           st2, cam, k2)
    timeit("local_bundle_adjustment (iters=3)",
           mapping.local_bundle_adjustment, st2, cam, k2, iters=3)
    timeit("local_bundle_adjustment (iters=1)",
           mapping.local_bundle_adjustment, st2, cam, k2, iters=1)
    timeit("cull_bad_landmarks", mapping.cull_bad_landmarks, st2,
           st2.next_kf_counter)
    timeit("cull_redundant_keyframes", mapping.cull_redundant_keyframes,
           st2, k2)

    # LightGlue forward alone (5 pairs batched)
    from dani_slam_tpu.models import lightglue as lg
    neigh, w = mstate.best_covisible(st2, k2, 5)
    kp1 = st2.kf_kp[k2]
    d1 = st2.kf_desc[k2]
    m1 = st2.kf_kp_mask[k2]
    # args passed explicitly: a zero-arg closure would bake the big
    # keypoint/descriptor arrays into the program as CONSTANTS, which blows
    # past the remote-compile request size limit (HTTP 413) on the tunnel
    lg_fn = jax.jit(partial(lg.match_pairs, mm.model,
                            width=cam.width, height=cam.height))
    timeit("lightglue match_pairs (B=5)", lg_fn,
           mm.params, jnp.broadcast_to(kp1, (5,) + kp1.shape),
           jnp.broadcast_to(d1, (5,) + d1.shape),
           jnp.broadcast_to(m1, (5,) + m1.shape),
           st2.kf_kp[neigh], st2.kf_desc[neigh], st2.kf_kp_mask[neigh])

    # track step for reference
    from dani_slam_tpu.slam import tracking as trk
    timeit("track_frame_step", trk.track_frame_step,
           st, cam, feat, bind, R, t, jnp.eye(3), jnp.zeros(3), k,
           use_depth=True, has_vel=True, matcher_model=mm.model,
           matcher_params=mm.params)
    timeit("frontend program", frame_mod._frame_rgbd_program,
           sp_params, jnp.asarray(im), jnp.asarray(de), cam,
           jnp.asarray(0.5, jnp.float32), dfac, thr, nobox[0], nobox[1],
           n_max=n_feat, use_boxes=False)


if __name__ == "__main__":
    main()
