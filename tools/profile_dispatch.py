"""Separate HOST dispatch cost from DEVICE execution for the frame loop.

(a) dispatch-only wall time (no block) -> host-side cost per call
(b) dispatch+block -> max(host, device) pipeline rate
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

from dani_slam_tpu.core import cameras, state as mstate
from dani_slam_tpu.models import superpoint as sp_mod
from dani_slam_tpu.slam import frame as frame_mod, tracking as trk
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import synthetic


def rates(name, fn, reps=30):
    out = fn()
    jax.block_until_ready(out)
    # (a) dispatch only
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    t_disp = (time.perf_counter() - t0) / reps * 1e3
    jax.block_until_ready(outs)
    # (b) pipelined total
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    t_tot = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:40s} host {t_disp:7.2f} ms   total {t_tot:7.2f} ms",
          flush=True)


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
    for j in list(range(0, n_frames, 6)) + [n_frames - 1]:
        gx, gy = np.meshgrid(np.linspace(40, 600, 16),
                             np.linspace(40, 440, 10))
        u = (gx + rng.uniform(-12, 12, gx.shape)).ravel()[:160]
        v = (gy + rng.uniform(-12, 12, gy.shape)).ravel()[:160]
        z = rng.uniform(4.0, 11.0, 160)
        rays = np.stack([(u - 320.0) / 500.0, (v - 240.0) / 500.0,
                         np.ones(160)], 1)
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
    tr = sys.tracker
    bind, R, t = tr.last_bind, tr.R, tr.t
    Rv, tv = (tr.vel if tr.vel is not None else (jnp.eye(3), jnp.zeros(3)))
    k_dev = tr.ref_kf_dev
    mm = sys.matcher
    img = jnp.asarray(im)
    dep = jnp.asarray(de)

    rates("noop (1 arg)", jax.jit(lambda: img + 1).lower().compile())

    one = jax.jit(lambda x: x + 1)
    one(img)
    rates("add (img arg)", lambda: one(img))

    stfn = jax.jit(lambda s: s.kf_t + 1)
    stfn(st)
    rates("tiny fn (MapState arg)", lambda: stfn(st))

    rates("frontend", lambda: frame_mod._frame_rgbd_program(
        sp_params, img, dep, cam, thr, dfac, thr, nobox[0], nobox[1],
        n_max=n_feat, use_boxes=False))

    rates("track_frame_step", lambda: trk.track_frame_step(
        st, cam, feat, bind, R, t, Rv, tv, k_dev, use_depth=True,
        has_vel=True, matcher_model=mm.model, matcher_params=mm.params))

    rates("_ref_pose", lambda: trk._ref_pose(st, k_dev))


if __name__ == "__main__":
    main()
