"""Dissect the first-frame (init) latency of the bench workload.

The bench's timed pass shows f0 at ~375 ms warm — ~21% of the 60-frame
budget. This script times each sub-step of the init frame after a full
warmup pass, to find where it goes.
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

from dani_slam_tpu.core import cameras
from dani_slam_tpu.core import state as mstate
from dani_slam_tpu.models import superpoint as sp_mod
from dani_slam_tpu.models import yolo as yolo_mod
from dani_slam_tpu.slam import frame as frame_mod
from dani_slam_tpu.slam import tracking
from dani_slam_tpu.slam.system import Sensor, System
from dani_slam_tpu.utils import synthetic

cam = cameras.Camera.pinhole(500.0, 500.0, 320.0, 240.0, 640, 480)
caps = mstate.MapCaps()
sp_params = sp_mod.load_default_params()
det = yolo_mod.load_default_detector()

rng = np.random.RandomState(0)
R_gt, t_gt = synthetic.orbit_trajectory(8, radius=10.0, angle_span=0.05)
gx, gy = np.meshgrid(np.linspace(40, 600, 16), np.linspace(40, 440, 10))
u = (gx + rng.uniform(-12, 12, gx.shape)).ravel()
v = (gy + rng.uniform(-12, 12, gy.shape)).ravel()
z = rng.uniform(4.0, 11.0, len(u))
rays = np.stack([(u - 320.0) / 500.0, (v - 240.0) / 500.0, np.ones(len(u))], 1)
pts = (rays * z[:, None]).astype(np.float32)
R0, t0 = np.asarray(R_gt[0]), np.asarray(t_gt[0])
pts = (R0.T @ (pts - t0).T).T.astype(np.float32)
bright = rng.uniform(150, 230, len(pts)).astype(np.float32)

imgs, deps = [], []
for i in range(8):
    gray, de = synthetic.render_image_depth(pts, bright, cam, R_gt[i], t_gt[i],
                                            seed=i)
    img = np.repeat(gray[..., None], 3, axis=-1).astype(np.float32)
    imgs.append(jax.device_put(jnp.asarray(np.clip(img, 0, 255).astype(np.uint8))))
    deps.append(jax.device_put(jnp.asarray(de.astype(np.float32).astype(np.uint16))))

times = [jax.device_put(jnp.asarray(i / 30.0, jnp.float32)) for i in range(8)]


def make_system():
    sys = System(cam, Sensor.RGBD, caps=caps, sp_params=sp_params,
                 n_features=1024, pipelined=True, detector=det)
    sys.sp_threshold = 0.012
    return sys


# warmup: full mini-sequence
s = make_system()
for i in range(8):
    s.track_rgbd(imgs[i], deps[i], i / 30.0, time_dev=times[i])
s.shutdown()
jax.block_until_ready(s.tracker.st.kf_R)

# ---- timed dissection of frame 0 on a fresh system ----------------------
def tick(label, t_prev):
    t = time.perf_counter()
    print(f"  {label}: {1e3*(t-t_prev):.1f} ms")
    return t

t_sys0 = time.perf_counter()
s = make_system()
jax.block_until_ready(s.tracker.st.kf_R)
t = tick("make_system (incl MapState alloc block)", t_sys0)

tr = s.tracker
tr.sp_params = s._sp()
img, dep = imgs[0], deps[0]

boxes, bmask, dyn_ratio = det.dynamic_mask_inputs(img)
jax.block_until_ready(boxes)
t = tick("detector.dynamic_mask_inputs", t)

feat = frame_mod._frame_rgbd_program(
    tr.sp_params, img, dep, cam, times[0],
    jnp.asarray(5000.0, jnp.float32), jnp.asarray(0.012, jnp.float32),
    boxes, bmask, n_max=1024, use_boxes=True)
jax.block_until_ready(feat.xy)
t = tick("frontend program", t)

n_depth = int(jnp.sum(feat.valid & jnp.isfinite(feat.depth)))
t = tick(f"n_depth pull ({n_depth})", t)

st2, k0, bind, _st = tracking.build_initial_map_rgbd(
    tr.st, cam, feat, jnp.asarray(0))
jax.block_until_ready(st2.kf_R)
t = tick("build_initial_map_rgbd", t)

k0i = int(k0)
t = tick("int(k0) pull", t)

nb = int((np.asarray(bind) >= 0).sum())
t = tick(f"bind pull (ref_kf_tracked={nb})", t)

# and the full call for comparison, fresh system again
s2 = make_system()
jax.block_until_ready(s2.tracker.st.kf_R)
t0 = time.perf_counter()
s2.track_rgbd(imgs[0], deps[0], 0.0, time_dev=times[0])
t = tick("full track_rgbd(f0) [fresh sys, warm jit]", t0)
s2.track_rgbd(imgs[1], deps[1], 1 / 30.0, time_dev=times[1])
t = tick("track_rgbd(f1)", t)
s2.track_rgbd(imgs[2], deps[2], 2 / 30.0, time_dev=times[2])
t = tick("track_rgbd(f2)", t)

print("---- repeats ----")
# repeat the init sub-programs on fresh state: steady-state device cost
for rep in range(3):
    st_fresh = mstate.empty_map(caps)
    jax.block_until_ready(st_fresh.kf_R)
    t0 = time.perf_counter()
    st2, k0, bind, _st = tracking.build_initial_map_rgbd(
        st_fresh, cam, feat, jnp.asarray(0))
    jax.block_until_ready(st2.kf_R)
    tick(f"build_initial_map_rgbd rep{rep}", t0)

for rep in range(3):
    t0 = time.perf_counter()
    b, bm, dr = det.dynamic_mask_inputs(imgs[3])
    jax.block_until_ready(b)
    tick(f"detector rep{rep}", t0)

for rep in range(3):
    t0 = time.perf_counter()
    f2 = frame_mod._frame_rgbd_program(
        tr.sp_params, imgs[3], deps[3], cam, times[3],
        jnp.asarray(5000.0, jnp.float32), jnp.asarray(0.012, jnp.float32),
        boxes, bmask, n_max=1024, use_boxes=True)
    jax.block_until_ready(f2.xy)
    tick(f"frontend rep{rep}", t0)

for rep in range(3):
    t0 = time.perf_counter()
    x = jnp.sum(st2.lm_mask)
    int(x)
    tick(f"scalar pull rep{rep}", t0)
