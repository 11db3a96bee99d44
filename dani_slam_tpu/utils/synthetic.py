"""Synthetic SLAM worlds for testing.

The reference has no unit tests — its verification is dataset playback +
ATE evaluation (SURVEY.md §4). Since the TUM/EuRoC datasets and the authors'
model weights are not available in this environment, the system-level test
harness renders synthetic worlds: random landmark clouds with stable unique
descriptors, observed through the real camera model along known trajectories.
This exercises every SLAM-layer component (matching, pose solve, triangulation,
BA, keyframing, loop closing) with exact ground truth, independent of the
learned feature detector.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import lie
from dani_slam_tpu.slam.frame import FrameFeatures


class SyntheticWorld(NamedTuple):
    points: jax.Array     # [M,3] world landmarks
    desc: jax.Array       # [M,D] unit descriptors (unique per landmark)


def make_world(n_points: int = 2000, desc_dim: int = 64, seed: int = 0,
               box=((-6.0, 6.0), (-4.0, 4.0), (-6.0, 6.0))) -> SyntheticWorld:
    rng = np.random.RandomState(seed)
    pts = np.stack([rng.uniform(lo, hi, n_points) for lo, hi in box],
                   axis=1).astype(np.float32)
    d = rng.randn(n_points, desc_dim).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return SyntheticWorld(jnp.asarray(pts), jnp.asarray(d))


def orbit_trajectory(n_frames: int, radius: float = 10.0,
                     angle_span: float = 2 * np.pi, height: float = 0.0,
                     look_at=(0.0, 0.0, 0.0)):
    """Camera orbiting the origin, always looking at `look_at`.
    Returns (R_cw [F,3,3], t_cw [F,3]) ground-truth poses (T_cw)."""
    Rs, ts = [], []
    for i in range(n_frames):
        a = angle_span * i / max(n_frames - 1, 1)
        C = np.array([radius * np.sin(a), height, -radius * np.cos(a)])
        z = np.asarray(look_at) - C
        z = z / np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=1)       # columns = camera axes
        R_cw = R_wc.T
        t_cw = -R_cw @ C
        Rs.append(R_cw)
        ts.append(t_cw)
    return (jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.asarray(np.stack(ts), jnp.float32))


def forward_trajectory(n_frames: int, step: float = 0.08,
                       yaw_rate: float = 0.0):
    """Camera moving forward along +z with optional constant yaw."""
    Rs, ts = [], []
    R_wc = np.eye(3)
    C = np.zeros(3)
    for i in range(n_frames):
        R_cw = R_wc.T
        Rs.append(R_cw.copy())
        ts.append(-R_cw @ C)
        C = C + R_wc @ np.array([0.0, 0.0, step])
        if yaw_rate:
            c, s = np.cos(yaw_rate), np.sin(yaw_rate)
            R_wc = R_wc @ np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return (jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.asarray(np.stack(ts), jnp.float32))


def render_frame(world: SyntheticWorld, cam: _cam.Camera, R_cw, t_cw,
                 n_max: int = 512, noise_px: float = 0.3,
                 desc_noise: float = 0.05, seed: int = 0,
                 with_depth: bool = False, depth_noise: float = 0.0,
                 time: float = 0.0):
    """Render a FrameFeatures observation of the world from pose T_cw.

    Returns (features, true_ids [n_max] int32 — world landmark index per slot,
    -1 for padding).
    """
    rng = np.random.RandomState(seed)
    pc = np.asarray(lie.se3_apply(R_cw, t_cw, world.points))
    z = pc[:, 2]
    xy = np.asarray(_cam.project(cam, jnp.asarray(pc)))
    vis = ((z > 0.3) & (xy[:, 0] >= 1) & (xy[:, 0] < cam.width - 1) &
           (xy[:, 1] >= 1) & (xy[:, 1] < cam.height - 1))
    ids = np.nonzero(vis)[0]
    rng.shuffle(ids)
    ids = ids[:n_max]
    n = len(ids)

    D = world.desc.shape[1]
    fxy = np.zeros((n_max, 2), np.float32)
    fdesc = np.zeros((n_max, D), np.float32)
    fdepth = np.full((n_max,), np.inf, np.float32)
    valid = np.zeros((n_max,), bool)
    true_ids = np.full((n_max,), -1, np.int32)

    fxy[:n] = xy[ids] + rng.randn(n, 2) * noise_px
    d = np.asarray(world.desc)[ids] + rng.randn(n, D) * desc_noise
    fdesc[:n] = d / np.linalg.norm(d, axis=1, keepdims=True)
    if with_depth:
        fdepth[:n] = z[ids] * (1 + rng.randn(n) * depth_noise)
    valid[:n] = True
    true_ids[:n] = ids

    feat = FrameFeatures(
        xy=jnp.asarray(fxy), desc=jnp.asarray(fdesc),
        depth=jnp.asarray(fdepth), valid=jnp.asarray(valid),
        time=jnp.asarray(time, jnp.float32))
    return feat, jnp.asarray(true_ids)


def render_image_depth(world_pts, brightness, cam: _cam.Camera, R_cw, t_cw,
                       spot: float = 2.0, patch: int = 13, bg: float = 40.0,
                       depth_factor: float = 5000.0, seed: int = 0,
                       noise: float = 2.0, n_satellites: int = 4,
                       texture_seed: int = 1234):
    """Rasterize world points as Gaussian corner spots -> (gray uint8 [H,W],
    encoded uint16 depth [H,W]).

    Each world point carries a persistent 3-D satellite constellation
    (texture_seed-deterministic small offsets) stamped as dimmer companion
    spots: without these, every point looks like the same Gaussian blob,
    descriptors are indistinguishable, and any matcher degenerates to
    proximity (measured: 69% mutual-NN precision at ~13 px flow — enough to
    drag pose optimization into the zero-motion basin). Real scenes have
    distinctive local texture; the constellation is its cheapest synthetic
    stand-in, and being true 3-D geometry it stays view-consistent.

    Vectorized patch stamping (np.maximum.at / np.minimum.at over fixed
    13x13 footprints) so full 640x480 sequences render in seconds on one
    host core — this feeds the image-in benchmark (the reference's dataset
    playback, Examples/RGB-D/rgbd_tum.cc, replayed synthetically)."""
    H, W = cam.height, cam.width
    rng = np.random.RandomState(seed)
    world_pts = np.asarray(world_pts)
    brightness = np.asarray(brightness)
    if n_satellites > 0:
        trng = np.random.RandomState(texture_seed)
        # 3-D offsets sized to land ~2-6 px from the parent at typical
        # depth/focal (matches the descriptor-training micro-constellation
        # radius, superpoint_train.make_textured_batch: 2.5-6.5 px)
        offs = trng.uniform(-0.10, 0.10,
                            (world_pts.shape[0], n_satellites, 3))
        offs = offs.astype(np.float32)
        # keep satellites out of the parent's core so the peak stays put
        nrm = np.linalg.norm(offs, axis=-1, keepdims=True)
        offs = offs * (np.maximum(nrm, 0.04) / np.maximum(nrm, 1e-9))
        sat_amp = (brightness[:, None] *
                   trng.uniform(0.35, 0.7, (world_pts.shape[0],
                                            n_satellites))).reshape(-1)
        sat_pts = (world_pts[:, None, :] + offs).reshape(-1, 3)
        world_pts = np.concatenate([world_pts, sat_pts], 0)
        brightness = np.concatenate([brightness, sat_amp], 0)
    pc = np.asarray(lie.se3_apply(R_cw, t_cw, jnp.asarray(world_pts)))
    z = pc[:, 2]
    uv = np.asarray(_cam.project(cam, jnp.asarray(pc)))
    r = patch // 2
    vis = ((z > 0.3) & (uv[:, 0] > r + 1) & (uv[:, 0] < W - r - 2) &
           (uv[:, 1] > r + 1) & (uv[:, 1] < H - r - 2))
    u, v, zz = uv[vis, 0], uv[vis, 1], z[vis]
    b = np.asarray(brightness)[vis]
    u0 = np.round(u).astype(np.int32)
    v0 = np.round(v).astype(np.int32)
    off = np.arange(-r, r + 1)
    dx = off[None, None, :] + (u0 - u)[:, None, None]     # [M,1,P]
    dy = off[None, :, None] + (v0 - v)[:, None, None]     # [M,P,1]
    g = b[:, None, None] * np.exp(-(dx ** 2 + dy ** 2) / (2 * spot ** 2))
    xs = (u0[:, None, None] + off[None, None, :] +
          np.zeros_like(off)[None, :, None]).ravel()
    ys = (v0[:, None, None] + off[None, :, None] +
          np.zeros_like(off)[None, None, :]).ravel()
    img = np.full((H, W), bg, np.float32)
    np.maximum.at(img, (ys, xs), (bg + g).ravel())
    if noise > 0:
        img = img + rng.randn(H, W).astype(np.float32) * noise
    depth = np.full((H, W), np.inf, np.float32)
    zpatch = np.broadcast_to(zz[:, None, None], g.shape).ravel()
    np.minimum.at(depth, (ys, xs), np.where(g.ravel() > 0.02 * 255, zpatch,
                                            np.inf))
    # uint16 range check: depth_factor=5000 (TUM) saturates at 13.1 m —
    # beyond-range depth must encode as 0 (invalid), NOT wrap modulo 65536
    # (wrapped depths silently produce garbage landmarks)
    scaled = depth * depth_factor
    depth_enc = np.where(np.isfinite(depth) & (scaled <= 65535.0), scaled,
                         0).astype(np.uint16)
    return np.clip(img, 0, 255).astype(np.uint8), depth_enc


def make_drifted_loop_state(cam: _cam.Camera, caps, K: int = 12,
                            drift: float = 0.35, scale_drift: float = 1.0,
                            desc_dim: int | None = None, seed: int = 2):
    """Deterministic drifted loop map for loop-closing tests and the
    on-device loop bench: a full orbit whose estimated keyframe poses carry
    accumulated drift (and optionally mono-style scale drift), with a
    covisibility chain along the orbit but NOT across the loop gap
    (last->first) — only a loop edge can close it. Returns
    (MapState, kf_ids, (R_gt, t_gt), world).

    This is the state the reference's LoopClosing thread faces after
    playback of a drifted loop (src/LoopClosing.cc:91-320); an emergent
    image-level loop e2e is flaky by construction (returning to a known
    area usually rebinds old landmarks directly), so the drifted map is
    built explicitly.
    """
    from dani_slam_tpu.core import state as mstate

    world = make_world(2000, desc_dim=desc_dim or caps.D, seed=seed)
    R_gt, t_gt = orbit_trajectory(K, radius=10.0, angle_span=2 * np.pi)
    st = mstate.empty_map(caps)
    kf_ids = []
    world2lm = {}        # world point id -> landmark slot (chain memory)
    C_prev_est = None
    for k in range(K):
        # drift ramps up along the trajectory (none at k=0)
        a = drift * k / (K - 1)
        dxi = jnp.asarray([a, 0.5 * a, 0.0, 0.0, 0.05 * a, 0.0],
                          jnp.float32)
        dR, dt = lie.se3_exp(dxi)
        # mono-style scale drift: each segment's length (and the local
        # structure created at that keyframe) is off by s_k, ramping
        # 1 -> scale_drift along the chain
        s_k = 1.0 + (scale_drift - 1.0) * k / (K - 1)
        if scale_drift != 1.0:
            C_gt_k = -np.asarray(R_gt[k]).T @ np.asarray(t_gt[k])
            if C_prev_est is None:
                C_est = C_gt_k
            else:
                C_gt_p = -np.asarray(R_gt[k - 1]).T @ np.asarray(
                    t_gt[k - 1])
                C_est = C_prev_est + s_k * (C_gt_k - C_gt_p)
            C_prev_est = C_est
            R_est = R_gt[k]
            t_est = jnp.asarray(-np.asarray(R_gt[k]) @ C_est, jnp.float32)
        else:
            R_est = dR @ R_gt[k]
            t_est = dR @ t_gt[k] + dt

        # desc noise produces an ANGULAR perturbation of ~noise*sqrt(D):
        # scale by 1/sqrt(D/64) so the matching difficulty is invariant to
        # the descriptor width (at D=256 the default 0.05 puts same-landmark
        # distances right at the 0.9 match gate and association collapses)
        dnoise = 0.05 * (64.0 / world.desc.shape[1]) ** 0.5
        feat, tid = render_frame(
            world, cam, R_gt[k], t_gt[k], n_max=caps.N, noise_px=0.2,
            desc_noise=dnoise, seed=100 + k, with_depth=True, time=k / 5.0)
        if scale_drift != 1.0:
            # local structure scale follows the drifted segment scale
            feat = feat._replace(depth=feat.depth * s_k)
        # landmarks: create from depth at the ESTIMATED pose (consistent
        # with the drifted trajectory, like real accumulated drift); but
        # REBIND world points already seen by the PREVIOUS keyframe so a
        # covisibility chain (odometry edges) exists — except across the
        # loop gap (last->first), which only the loop edge closes.
        rays = _cam.unproject(cam, feat.xy)
        Xc = rays * feat.depth[:, None]
        Xw = lie.se3_apply(*lie.se3_inv(R_est, t_est), Xc)
        good = np.asarray(feat.valid & jnp.isfinite(feat.depth))
        tid_np = np.asarray(tid)
        bind = np.full(caps.N, -1, np.int32)
        create = good.copy()
        for row in range(caps.N):
            wid = tid_np[row]
            if good[row] and wid in world2lm:
                # rebind (keeps landmark position from first sighting)
                bind[row] = world2lm[wid]
                create[row] = False
        st, slots = mstate.insert_landmarks(
            st, Xw, feat.desc, Xw, jnp.zeros(caps.N) + 0.5,
            jnp.zeros(caps.N) + 50.0,
            jnp.full((caps.N,), k, jnp.int32),
            jnp.full((caps.N,), k, jnp.int32), jnp.asarray(create))
        slots_np = np.asarray(slots)
        for row in range(caps.N):
            if create[row] and slots_np[row] >= 0:
                bind[row] = slots_np[row]
                world2lm[tid_np[row]] = int(slots_np[row])
        st, kf = mstate.insert_keyframe(
            st, R_est, t_est, k / 5.0, jnp.asarray(k), feat.xy,
            feat.valid, feat.desc, feat.depth,
            jnp.zeros((caps.N,), jnp.int8), jnp.asarray(bind))
        kf_ids.append(int(kf))
        # forget landmarks not seen by this KF: next KF can only rebind
        # what the previous frame saw (keeps the chain local, so the
        # loop gap stays unconnected)
        seen_now = set(tid_np[good].tolist())
        world2lm = {w: l for w, l in world2lm.items() if w in seen_now}
    return st, kf_ids, (R_gt, t_gt), world


# ---------------------------------------------------------------------------
# Image-in RGB-D benchmark sequence (the bench's dataset builder, shared so
# bench.py / tools/ab_frame_knobs.py / the hardened revisit workload render
# the SAME scene family — reference analogue: TUM fr3_walking_xyz playback,
# Examples/RGB-D/rgbd_tum.cc, with the walking person as the dynamic object)
# ---------------------------------------------------------------------------

def stamp_dynamic_object(img, depth, cam_f, uv, z, wh_m, offsets, amps):
    """Stamp the warm textured movable object (the shipped detector's
    training appearance, models/yolo_train.py) onto an RGB frame.
    Blob windows are sliced (|du|,|dv| < 5 confine each blob) — identical
    values to the full-image formulation."""
    H, W = img.shape[:2]
    bw = wh_m[0] * cam_f / z
    bh = wh_m[1] * cam_f / z
    x1, y1 = uv[0] - bw / 2, uv[1] - bh / 2
    x2, y2 = uv[0] + bw / 2, uv[1] + bh / 2
    xi1, yi1 = max(int(x1), 0), max(int(y1), 0)
    xi2, yi2 = min(int(x2), W), min(int(y2), H)
    if xi2 - xi1 < 8 or yi2 - yi1 < 8:
        return img, depth
    tint = np.asarray([1.0, 0.55, 0.45]) * 0.55 * 255
    img[yi1:yi2, xi1:xi2] = tint
    # coherent blob texture that moves WITH the object — the case that
    # poisons unmasked tracking (keypoints land on it and out-vote statics
    # locally); the detector must suppress it inside the timed loop
    sx = bw / 100.0
    for (ox, oy), a in zip(offsets, amps):
        u, v = uv[0] + ox * sx, uv[1] + oy * sx
        if not (3 < u < W - 4 and 3 < v < H - 4):
            continue
        ix1, ix2 = max(int(np.floor(u - 5)), 0), min(int(np.ceil(u + 5)) + 1, W)
        iy1, iy2 = max(int(np.floor(v - 5)), 0), min(int(np.ceil(v + 5)) + 1, H)
        yy, xx = np.mgrid[iy1:iy2, ix1:ix2]
        du, dv = xx - u, yy - v
        m = (np.abs(du) < 5) & (np.abs(dv) < 5)
        g = a * np.exp(-(du ** 2 + dv ** 2) / (2 * 1.5 ** 2))
        sub = img[iy1:iy2, ix1:ix2]
        sub[m] = np.maximum(sub[m], (40 + g[m])[:, None] * np.ones((1, 3)))
    depth[yi1:yi2, xi1:xi2] = z * 5000.0
    return img, depth


def make_rgbd_image_sequence(cam: _cam.Camera, R_gt, t_gt, seed: int = 0,
                             with_object: bool = True, sample_every: int = 6,
                             per_batch: int = 160,
                             obj_side_fn=None, fps: float = 30.0):
    """Render an RGB-D image sequence along ground-truth trajectory
    (R_gt [F,3,3], t_gt [F,3]) — frustum-sampled textured world points on a
    jittered grid plus (optionally) a moving warm textured board at ~4 m (the
    fr3_walking 'person' analogue). Returns (imgs [F] uint8 HxWx3,
    depths [F] uint16, times [F] float).

    obj_side_fn(i) -> lateral offset (m) of the object at frame i; the
    default crossing (-1.8 + 0.07*i) matches the original 60-frame bench.
    """
    n_frames = len(R_gt)
    rng = np.random.RandomState(seed)
    fx, fy, cx, cy = (float(x) for x in np.asarray(cam.params)[:4])
    # ~25 parents per sampled frame spread over the swept volume on a
    # jittered grid (>=14 px apart at mid-depth): the detection budget then
    # returns a STABLE keypoint set frame to frame — with clustered points
    # the top-K selection churns and map coverage saturates low
    pts_list = []
    for j in list(range(0, n_frames, sample_every)) + [n_frames - 1]:
        gx, gy = np.meshgrid(np.linspace(40, cam.width - 40, 16),
                             np.linspace(40, cam.height - 40, 10))
        u = (gx + rng.uniform(-12, 12, gx.shape)).ravel()[:per_batch]
        v = (gy + rng.uniform(-12, 12, gy.shape)).ravel()[:per_batch]
        z = rng.uniform(4.0, 11.0, per_batch)
        rays = np.stack([(u - cx) / fx, (v - cy) / fy,
                         np.ones(per_batch)], 1)
        pc = (rays * z[:, None]).astype(np.float32)
        Rj, tj = np.asarray(R_gt[j]), np.asarray(t_gt[j])
        pts_list.append((Rj.T @ (pc - tj).T).T.astype(np.float32))
    pts = np.concatenate(pts_list, 0)
    bright = rng.uniform(150, 230, len(pts)).astype(np.float32)
    obj_off = [(rng.uniform(-48, 48), rng.uniform(-33, 33))
               for _ in range(40)]
    obj_amp = [rng.uniform(150, 215) for _ in range(40)]
    C0 = -np.asarray(R_gt[0]).T @ np.asarray(t_gt[0])
    fwd0 = np.asarray(R_gt[0]).T @ np.asarray([0.0, 0.0, 1.0])
    side0 = np.asarray(R_gt[0]).T @ np.asarray([1.0, 0.0, 0.0])
    if obj_side_fn is None:
        obj_side_fn = lambda i: -1.8 + 0.07 * i     # noqa: E731
    imgs, deps, times = [], [], []
    for i in range(n_frames):
        gray, de = render_image_depth(pts, bright, cam, R_gt[i], t_gt[i],
                                      seed=i)
        img = np.repeat(gray[..., None], 3, axis=-1).astype(np.float32)
        de = de.astype(np.float32)
        if with_object:
            obj_w = C0 + fwd0 * 4.0 + side0 * obj_side_fn(i)
            pc = np.asarray(lie.se3_apply(R_gt[i], t_gt[i],
                                          jnp.asarray(obj_w[None],
                                                      jnp.float32)))
            if pc[0, 2] > 0.5:
                uv = np.asarray(_cam.project(cam, jnp.asarray(pc)))[0]
                img, de = stamp_dynamic_object(img, de, fx, uv,
                                               pc[0, 2], (1.6, 1.2),
                                               obj_off, obj_amp)
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
        deps.append(de.astype(np.uint16))
        times.append(i / fps)
    return imgs, deps, times
