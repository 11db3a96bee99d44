"""Visual-inertial tracking support: per-frame preintegration, IMU pose
prediction, and IMU initialization orchestration.

Reference behaviors covered:
  * Tracking::PreintegrateIMU (src/Tracking.cc:1643) — integrate the sample
    window between consecutive frames.
  * Tracking::PredictStateIMU (src/Tracking.cc:1757) — pose/velocity
    prediction from the preintegrated deltas.
  * LocalMapping::InitializeIMU (src/LocalMapping.cc:1175) — gravity
    direction + scale + bias initialization over the keyframe chain, then
    map-wide gravity alignment (ApplyScaledRotation) — staged VIBA
    refinement is scheduled by the System like the reference's timers
    (mTinit>5s VIBA1, >15s VIBA2, src/LocalMapping.cc:204-233).

World convention after IMU init: gravity points along -z of the (rotated)
world frame, exactly like the reference rotates the map so gravity aligns
with Gz (src/LocalMapping.cc:1227-1254).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import lie, state as mstate
from dani_slam_tpu.ops import imu as imu_ops

MAX_SAMPLES_PER_FRAME = 64


class ImuWindow(NamedTuple):
    """Fixed-size padded IMU sample window between two frames."""
    gyro: jax.Array   # [S,3]
    acc: jax.Array    # [S,3]
    dts: jax.Array    # [S]
    valid: jax.Array  # [S]


def make_window(gyro, acc, dts, max_s: int = MAX_SAMPLES_PER_FRAME
                ) -> ImuWindow:
    g = np.zeros((max_s, 3), np.float32)
    a = np.zeros((max_s, 3), np.float32)
    d = np.zeros((max_s,), np.float32)
    v = np.zeros((max_s,), bool)
    n = min(len(dts), max_s)
    g[:n] = np.asarray(gyro)[:n]
    a[:n] = np.asarray(acc)[:n]
    d[:n] = np.asarray(dts)[:n]
    v[:n] = True
    return ImuWindow(jnp.asarray(g), jnp.asarray(a), jnp.asarray(d),
                     jnp.asarray(v))


@jax.jit
def predict_state_imu(R_cw, t_cw, v_w, preint: imu_ops.Preintegrated,
                      bias_g, bias_a, R_bc=None, t_bc=None):
    """IMU forward prediction of the next camera pose (reference:
    PredictStateIMU src/Tracking.cc:1757-1805). Poses are camera-from-world;
    integration happens on the BODY state through the camera-IMU extrinsics
    Tbc (identity when omitted).

    Returns (R_cw', t_cw', v_w')."""
    if R_bc is None:
        R_bc = jnp.eye(3)
    if t_bc is None:
        t_bc = jnp.zeros(3)
    dR, dV, dP = imu_ops.corrected_deltas(preint, bias_g, bias_a)
    dt = preint.dt
    R_wb, p_w = imu_ops.body_from_camera(R_bc, t_bc, R_cw, t_cw)
    R_wb2 = lie.orthonormalize(R_wb @ dR)
    p_w2 = p_w + v_w * dt + 0.5 * imu_ops.G_VEC * dt * dt + R_wb @ dP
    v_w2 = v_w + imu_ops.G_VEC * dt + R_wb @ dV
    R_cw2, t_cw2 = imu_ops.camera_from_body(R_bc, t_bc, R_wb2, p_w2)
    return lie.orthonormalize(R_cw2), t_cw2, v_w2


class InertialState:
    """Host-side inertial bookkeeping attached to the Tracker."""

    def __init__(self, calib: Optional[imu_ops.ImuCalib] = None):
        self.calib = calib or imu_ops.ImuCalib.default()
        self.initialized = False
        self.v_w = jnp.zeros(3)
        self.bias_g = jnp.zeros(3)
        self.bias_a = jnp.zeros(3)
        self.last_preint: Optional[imu_ops.Preintegrated] = None
        # 15x15 marginalized prior information on the last tracked frame's
        # [pose, v, bg, ba] (tracking.vi_refine_step_marg chain; reference:
        # mpLastFrame's prior from Optimizer::Marginalize). None until the
        # first post-init frame bootstraps it.
        self.prior_info = None
        # raw samples per frame since the last keyframe (for KF-to-KF
        # preintegration at init time)
        self.frame_windows = []     # [(frame_id, ImuWindow)]
        self.first_frame_time = None
        self.last_alignment = (jnp.eye(3), jnp.ones(()))

    def integrate_frame(self, win: ImuWindow):
        self.last_preint = imu_ops.preintegrate(
            win.gyro, win.acc, win.dts, win.valid, self.bias_g, self.bias_a,
            self.calib)
        self.frame_windows.append(win)
        return self.last_preint

    def kf_chain_preintegrations(self, kf_frame_bounds):
        """Re-integrate KF-to-KF windows from the stored per-frame samples.
        kf_frame_bounds: list of (start_idx, end_idx) into frame_windows."""
        outs = []
        for (a, b) in kf_frame_bounds:
            wins = self.frame_windows[a:b]
            if not wins:
                outs.append(None)
                continue
            g = jnp.concatenate([w.gyro for w in wins])
            ac = jnp.concatenate([w.acc for w in wins])
            d = jnp.concatenate([w.dts for w in wins])
            v = jnp.concatenate([w.valid for w in wins])
            outs.append(imu_ops.preintegrate(g, ac, d, v, self.bias_g,
                                             self.bias_a, self.calib))
        return outs


def initialize_imu(st: mstate.MapState, inertial: InertialState,
                   kf_ids, preints, mono_scale_free: bool):
    """Gravity/scale/bias init over the keyframe chain + map alignment
    (reference: InitializeIMU src/LocalMapping.cc:1175 —
    InertialOptimization + ApplyScaledRotation).

    kf_ids: keyframe slots in temporal order; preints: KF-to-KF
    Preintegrated (len = len(kf_ids)-1). Returns (st_aligned, ok)."""
    from dani_slam_tpu.slam.atlas import transform_map

    if len(kf_ids) < 4 or any(p is None for p in preints):
        return st, False
    # body states through the camera-IMU extrinsics: the scale-dependent
    # part is the camera center (mono maps know it only up to scale); the
    # -R_wb t_bc offset is metric and passed separately (t_off)
    R_bc, t_bc = inertial.calib.R_bc, inertial.calib.t_bc
    ks = jnp.asarray(kf_ids)
    R_wb, _ = imu_ops.body_from_camera(R_bc, t_bc, st.kf_R[ks], st.kf_t[ks])
    C_cam = -jnp.einsum('kji,kj->ki', st.kf_R[ks], st.kf_t[ks])
    t_off = -jnp.einsum('kij,j->ki', R_wb, t_bc)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *preints)
    out = imu_ops.inertial_init(R_wb, C_cam, None, stacked,
                                optimize_scale=mono_scale_free, t_off=t_off)
    s = float(out["scale"])
    # mono maps are normalized to median depth 1, so the metric scale can
    # legitimately be 10x+; only reject clearly broken solves
    if not (0.02 < s < 100.0) or not np.isfinite(s):
        return st, False

    # rotate the world so estimated gravity aligns with (0,0,-9.81)
    g = out["gravity"]
    g_norm = g / jnp.linalg.norm(g).clip(1e-9)
    target = jnp.asarray([0.0, 0.0, -1.0])
    axis = jnp.cross(g_norm, target)
    sin_a = jnp.linalg.norm(axis)
    cos_a = jnp.dot(g_norm, target)
    angle = jnp.arctan2(sin_a, cos_a)
    Rg = lie.so3_exp(axis / jnp.maximum(sin_a, 1e-9) * angle)
    Rg = jnp.where(sin_a < 1e-6, jnp.eye(3), Rg)

    st2 = transform_map(st, Rg, jnp.zeros(3), jnp.asarray(s))
    inertial.last_alignment = (Rg, jnp.asarray(s))
    inertial.initialized = True
    inertial.bias_g = out["bias_g"]
    inertial.bias_a = out["bias_a"]
    # velocity of the newest keyframe rotated into the aligned world — the
    # optimizer's velocities are ALREADY metric (the ev equations are tied
    # to the metric preintegration), so only the gravity rotation applies
    inertial.v_w = Rg @ out["velocities"][-1]
    return st2, True
