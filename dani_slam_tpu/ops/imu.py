"""IMU preintegration and inertial residuals.

Reference: src/ImuTypes.cc — IMU::Preintegrated accumulates delta rotation/
velocity/position between frames with a 15x15 covariance and bias Jacobians
(IntegrateNewMeasurement, ImuTypes.cc:177-238), re-integrates on bias change
(Reintegrate:168), and exposes bias-corrected deltas (GetDeltaRotation etc.);
src/G2oTypes.cc EdgeInertial (G2oTypes.h:495) forms the 9-D residual between
consecutive states.

TPU-first: integration over a sample window is a lax.scan with fixed maximum
sample count + validity mask (no per-sample host loop); bias correction uses
the stored first-order Jacobians so re-integration is a cheap closed-form
update, not a replay. Gravity constant matches the reference (9.81,
include/ImuTypes.h:43).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dani_slam_tpu.core import lie
from dani_slam_tpu.ops import linalg as dla

GRAVITY = 9.81
G_VEC = jnp.asarray([0.0, 0.0, -GRAVITY])


class ImuCalib(NamedTuple):
    """Noise densities (continuous) and extrinsics (reference: IMU::Calib,
    include/ImuTypes.h:92-127)."""
    noise_gyro: jax.Array      # rad/s/sqrt(Hz)
    noise_acc: jax.Array       # m/s^2/sqrt(Hz)
    walk_gyro: jax.Array
    walk_acc: jax.Array
    R_bc: jax.Array            # body-from-camera rotation (Tbc)
    t_bc: jax.Array

    @staticmethod
    def default():
        return ImuCalib(jnp.asarray(1.7e-4), jnp.asarray(2e-3),
                        jnp.asarray(1.9e-5), jnp.asarray(3e-3),
                        jnp.eye(3), jnp.zeros(3))


class Preintegrated(NamedTuple):
    """Accumulated deltas between two frames/keyframes."""
    dR: jax.Array          # (3,3)
    dV: jax.Array          # (3,)
    dP: jax.Array          # (3,)
    dt: jax.Array          # [] total time
    cov: jax.Array         # (15,15) [phi, v, p, bg, ba] covariance
    # bias Jacobians (first-order correction terms, ImuTypes.cc:177-238)
    JRg: jax.Array         # (3,3) d dR / d bias_gyro
    JVg: jax.Array
    JVa: jax.Array
    JPg: jax.Array
    JPa: jax.Array
    bias_g: jax.Array      # (3,) linearization bias
    bias_a: jax.Array


def identity_preintegration() -> Preintegrated:
    return Preintegrated(jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
                         jnp.zeros(()), jnp.zeros((15, 15)),
                         jnp.zeros((3, 3)), jnp.zeros((3, 3)),
                         jnp.zeros((3, 3)), jnp.zeros((3, 3)),
                         jnp.zeros((3, 3)), jnp.zeros(3), jnp.zeros(3))


@jax.jit
def preintegrate(gyro: jax.Array, acc: jax.Array, dts: jax.Array,
                 valid: jax.Array, bias_g: jax.Array, bias_a: jax.Array,
                 calib: ImuCalib) -> Preintegrated:
    """Integrate a padded window of IMU samples.

    gyro/acc: [S,3]; dts: [S] per-sample intervals; valid: [S] mask.
    Follows the reference's discrete model (ImuTypes.cc:177-238): position
    and velocity use the *current* orientation and bias-corrected
    measurements; covariance propagates through the [phi,v,p] block with the
    A/B matrices; bias Jacobians accumulate first-order sensitivities.
    """
    ng2 = calib.noise_gyro ** 2
    na2 = calib.noise_acc ** 2

    def step(carry, inp):
        (dR, dV, dP, T, cov, JRg, JVg, JVa, JPg, JPa) = carry
        w, a, dt, ok = inp
        dt = jnp.where(ok, dt, 0.0)
        w_c = w - bias_g
        a_c = a - bias_a

        # rotation increment + right Jacobian
        phi = w_c * dt
        dRi = lie.so3_exp(phi)
        Jr = lie.so3_right_jacobian(phi)

        acc_hat = lie.hat(a_c)
        dt2 = dt * dt

        # accumulate P, V with current dR (pre-update), like the reference
        dP_new = dP + dV * dt + 0.5 * (dR @ a_c) * dt2
        dV_new = dV + (dR @ a_c) * dt

        # covariance propagation (A/B structure, [phi v p] 9x9 + bias walk)
        A = jnp.eye(9)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-dR @ acc_hat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ acc_hat * dt2)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        B = jnp.zeros((9, 6))
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt2)
        Nga = jnp.zeros((6, 6)).at[0:3, 0:3].set(
            ng2 / jnp.maximum(dt, 1e-9) * jnp.eye(3)).at[3:6, 3:6].set(
            na2 / jnp.maximum(dt, 1e-9) * jnp.eye(3))
        cov9 = cov[0:9, 0:9]
        cov9_new = A @ cov9 @ A.T + B @ Nga @ B.T
        cov_new = cov.at[0:9, 0:9].set(jnp.where(ok, cov9_new, cov9))
        # bias random walk
        cov_new = cov_new.at[9:12, 9:12].add(
            jnp.where(ok, calib.walk_gyro ** 2 * dt, 0.0) * jnp.eye(3))
        cov_new = cov_new.at[12:15, 12:15].add(
            jnp.where(ok, calib.walk_acc ** 2 * dt, 0.0) * jnp.eye(3))

        # bias Jacobians (reference ImuTypes.cc:214-221)
        JPa_new = JPa + JVa * dt - 0.5 * dR * dt2
        JPg_new = JPg + JVg * dt - 0.5 * dR @ acc_hat @ JRg * dt2
        JVa_new = JVa - dR * dt
        JVg_new = JVg - dR @ acc_hat @ JRg * dt
        JRg_new = dRi.T @ JRg - Jr * dt

        dR_new = dR @ dRi
        new = (dR_new, dV_new, dP_new, T + dt, cov_new,
               JRg_new, JVg_new, JVa_new, JPg_new, JPa_new)
        old = (dR, dV, dP, T, cov_new, JRg, JVg, JVa, JPg, JPa)
        out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        return out, None

    init = (jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(()),
            jnp.zeros((15, 15)), jnp.zeros((3, 3)), jnp.zeros((3, 3)),
            jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.zeros((3, 3)))
    (dR, dV, dP, T, cov, JRg, JVg, JVa, JPg, JPa), _ = jax.lax.scan(
        step, init, (gyro, acc, dts, valid))
    return Preintegrated(dR, dV, dP, T, cov, JRg, JVg, JVa, JPg, JPa,
                         bias_g, bias_a)


def body_from_camera(R_bc, t_bc, R_cw, t_cw):
    """World-from-body state (R_wb, p_wb) of a camera-from-world pose under
    the camera-IMU extrinsics T_bc (body-from-camera). Batched over leading
    dims. Reference: ImuCamPose keeps both parameterizations in sync
    (include/G2oTypes.h:130, src/G2oTypes.cc SetParam/Update).

      R_wb = R_wc R_bc^T,  p_wb = C_cam - R_wb t_bc
    """
    R_wc = jnp.swapaxes(R_cw, -1, -2)
    C = -jnp.einsum('...ij,...j->...i', R_wc, t_cw)
    R_wb = R_wc @ jnp.swapaxes(R_bc, -1, -2)
    p_wb = C - jnp.einsum('...ij,j->...i', R_wb, t_bc)
    return R_wb, p_wb


def camera_from_body(R_bc, t_bc, R_wb, p_wb):
    """Inverse of body_from_camera: T_cw from a world-from-body state."""
    R_wc = R_wb @ R_bc
    R_cw = jnp.swapaxes(R_wc, -1, -2)
    C = p_wb + jnp.einsum('...ij,...j->...i', R_wb, t_bc)
    t_cw = -jnp.einsum('...ij,...j->...i', R_cw, C)
    return R_cw, t_cw


def corrected_deltas(p: Preintegrated, bias_g: jax.Array, bias_a: jax.Array):
    """Bias-corrected deltas via stored Jacobians (reference:
    GetDeltaRotation/Velocity/Position, ImuTypes.cc:283-310)."""
    dbg = bias_g - p.bias_g
    dba = bias_a - p.bias_a
    dR = p.dR @ lie.so3_exp(p.JRg @ dbg)
    dV = p.dV + p.JVg @ dbg + p.JVa @ dba
    dP = p.dP + p.JPg @ dbg + p.JPa @ dba
    return dR, dV, dP


def edge_information(preints: Preintegrated, calib: ImuCalib,
                     cap: float = 1e6, diag_only: bool = False):
    """Full [E,15,15] information matrix per inertial edge.

    Layout matches the 15-D edge residual of ops/viba._imu_edge_residual:
    rows 0-8 are the preintegration residual (phi, v, p) weighted by the
    FULL inverse of the 9x9 preintegration covariance block (reference:
    EdgeInertial sets information to cov.inverse(), src/Optimizer.cc:392-813
    via include/G2oTypes.h:495); rows 9-14 are the gyro/acc random-walk
    residuals with 1/(sigma_walk^2 dt) diagonal information (EdgeGyroRW /
    EdgeAccRW).

    ``cap`` bounds the information eigenvalues (adding cap^-1 to the
    covariance diagonal before inversion): the first-order integrator
    carries O(dt^2) discretization bias the noise-only covariance doesn't
    model, and the bound keeps the f32 normal equations conditioned.
    ``diag_only=True`` reproduces the legacy diagonal approximation
    1/diag(cov) (kept for A/B tests)."""
    E = preints.dt.shape[0]
    dts = jnp.maximum(preints.dt, 1e-3)                       # [E]
    info_bg = jnp.clip(1.0 / jnp.maximum(calib.walk_gyro ** 2 * dts,
                                         1e-12), 0.0, cap)
    info_ba = jnp.clip(1.0 / jnp.maximum(calib.walk_acc ** 2 * dts,
                                         1e-12), 0.0, cap)
    if diag_only:
        covs = preints.cov[:, jnp.arange(9), jnp.arange(9)]
        info9_d = jnp.clip(1.0 / jnp.maximum(covs, 1e-8), 0.0, cap)
        diag15 = jnp.concatenate([
            info9_d, jnp.repeat(info_bg[:, None], 3, 1),
            jnp.repeat(info_ba[:, None], 3, 1)], axis=1)      # [E,15]
        return jax.vmap(jnp.diag)(diag15)
    cov9 = preints.cov[:, :9, :9]
    cov9 = 0.5 * (cov9 + cov9.transpose(0, 2, 1)) \
        + (1.0 / cap) * jnp.eye(9)
    from dani_slam_tpu.ops import linalg as _dla
    info9 = jax.vmap(_dla.chol_inv)(cov9)
    info9 = 0.5 * (info9 + info9.transpose(0, 2, 1))
    W = jnp.zeros((E, 15, 15))
    W = W.at[:, :9, :9].set(info9)
    ii = jnp.arange(3)
    W = W.at[:, 9 + ii, 9 + ii].set(info_bg[:, None])
    W = W.at[:, 12 + ii, 12 + ii].set(info_ba[:, None])
    return W


def inertial_residual(p: Preintegrated, R1, t1, v1, R2, t2, v2,
                      bias_g, bias_a):
    """9-D preintegration residual between body states 1 and 2
    (reference: EdgeInertial::computeError, src/G2oTypes.cc).

    States are world-from-body here: R_wb, position t_wb (note: the SLAM map
    stores camera-from-world; conversion happens at the call site with Tbc).
    """
    dR, dV, dP = corrected_deltas(p, bias_g, bias_a)
    dt = p.dt
    er = lie.so3_log(dR.T @ R1.T @ R2)
    ev = R1.T @ (v2 - v1 - G_VEC * dt) - dV
    ep = R1.T @ (t2 - t1 - v1 * dt - 0.5 * G_VEC * dt * dt) - dP
    return jnp.concatenate([er, ev, ep])


# ---------------------------------------------------------------------------
# Gravity/scale initialization (reference: Optimizer::InertialOptimization
# src/Optimizer.cc:3042-3496 + LocalMapping::InitializeIMU:1175)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("iters", "optimize_scale"))
def inertial_init(R_wb: jax.Array, t_wb: jax.Array, dts: jax.Array,
                  preints: Preintegrated, iters: int = 30,
                  optimize_scale: bool = True,
                  prior_gyro: float = 1e2, prior_acc: float = 1e2,
                  t_off: jax.Array | None = None):
    """Estimate gravity direction, velocities, common bias and scale from a
    chain of keyframe poses + preintegrations (vmapped Preintegrated with
    leading dim K-1). Gauss-Newton on [s, theta_g(2), bg(3), ba(3), v(3K)].

    R_wb: world-from-BODY rotations. t_wb: the SCALE-DEPENDENT part of the
    body position (the camera center, which a mono map knows only up to
    scale); t_off [K,3] is the scale-INDEPENDENT extrinsic offset
    (-R_wb @ t_bc), so p_body(s) = s*t_wb + t_off. With identity Tbc,
    t_off = 0 and p_body = s*t_wb (reference: ImuCamPose scales only the
    camera translation, src/G2oTypes.cc VertexPose/InertialOptimization).

    Simplification vs reference: one shared bias across the window (the
    reference also optimizes a single bias here), velocities solved jointly.
    """
    K = R_wb.shape[0]
    if t_off is None:
        t_off = jnp.zeros_like(t_wb)

    def unpack(x):
        s = jnp.exp(x[0])       # log-scale param keeps s > 0
        th = x[1:3]
        bg = x[3:6]
        ba = x[6:9]
        v = x[9:].reshape(K, 3)
        # gravity direction: rotate nominal -z by exp([th_x, th_y, 0])
        Rg = lie.so3_exp(jnp.concatenate([th, jnp.zeros(1)]))
        g = Rg @ G_VEC
        return s, g, bg, ba, v

    def residuals(x):
        s, g, bg, ba, v = unpack(x)

        def one(i):
            p = jax.tree_util.tree_map(lambda a: a[i], preints)
            dR, dV, dP = corrected_deltas(p, bg, ba)
            dt = p.dt
            R1 = R_wb[i]
            p1 = s * t_wb[i] + t_off[i]
            p2 = s * t_wb[i + 1] + t_off[i + 1]
            er = lie.so3_log(dR.T @ R1.T @ R_wb[i + 1])
            ev = R1.T @ (v[i + 1] - v[i] - g * dt) - dV
            ep = R1.T @ (p2 - p1 - v[i] * dt - 0.5 * g * dt * dt) - dP
            return jnp.concatenate([er, ev, ep])
        chain = jax.vmap(one)(jnp.arange(K - 1)).reshape(-1)
        # strong bias priors pin the scale/bias degeneracy: when the
        # camera faces its motion center, the body-frame specific-force
        # direction is near-constant and an accelerometer bias can mimic a
        # map-scale change exactly (reference: EdgePriorGyro/EdgePriorAcc
        # with staged weights in InertialOptimization/FullInertialBA,
        # src/LocalMapping.cc:183-233, src/Optimizer.cc:392)
        prior = jnp.concatenate([jnp.sqrt(prior_gyro) * bg,
                                 jnp.sqrt(prior_acc) * ba])
        return jnp.concatenate([chain, prior])

    x0 = jnp.zeros(9 + 3 * K)

    def gn_step(_, x):
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = J.T @ J + 1e-6 * jnp.eye(x.shape[0])
        if not optimize_scale:
            H = H.at[0, :].set(0.0).at[:, 0].set(0.0).at[0, 0].set(1.0)
        g_vec = J.T @ r
        if not optimize_scale:
            g_vec = g_vec.at[0].set(0.0)
        return x - dla.chol_solve(H, g_vec)

    x = jax.lax.fori_loop(0, iters, gn_step, x0)
    s, g, bg, ba, v = unpack(x)
    r = residuals(x)
    return dict(scale=s, gravity=g, bias_g=bg, bias_a=ba, velocities=v,
                residual_norm=jnp.linalg.norm(r))
