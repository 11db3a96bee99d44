"""Lie-group operations: SO(3), SE(3), Sim(3).

Replaces the reference's header-only Sophus dependency (reference:
Thirdparty/Sophus; used throughout, e.g. include/Frame.h:177,
src/LoopClosing.cc Sim3 algebra) with a small batched JAX library.

Conventions:
  * Rotations are 3x3 matrices; poses are (R, t) pairs or 4x4 matrices.
  * All functions broadcast over arbitrary leading batch dims.
  * Small-angle branches use jnp.where with Taylor expansions so everything
    is jit/vmap/grad-safe (no data-dependent Python control flow).
  * Tangent ordering for se3/sim3: [rho (trans), phi (rot)(, sigma (scale))]
    — matches Sophus' (upsilon, omega) ordering.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def hat(phi: jax.Array) -> jax.Array:
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def vee(Phi: jax.Array) -> jax.Array:
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([Phi[..., 2, 1], Phi[..., 0, 2], Phi[..., 1, 0]], axis=-1)


def _sinc_terms(theta2: jax.Array):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3).

    theta2 is the squared angle; Taylor fallbacks keep gradients finite at 0.
    """
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    return a, b, c


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation matrix."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _sinc_terms(theta2)
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def so3_log(R: jax.Array) -> jax.Array:
    """Matrix log: (...,3,3) -> (...,3) axis-angle.

    Uses the quaternion route, which is stable near theta = 0 and theta = pi.
    """
    return quat_to_axis_angle(mat_to_quat(R))


def so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3): exp((phi+dphi)^) ~ exp(J_l dphi ^) exp(phi^)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    _, b, c = _sinc_terms(theta2)
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * K2


def so3_right_jacobian(phi: jax.Array) -> jax.Array:
    """Right Jacobian J_r(phi) = J_l(-phi). Used by IMU preintegration
    (reference: src/ImuTypes.cc IntegratedRotation, rightJ)."""
    return so3_left_jacobian(-phi)


def so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SO(3)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < _EPS
    half = 0.5 * theta
    # cot term: 1/theta^2 - (1+cos)/(2 theta sin) == (1 - half*cot(half))/theta^2
    cot_coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / jnp.maximum(theta2, 1e-24),
    )
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot_coef[..., None, None] * K2


def so3_right_jacobian_inv(phi: jax.Array) -> jax.Array:
    return so3_left_jacobian_inv(-phi)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion (...,4) wxyz -> rotation matrix (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def mat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (...,3,3) -> unit quaternion (...,4) wxyz, w >= 0.

    Branch-free Shepperd method: compute all four candidate quaternions and
    select the one with the largest pivot (jit-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20],
                   axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21],
                   axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22],
                   axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4 candidates,4)
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22,
                        -m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_axis_angle(q: jax.Array) -> jax.Array:
    """Unit quaternion wxyz -> axis-angle (...,3)."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(vnorm, w)
    # theta/sin(theta/2) with Taylor fallback
    scale = jnp.where(vnorm < 1e-8, 2.0 / jnp.maximum(w, 1e-8),
                      theta / jnp.maximum(vnorm, 1e-24))
    return v * scale[..., None]


# ---------------------------------------------------------------------------
# SE(3) — stored as (R: (...,3,3), t: (...,3)) or 4x4
# ---------------------------------------------------------------------------

def se3_exp(xi: jax.Array):
    """se(3) exp: (...,6) [rho, phi] -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum('...ij,...j->...i', V, rho)
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> (...,6) [rho, phi]."""
    phi = so3_log(R)
    Vinv = so3_left_jacobian_inv(phi)
    rho = jnp.einsum('...ij,...j->...i', Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inv(R: jax.Array, t: jax.Array):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum('...ij,...j->...i', Rt, t)


def se3_mul(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb)."""
    return Ra @ Rb, jnp.einsum('...ij,...j->...i', Ra, tb) + ta


def se3_apply(R, t, p):
    """Apply pose to points: R p + t. p: (...,3)."""
    return jnp.einsum('...ij,...j->...i', R, p) + t


def se3_to_mat(R, t):
    """(R,t) -> 4x4 homogeneous."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def mat_to_se3(T):
    return T[..., :3, :3], T[..., :3, 3]


# ---------------------------------------------------------------------------
# Sim(3) — (R, t, s); group action p -> s R p + t
# (reference: Sim3Solver.cc, LoopClosing Sim3 propagation, Optimizer.cc
#  OptimizeEssentialGraph BlockSolver_7_3)
# ---------------------------------------------------------------------------

def _sim3_W(phi: jax.Array, sigma: jax.Array) -> jax.Array:
    """The W matrix of Sim(3) exp: t = W @ rho.

    Closed form W = A*Omega + B*Omega^2 + C*I with small-angle/small-scale
    Taylor fallbacks (standard Strasdat/Sophus formulation, branch-free).
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    s = jnp.exp(sigma)
    Omega = hat(phi)
    Omega2 = Omega @ Omega
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Omega.shape)

    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta2 < _EPS
    sig_safe = jnp.where(small_sig, 1.0, sigma)
    th_safe = jnp.where(small_th, 1.0, theta)
    th2_safe = jnp.where(small_th, 1.0, theta2)

    # sigma ~ 0 branch
    A_ss = jnp.where(small_th, 0.5, (1.0 - jnp.cos(th_safe)) / th2_safe)
    B_ss = jnp.where(small_th, 1.0 / 6.0,
                     (th_safe - jnp.sin(th_safe)) / (th2_safe * th_safe))
    C_ss = jnp.ones_like(sigma)

    # sigma != 0 branch
    C_gen = (s - 1.0) / sig_safe
    sig2 = sig_safe * sig_safe
    A_s0 = ((sig_safe - 1.0) * s + 1.0) / sig2               # theta ~ 0
    B_s0 = (s * 0.5 * sig2 + s - 1.0 - sig_safe * s) / (sig2 * sig_safe)
    a_ = s * jnp.sin(th_safe)
    b_ = s * jnp.cos(th_safe)
    c_ = th2_safe + sigma * sigma
    A_g = (a_ * sigma + (1.0 - b_) * th_safe) / (th_safe * c_)
    B_g = (C_gen - ((b_ - 1.0) * sigma + a_ * th_safe) / c_) / th2_safe
    A_gen = jnp.where(small_th, A_s0, A_g)
    B_gen = jnp.where(small_th, B_s0, B_g)

    A = jnp.where(small_sig, A_ss, A_gen)
    B = jnp.where(small_sig, B_ss, B_gen)
    C = jnp.where(small_sig, C_ss, C_gen)
    return (A[..., None, None] * Omega + B[..., None, None] * Omega2
            + C[..., None, None] * eye)


def sim3_exp(xi: jax.Array):
    """sim(3) exp: (...,7) [rho, phi, sigma] -> (R, t, s)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum('...ij,...j->...i', W, rho)
    return R, t, jnp.exp(sigma)


def sim3_log(R: jax.Array, t: jax.Array, s: jax.Array) -> jax.Array:
    """(R, t, s) -> (...,7) [rho, phi, sigma]."""
    phi = so3_log(R)
    sigma = jnp.log(s)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_inv(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum('...ij,...j->...i', Rt, t), s_inv


def sim3_mul(Ra, ta, sa, Rb, tb, sb):
    """(Ra,ta,sa) * (Rb,tb,sb): action p -> sa Ra (sb Rb p + tb) + ta."""
    return (Ra @ Rb,
            sa[..., None] * jnp.einsum('...ij,...j->...i', Ra, tb) + ta,
            sa * sb)


def sim3_apply(R, t, s, p):
    return s[..., None] * jnp.einsum('...ij,...j->...i', R, p) + t


# ---------------------------------------------------------------------------
# Interpolation / alignment helpers
# ---------------------------------------------------------------------------

def orthonormalize(R: jax.Array) -> jax.Array:
    """Project a near-rotation back onto SO(3) via quaternion roundtrip
    (cheap; exact for true rotations). Matrix products in f32 drift off the
    manifold; worse, se3_inv uses the transpose, which preserves any scale
    error, so pose-velocity feedback loops AMPLIFY det(R) exponentially
    unless renormalized once per cycle."""
    return quat_to_mat(mat_to_quat(R))


def normalize_rotation(R: jax.Array) -> jax.Array:
    """Project a near-rotation matrix back onto SO(3) via SVD."""
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape).at[..., 2, 2].mul(0)
    D = D + jnp.zeros_like(R).at[..., 2, 2].set(det)
    return U @ D @ Vt
