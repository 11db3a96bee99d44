"""Camera models: pinhole and Kannala-Brandt-8 fisheye.

TPU-native re-design of the reference's GeometricCamera virtual interface
(reference: include/CameraModels/GeometricCamera.h:61-86,
src/CameraModels/Pinhole.cpp, src/CameraModels/KannalaBrandt8.cpp).

Instead of C++ virtual dispatch, a camera is a small dataclass pytree carrying
a `kind` static field plus a parameter vector; all operations are pure,
batched functions usable under jit/vmap. Parameter layouts:
  PINHOLE: [fx, fy, cx, cy]
  KB8    : [fx, fy, cx, cy, k0, k1, k2, k3]   (equidistant distortion)

The classic radial-tangential distortion used by the reference's
`UndistortKeyPoints` path (Frame.cc:749, OpenCV model with DistCoef
[k1,k2,p1,p2(,k3)]) is provided as standalone distort/undistort functions.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

PINHOLE = 0
KB8 = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Camera intrinsics pytree. `kind` and `size` are static."""
    params: jax.Array                 # (4,) pinhole | (8,) KB8
    dist: jax.Array                   # (5,) radtan [k1,k2,p1,p2,k3] (zeros ok)
    kind: int = dataclasses.field(metadata=dict(static=True), default=PINHOLE)
    width: int = dataclasses.field(metadata=dict(static=True), default=640)
    height: int = dataclasses.field(metadata=dict(static=True), default=480)

    @staticmethod
    def pinhole(fx, fy, cx, cy, width, height, dist=None):
        d = jnp.zeros(5, jnp.float32) if dist is None else jnp.asarray(
            dist, jnp.float32)
        return Camera(jnp.array([fx, fy, cx, cy], jnp.float32), d,
                      PINHOLE, width, height)

    @staticmethod
    def kb8(fx, fy, cx, cy, k0, k1, k2, k3, width, height):
        return Camera(jnp.array([fx, fy, cx, cy, k0, k1, k2, k3], jnp.float32),
                      jnp.zeros(5, jnp.float32), KB8, width, height)

    @property
    def K(self) -> jax.Array:
        fx, fy, cx, cy = self.params[0], self.params[1], self.params[2], self.params[3]
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack([
            jnp.stack([fx, z, cx]), jnp.stack([z, fy, cy]),
            jnp.stack([z, z, o])])


# ---------------------------------------------------------------------------
# Projection (reference: Pinhole::project Pinhole.cpp:33-47,
#             KannalaBrandt8::project KannalaBrandt8.cpp:35-60)
# ---------------------------------------------------------------------------

def project(cam: Camera, pts3d: jax.Array) -> jax.Array:
    """Camera-frame 3-D points (...,3) -> pixels (...,2)."""
    if cam.kind == PINHOLE:
        return _pinhole_project(cam.params, pts3d)
    return _kb8_project(cam.params, pts3d)


def _pinhole_project(p, x):
    z = x[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = p[0] * x[..., 0] / z_safe + p[2]
    v = p[1] * x[..., 1] / z_safe + p[3]
    return jnp.stack([u, v], axis=-1)


def _kb8_project(p, x):
    z = x[..., 2]
    r2 = x[..., 0] ** 2 + x[..., 1] ** 2
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    theta_d = theta * (1 + t2 * (p[4] + t2 * (p[5] + t2 * (p[6] + t2 * p[7]))))
    scale = jnp.where(r < 1e-9, 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z),
                      theta_d / r)
    u = p[0] * x[..., 0] * scale + p[2]
    v = p[1] * x[..., 1] * scale + p[3]
    return jnp.stack([u, v], axis=-1)


def project_jac(cam: Camera, pts3d: jax.Array) -> jax.Array:
    """d(pixel)/d(point): (...,2,3) (reference: projectJac,
    Pinhole.cpp:67-81, KannalaBrandt8.cpp:172-228). Autodiff-derived —
    identical analytic structure, zero hand-written Jacobians to maintain."""
    flat = pts3d.reshape(-1, 3)
    proj = _pinhole_project if cam.kind == PINHOLE else _kb8_project
    J = jax.vmap(jax.jacfwd(lambda q: proj(cam.params, q)))(flat)
    return J.reshape(pts3d.shape[:-1] + (2, 3))


# ---------------------------------------------------------------------------
# Unprojection
# ---------------------------------------------------------------------------

def unproject(cam: Camera, px: jax.Array) -> jax.Array:
    """Pixels (...,2) -> unit-depth camera rays (...,3) with z=1."""
    if cam.kind == PINHOLE:
        return _pinhole_unproject(cam.params, px)
    return _kb8_unproject(cam.params, px)


def _pinhole_unproject(p, px):
    mx = (px[..., 0] - p[2]) / p[0]
    my = (px[..., 1] - p[3]) / p[1]
    return jnp.stack([mx, my, jnp.ones_like(mx)], axis=-1)


def _kb8_unproject(p, px, iters: int = 10):
    """Invert the equidistant distortion by Newton iteration
    (reference: KannalaBrandt8.cpp:116-143 uses the same scheme; fixed
    iteration count keeps it jit-friendly)."""
    mx = (px[..., 0] - p[2]) / p[0]
    my = (px[..., 1] - p[3]) / p[1]
    theta_d = jnp.sqrt(mx * mx + my * my)
    theta_d_c = jnp.clip(theta_d, -jnp.pi / 2, jnp.pi / 2)

    def body(_, theta):
        t2 = theta * theta
        k_part = p[4] + t2 * (p[5] + t2 * (p[6] + t2 * p[7]))
        f = theta * (1 + t2 * k_part) - theta_d_c
        fp = 1 + t2 * (3 * p[4] + t2 * (5 * p[5] + t2 * (7 * p[6] + 9 * t2 * p[7])))
        return theta - f / jnp.where(jnp.abs(fp) < 1e-9, 1e-9, fp)

    theta = jax.lax.fori_loop(0, iters, body, theta_d_c)
    scale = jnp.where(theta_d < 1e-9, 1.0, jnp.tan(theta) / theta_d)
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def unproject_bearing(cam: Camera, px: jax.Array) -> jax.Array:
    """Pixels -> unit-norm bearing vectors (for MLPnP; reference:
    MLPnPsolver.cpp unprojectEig bearings)."""
    ray = unproject(cam, px)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Radial-tangential distortion (the OpenCV model used by the reference's
# mono/RGB-D pinhole path; Frame.cc:749 UndistortKeyPoints via cv::undistortPoints)
# ---------------------------------------------------------------------------

def radtan_distort(dist: jax.Array, xn: jax.Array) -> jax.Array:
    """Normalized coords (...,2) -> distorted normalized coords (...,2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def radtan_undistort(dist: jax.Array, xd: jax.Array, iters: int = 8) -> jax.Array:
    """Fixed-point inversion of radtan distortion (cv::undistortPoints
    semantics, fixed iterations for jit)."""
    def body(_, xn):
        k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        xs = (xd[..., 0] - dx) / radial
        ys = (xd[..., 1] - dy) / radial
        return jnp.stack([xs, ys], axis=-1)
    return jax.lax.fori_loop(0, iters, body, xd)


def undistort_keypoints(cam: Camera, px: jax.Array) -> jax.Array:
    """Pixel keypoints -> undistorted pixel keypoints (reference:
    Frame::UndistortKeyPoints Frame.cc:749-781; no-op when dist==0)."""
    p = cam.params
    mx = (px[..., 0] - p[2]) / p[0]
    my = (px[..., 1] - p[3]) / p[1]
    xn = radtan_undistort(cam.dist, jnp.stack([mx, my], axis=-1))
    u = xn[..., 0] * p[0] + p[2]
    v = xn[..., 1] * p[1] + p[3]
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# Two-view geometry helpers
# ---------------------------------------------------------------------------

def epipolar_error(cam1: Camera, cam2: Camera, kp1: jax.Array, kp2: jax.Array,
                   R12: jax.Array, t12: jax.Array) -> jax.Array:
    """Squared point-to-epipolar-line distance of kp2 wrt (R12,t12)
    (reference: Pinhole::epipolarConstrain Pinhole.cpp:107-125 checks
    dist^2 < 3.84 * unc). Works for both models by using unprojected rays."""
    t12x = jnp.stack([
        jnp.stack([jnp.zeros_like(t12[..., 0]), -t12[..., 2], t12[..., 1]], -1),
        jnp.stack([t12[..., 2], jnp.zeros_like(t12[..., 0]), -t12[..., 0]], -1),
        jnp.stack([-t12[..., 1], t12[..., 0], jnp.zeros_like(t12[..., 0])], -1),
    ], -2)
    E = t12x @ R12
    r1 = unproject(cam1, kp1)
    r2 = unproject(cam2, kp2)
    l2 = jnp.einsum('...ij,...j->...i', E, r1)       # epipolar line in cam2
    num = jnp.einsum('...i,...i->...', r2, l2) ** 2
    den = l2[..., 0] ** 2 + l2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def triangulate_midpoint(ray1: jax.Array, ray2: jax.Array,
                         R21: jax.Array, t21: jax.Array):
    """Closed-form midpoint triangulation — no SVD. Returns X in cam1.

    The DLT variant below (the reference's GeometricTools::Triangulate) runs
    a batched 4x4 SVD whose iterative lowering dominates the keyframe
    program on TPU (~25 ms for 5x1024 pairs); the midpoint of the two
    closest ray points is pure arithmetic, equally accurate once the usual
    parallax/reprojection gates cull the near-degenerate pairs. Used on the
    landmark-creation hot path (slam/mapping.create_new_landmarks)."""
    d1 = ray1
    d2 = jnp.einsum('ji,...j->...i', R21, ray2)          # ray2 in cam1
    C2 = -jnp.einsum('ji,j->i', R21, t21)                # cam2 center in cam1
    a = jnp.sum(d1 * d1, -1)
    b = jnp.sum(d1 * d2, -1)
    c = jnp.sum(d2 * d2, -1)
    e = jnp.sum(d1 * C2, -1)
    f = jnp.sum(d2 * C2, -1)
    den = a * c - b * b                                   # ~0 when parallel
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    s = (e * c - b * f) / den
    u = (e * b - a * f) / den
    return 0.5 * (s[..., None] * d1 + C2 + u[..., None] * d2)


def triangulate_two_view(ray1: jax.Array, ray2: jax.Array,
                         R21: jax.Array, t21: jax.Array):
    """Mid-point style DLT triangulation of matched rays between two cameras
    with relative pose (R21, t21) mapping cam1 coords to cam2
    (reference: GeometricTools::Triangulate GeometricTools.cc:30-68 —
    SVD of a 4x4 system; here solved per-match, vmappable)."""
    # Build A x = 0 with projection matrices P1=[I|0], P2=[R21|t21],
    # rows: r1 x (P1 X) = 0, r2 x (P2 X) = 0 (two rows each).
    def rows(ray, P):
        x, y, z = ray[..., 0], ray[..., 1], ray[..., 2]
        return jnp.stack([x[..., None] * P[..., 2, :] - z[..., None] * P[..., 0, :],
                          y[..., None] * P[..., 2, :] - z[..., None] * P[..., 1, :]],
                         axis=-2)
    batch = ray1.shape[:-1]
    P1 = jnp.broadcast_to(jnp.concatenate(
        [jnp.eye(3, dtype=ray1.dtype), jnp.zeros((3, 1), ray1.dtype)], axis=1),
        batch + (3, 4))
    P2 = jnp.concatenate([R21, t21[..., None]], axis=-1)
    P2 = jnp.broadcast_to(P2, batch + (3, 4))
    A = jnp.concatenate([rows(ray1, P1), rows(ray2, P2)], axis=-2)
    # Null vector of A = last right singular vector (SVD of A directly —
    # eigh(A^T A) squares the condition number, too lossy in f32).
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    X = Vt[..., 3, :]
    w = X[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w_safe[..., None]


@partial(jax.jit, static_argnames=())
def stereo_depth_from_disparity(fx: jax.Array, baseline: jax.Array,
                                disparity: jax.Array) -> jax.Array:
    d = jnp.where(disparity <= 0, jnp.inf, disparity)
    return fx * baseline / d
