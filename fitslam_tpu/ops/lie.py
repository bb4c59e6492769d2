"""Batched SO(3)/SE(3) Lie-group operations.

The reference system represents poses as ROS geometry_msgs / Eigen isometries
and optimizes them with g2o (SURVEY.md §2.1 S1). Here poses are plain arrays —
rotation matrices ``R (..., 3, 3)`` and translations ``t (..., 3)`` — so every
operation broadcasts over arbitrary batch dimensions and fuses under jit.
Tangent vectors follow the [rho, phi] = [translation, rotation] convention
with the *left* perturbation ``T' = exp(xi) @ T`` used by the Gauss-Newton
solvers in ops/ba.py and ops/pgo.py.

All small-angle branches use Taylor expansions selected with the "safe where"
pattern so both the primal and the gradient are finite at theta -> 0.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8

# All products in this module are tiny (3x3 chains) but COMPOUND across
# hundreds of frames: bf16-input MXU passes (the TPU default) measurably
# diverge the rotation-stressed loop benchmark while CPU tracks fine. Pin
# full-f32 per-op here instead of flipping the process-global matmul default
# (which round 2 did, dragging the image-frontend convs onto the 6-pass f32
# path at -35% end-to-end frames/s).
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
_einsum_f32 = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class SE3(NamedTuple):
    """A (batch of) rigid transform(s): x_out = R @ x + t."""

    R: jax.Array  # (..., 3, 3)
    t: jax.Array  # (..., 3)

    @property
    def batch_shape(self):
        return self.t.shape[:-1]

    def matrix(self) -> jax.Array:
        """(..., 4, 4) homogeneous matrices."""
        bot = jnp.zeros(self.t.shape[:-1] + (1, 4), self.t.dtype).at[..., 0, 3].set(1.0)
        top = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype)
        return SE3(R, t)

    @staticmethod
    def from_matrix(T: jax.Array) -> "SE3":
        return SE3(T[..., :3, :3], T[..., :3, 3])


def skew(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix [w]x.

    Reference equivalent: getSkewMatrix, FisherInformationHelpers.cpp:7-14.
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    rows = [
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _safe_div(num, den, alt):
    """num/den where den != 0 else alt, with NaN-free gradients."""
    safe = jnp.abs(den) > _EPS
    den_ = jnp.where(safe, den, 1.0)
    return jnp.where(safe, num / den_, alt)


def _sin_theta_over_theta(theta2):
    """sin(t)/t and Taylor fallback, as a function of t^2 (grad-safe: the
    untaken branch must never divide by zero or grads NaN through where)."""
    t2 = jnp.where(theta2 > _EPS, theta2, 1.0)
    theta = jnp.sqrt(t2)
    return jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)


def _one_minus_cos_over_theta2(theta2):
    t2 = jnp.where(theta2 > _EPS, theta2, 1.0)
    theta = jnp.sqrt(t2)
    return jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / t2, 0.5 - theta2 / 24.0)


def _theta_minus_sin_over_theta3(theta2):
    t2 = jnp.where(theta2 > _EPS, theta2, 1.0)
    theta = jnp.sqrt(t2)
    return jnp.where(
        theta2 > _EPS,
        (theta - jnp.sin(theta)) / (t2 * theta),
        1.0 / 6.0 - theta2 / 120.0,
    )


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) rotation vector -> (..., 3, 3) rotation matrix."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    K = skew(phi)
    KK = _mm(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + _sin_theta_over_theta(theta2) * K + _one_minus_cos_over_theta2(theta2) * KK


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector.

    Handles the theta ~ pi branch via the diagonal-based axis extraction.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)

    # Generic branch: vee((R - R^T)/2) * theta/sin(theta)
    vee = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # atan2(|sin|, cos) is well-conditioned at theta -> pi where
    # arccos((trace-1)/2) loses ~sqrt(eps) digits in float32. The norm is
    # eps-padded so its gradient stays finite at theta -> 0 (autodiff flows
    # through here from pose-graph edge Jacobians at near-zero residuals).
    sin_theta = jnp.sqrt(jnp.sum(vee * vee, axis=-1) + 1e-24)
    theta = jnp.arctan2(sin_theta, cos_theta)
    scale = _safe_div(theta, sin_theta, 1.0 + theta * theta / 6.0)[..., None]
    generic = scale * vee

    # Near-pi branch: axis from largest diagonal of (R + I)/2
    # R = I + sin(t)K + (1-cos t)K^2; at t=pi, R+I = 2 a a^T (a = axis)
    B = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(B, k[..., None, None], axis=-1)[..., 0]  # (...,3)
    nrm = jnp.sqrt(jnp.clip(jnp.take_along_axis(diag, k[..., None], axis=-1)[..., 0], _EPS))
    axis = col / nrm[..., None]
    # Fix sign so axis agrees with vee direction (sin may be ~0 but keep continuity)
    sign = jnp.where(jnp.sum(axis * vee, axis=-1) < 0.0, -1.0, 1.0)
    near_pi = (sign * theta)[..., None] * axis

    use_pi = (jnp.pi - theta) < 1e-3
    return jnp.where(use_pi[..., None], near_pi, generic)


def so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3): integrates rotation into translation."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    K = skew(phi)
    KK = _mm(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return (
        eye
        + _one_minus_cos_over_theta2(theta2) * K
        + _theta_minus_sin_over_theta3(theta2) * KK
    )


def so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    t2 = jnp.where(theta2 > _EPS, theta2, 1.0)
    theta = jnp.sqrt(t2)
    K = skew(phi)
    KK = _mm(K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        theta2 > _EPS,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.sin(half_theta)) / t2,
        1.0 / 12.0 + theta2 / 720.0,
    )
    return eye - 0.5 * K + cot_term * KK


def se3_exp(xi: jax.Array) -> SE3:
    """(..., 6) [rho, phi] -> SE3. R = exp(phi), t = J_l(phi) @ rho."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = (_mm(so3_left_jacobian(phi), rho[..., :, None]))[..., 0]
    return SE3(R, t)


def se3_log(T: SE3) -> jax.Array:
    """SE3 -> (..., 6) [rho, phi]."""
    phi = so3_log(T.R)
    rho = (_mm(so3_left_jacobian_inv(phi), T.t[..., :, None]))[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def compose(A: SE3, B: SE3) -> SE3:
    """A then-applied-after B: (A*B)(x) = A(B(x))."""
    return SE3(_mm(A.R, B.R), (_mm(A.R, B.t[..., :, None]))[..., 0] + A.t)


def inverse(T: SE3) -> SE3:
    Rt = jnp.swapaxes(T.R, -1, -2)
    return SE3(Rt, -(_mm(Rt, T.t[..., :, None]))[..., 0])


def apply(T: SE3, pts: jax.Array) -> jax.Array:
    """Transform points. T batch (...,), pts (..., N, 3) or (..., 3)."""
    if pts.ndim == T.t.ndim:  # (..., 3)
        return (_mm(T.R, pts[..., :, None]))[..., 0] + T.t
    return _einsum_f32("...ij,...nj->...ni", T.R, pts) + T.t[..., None, :]


def adjoint(T: SE3) -> jax.Array:
    """(..., 6, 6) adjoint: Ad_T @ xi = log(T exp(xi) T^-1)."""
    top = jnp.concatenate([T.R, _mm(skew(T.t), T.R)], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(T.R), T.R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def interpolate(A: SE3, B: SE3, alpha) -> SE3:
    """Geodesic interpolation from A (alpha=0) to B (alpha=1)."""
    delta = se3_log(compose(B, inverse(A)))
    return compose(se3_exp(alpha * delta), A)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z) — used by the host API / checkpoint format where a
# compact pose encoding is preferable to a 3x3 matrix.
# ---------------------------------------------------------------------------


def quat_from_rotmat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) unit quaternion (w, x, y, z), branch-free.

    Computes all four Shepperd candidates and selects the best-conditioned.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # Four squared magnitudes (up to scale 4): qw^2, qx^2, qy^2, qz^2
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    cands = jnp.stack(
        [
            jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 4): row i is the candidate scaled by 4*q_i
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rotmat_from_quat(q: jax.Array) -> jax.Array:
    """(..., 4) (w, x, y, z) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ]
    return jnp.stack(rows, axis=-2)


def yaw_to_rotmat(yaw: jax.Array) -> jax.Array:
    """(...) yaw about +z -> (..., 3, 3). Planar-rover helper."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rows = [
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ]
    return jnp.stack(rows, axis=-2)
