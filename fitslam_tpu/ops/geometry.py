"""Batched projective geometry: pinhole camera, stereo, triangulation.

The reference delegates these to ORB-SLAM3's GeometricCamera / two-view
reconstruction (submodule, SURVEY.md §2.1 S1). Here they are pure batched
array functions shared by tracking, local mapping, and bundle adjustment.

Conventions: camera frame has +z forward, +x right, +y down. A world point
``p_w`` observed by a camera with world-from-camera pose ``T_wc`` is first
mapped to the camera frame with ``T_cw = inverse(T_wc)``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from functools import partial

# full-f32 contraction precision on geometry transforms (see ops/lie.py)
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from fitslam_tpu.ops import lie


class Intrinsics(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    baseline: jax.Array  # stereo baseline [m]; 0 for mono

    @staticmethod
    def from_config(cam) -> "Intrinsics":
        f = jnp.float32
        return Intrinsics(f(cam.fx), f(cam.fy), f(cam.cx), f(cam.cy), f(cam.baseline))

    @property
    def bf(self):
        """baseline * fx — stereo disparity scale."""
        return self.baseline * self.fx


def project(K: Intrinsics, p_c: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Camera-frame points (..., 3) -> pixel coords (..., 2), valid mask.

    Depth-clamped so gradients stay finite for points behind the camera; the
    validity mask flags them instead.
    """
    z = p_c[..., 2]
    valid = z > 1e-3
    z_safe = jnp.where(valid, z, 1.0)
    u = K.fx * p_c[..., 0] / z_safe + K.cx
    v = K.fy * p_c[..., 1] / z_safe + K.cy
    return jnp.stack([u, v], axis=-1), valid


def project_stereo(K: Intrinsics, p_c: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., 3) -> (..., 3) [u_left, v, u_right], valid mask."""
    uv, valid = project(K, p_c)
    z_safe = jnp.where(valid, p_c[..., 2], 1.0)
    u_r = uv[..., 0] - K.bf / z_safe
    return jnp.concatenate([uv, u_r[..., None]], axis=-1), valid


def backproject(K: Intrinsics, uv: jax.Array, depth: jax.Array) -> jax.Array:
    """Pixels (..., 2) + depth (...) -> camera-frame points (..., 3)."""
    x = (uv[..., 0] - K.cx) / K.fx * depth
    y = (uv[..., 1] - K.cy) / K.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def depth_from_disparity(K: Intrinsics, disparity: jax.Array) -> jax.Array:
    """Stereo disparity (u_l - u_r) -> depth; invalid (<=0) -> 0."""
    valid = disparity > 1e-3
    return jnp.where(valid, K.bf / jnp.where(valid, disparity, 1.0), 0.0)


def triangulate_stereo(K: Intrinsics, T_wc: lie.SE3, uv: jax.Array, disparity: jax.Array):
    """Left pixel + disparity -> world point. Returns (p_w (...,3), valid)."""
    depth = depth_from_disparity(K, disparity)
    p_c = backproject(K, uv, depth)
    p_w = lie.apply(T_wc, p_c) if p_c.ndim == T_wc.t.ndim else (
        _einsum("ij,...j->...i", T_wc.R, p_c) + T_wc.t
    )
    return p_w, depth > 1e-6


def triangulate_two_view(
    K: Intrinsics, T_wc1: lie.SE3, T_wc2: lie.SE3, uv1: jax.Array, uv2: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Midpoint triangulation of rays from two calibrated views.

    uv1/uv2: (..., 2). Returns world points (..., 3) and a validity mask
    (positive depth in both views, adequate parallax).
    """
    def ray_world(T, uv):
        d_c = jnp.stack(
            [(uv[..., 0] - K.cx) / K.fx, (uv[..., 1] - K.cy) / K.fy, jnp.ones_like(uv[..., 0])],
            axis=-1,
        )
        d_w = _einsum("ij,...j->...i", T.R, d_c)
        return d_w / jnp.linalg.norm(d_w, axis=-1, keepdims=True)

    o1, o2 = T_wc1.t, T_wc2.t
    d1 = ray_world(T_wc1, uv1)
    d2 = ray_world(T_wc2, uv2)
    # Solve [d1 -d2] [s; t] = o2 - o1 in least squares (2x2 normal equations)
    r = o2 - o1
    a = jnp.sum(d1 * d1, -1)
    b = jnp.sum(d1 * d2, -1)
    c = jnp.sum(d2 * d2, -1)
    det = a * c - b * b
    parallax_ok = jnp.abs(det) > 1e-6
    det_safe = jnp.where(parallax_ok, det, 1.0)
    rd1 = jnp.sum(r * d1, -1)
    rd2 = jnp.sum(r * d2, -1)
    s = (c * rd1 - b * rd2) / det_safe
    t = (b * rd1 - a * rd2) / det_safe
    p1 = o1 + s[..., None] * d1
    p2 = o2 + t[..., None] * d2
    p_w = 0.5 * (p1 + p2)
    # depth check in each camera frame
    z1 = _einsum("ij,...j->...i", T_wc1.R.T, p_w - o1)[..., 2]
    z2 = _einsum("ij,...j->...i", T_wc2.R.T, p_w - o2)[..., 2]
    valid = parallax_ok & (s > 0) & (t > 0) & (z1 > 1e-3) & (z2 > 1e-3)
    return p_w, valid


def reprojection_residual(
    K: Intrinsics, T_cw: lie.SE3, p_w: jax.Array, uv_obs: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Residual uv_pred - uv_obs for points (..., 3) vs obs (..., 2)."""
    p_c = _einsum("...ij,...j->...i", T_cw.R, p_w) + T_cw.t
    uv, valid = project(K, p_c)
    return uv - uv_obs, valid


def huber_weight(r2: jax.Array, delta: float) -> jax.Array:
    """IRLS weight for the Huber loss given squared residual norm."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    return jnp.where(r <= delta, 1.0, delta / r)
