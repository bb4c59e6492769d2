"""Fisher-information viewpoint safety as batched closed-form kernels.

Reference capability (SURVEY.md §2.2 F1-F3):
- FisherInformationHelpers.cpp:50-91: bearing-measurement Jacobian of the
  unit-vector observation of a landmark, d f / d p_c =
  (1/||p||) I - (1/||p||^3) p p^T, chained with the pose derivative
  (translation -I, rotation [p]x) into a 3x6 Jacobian; FIM = J^T Q^-1 J
  (:93-96); scalar information = trace(FIM) (:98-123).
- FisherInfoManager.cpp:287-324: per-landmark information is looked up in a
  precomputed ~24 MB voxel table and accumulated with a per-voxel saturation
  factor exp(1 - count^0.8) so dense voxels don't over-count.

TPU design: the trace has a closed form cheap enough to evaluate directly —
the lookup table becomes a direct batched computation (the table generator
is still provided for parity/testing, SURVEY.md §3.5). Voxel saturation uses
rank-within-voxel from one sort, applying exp(1 - rank^0.8) per landmark
exactly as the reference's running counter does.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit

from fitslam_tpu.ops import lie


def bearing_jacobian_local(p_c: jax.Array) -> jax.Array:
    """(..., 3) camera-frame point -> (..., 3, 6) Jacobian of the unit-bearing
    observation w.r.t. the local pose perturbation [translation, rotation].

    Reference: computeJacobianForPointLocal, FisherInformationHelpers.cpp:50-91.
    """
    n = jnp.linalg.norm(p_c, axis=-1, keepdims=True)[..., None]  # (..., 1, 1)
    n = jnp.maximum(n, 1e-6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p_c.dtype), p_c.shape[:-1] + (3, 3))
    ppT = p_c[..., :, None] * p_c[..., None, :]
    df_dp = eye / n - ppT / (n**3)                    # (..., 3, 3)
    # dp_c/d xi: translation -> -I, rotation -> [p]x
    dp_dxi = jnp.concatenate([-eye, lie.skew(p_c)], axis=-1)  # (..., 3, 6)
    return jnp.matmul(df_dp, dp_dxi, precision=jax.lax.Precision.HIGHEST)


def point_information_local(p_c: jax.Array, noise_var: float = 0.01) -> jax.Array:
    """trace(J^T Q^-1 J) per camera-frame point (..., 3) -> (...).

    Reference: computeInformationOfPointLocal, FisherInformationHelpers.cpp:98-123.
    """
    J = bearing_jacobian_local(p_c)
    fim_trace = jnp.sum(J * J, axis=(-2, -1)) / noise_var  # trace(J^T J)/var
    return fim_trace


def voxel_key(p_c: jax.Array, step_min: float = 0.09, step_max: float = 0.3,
              near_dist: float = 4.0) -> jax.Array:
    """Two-resolution voxel id per camera-frame point (..., 3) -> (...) int32.

    Reference: getVoxelCoordinate + LookupKey hashing,
    FisherInfoManager.hpp:25-58 (fine voxels near the camera, coarse far).
    """
    d = jnp.linalg.norm(p_c, axis=-1, keepdims=True)
    step = jnp.where(d < near_dist, step_min, step_max)
    q = jnp.round(p_c / step).astype(jnp.int32)
    # spatial hash (same constants family as the reference's hash combine)
    h = (
        q[..., 0] * jnp.int32(73856093)
        ^ q[..., 1] * jnp.int32(19349663)
        ^ q[..., 2] * jnp.int32(83492791)
    )
    # fold the resolution tier into the key so near/far voxels never collide
    tier = (d[..., 0] >= near_dist).astype(jnp.int32)
    return h ^ (tier * jnp.int32(0x5BD1E995))


@vjit(static_argnames=("max_landmarks",))
def pose_information(
    p_c: jax.Array,            # (L, 3) camera-frame landmark positions
    valid: jax.Array,          # (L,) bool
    noise_var: float = 0.01,
    max_distance: float = 14.0,
    saturation_exponent: float = 0.8,
    max_landmarks: int = 0,    # unused; kept for shape-stability docs
) -> jax.Array:
    """Total saturated Fisher information of a pose given visible landmarks.

    Per-landmark contribution: info(p) * exp(1 - rank^0.8), rank = 1-based
    arrival order within the landmark's voxel (FisherInfoManager.cpp:287-324,
    FisherInfoManager.hpp:102-106).
    """
    L = p_c.shape[0]
    d = jnp.linalg.norm(p_c, axis=-1)
    ok = valid & (d > 1e-3) & (d < max_distance)
    info = jnp.where(ok, point_information_local(p_c, noise_var), 0.0)

    keys = jnp.where(ok, voxel_key(p_c), jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(keys, stable=True)
    keys_s = keys[order]
    new_voxel = jnp.concatenate([jnp.array([True]), keys_s[1:] != keys_s[:-1]])
    seg_start = jnp.where(new_voxel, jnp.arange(L), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = (jnp.arange(L) - seg_start + 1).astype(jnp.float32)   # 1-based
    sat = jnp.exp(1.0 - rank**saturation_exponent)
    contrib = info[order] * sat * ok[order]
    return jnp.sum(contrib)


def is_pose_safe(total_info: jax.Array, threshold: float) -> jax.Array:
    """Threshold test (FisherInfoManager.cpp:112-114)."""
    return total_info > threshold


@vjit
def frontier_pair_information(
    points_xy: jax.Array,      # (L, 2) landmark ground-plane positions (world)
    info: jax.Array,           # (L,) per-landmark information
    valid: jax.Array,          # (L,) bool
    pose_xy: jax.Array,        # (F, 2) candidate poses
    target_xy: jax.Array,      # (F, 2) frontiers the poses look toward
    fov_half_angle: float = 0.52,
    max_range: float = 14.0,
) -> jax.Array:
    """Sum of landmark information inside the 2D FOV triangle from each pose
    toward its frontier (computeInformationFrontierPair,
    FisherInformationHelpers.cpp:125-143 + triangle test hpp:28-45).
    Batched over (F poses x L landmarks)."""
    d = target_xy - pose_xy                              # (F, 2)
    heading = jnp.arctan2(d[:, 1], d[:, 0])              # (F,)
    rel = points_xy[None, :, :] - pose_xy[:, None, :]    # (F, L, 2)
    rng = jnp.linalg.norm(rel, axis=-1)
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    dang = jnp.abs(jnp.mod(ang - heading[:, None] + jnp.pi, 2 * jnp.pi) - jnp.pi)
    inside = (dang < fov_half_angle) & (rng < max_range) & valid[None, :]
    return jnp.sum(jnp.where(inside, info[None, :], 0.0), axis=-1)


@vjit(static_argnames=("num_waypoints",))
def path_information(
    points_xy: jax.Array,      # (L, 2) landmark ground-plane positions (world)
    info: jax.Array,           # (L,) per-landmark information
    valid: jax.Array,          # (L,) bool
    robot_xy: jax.Array,       # (2,)
    goal_xy: jax.Array,        # (F, 2) candidate frontier goals
    goal_valid: jax.Array,     # (F,) bool
    num_waypoints: int = 6,
    fov_half_angle: float = 0.52,
    max_range: float = 14.0,
) -> jax.Array:
    """Per-frontier `fisher_information_in_path`: mean FOV-triangle landmark
    information over waypoints along the robot->frontier segment, each
    waypoint looking toward the next.

    Reference: the path-FI accumulation in setPlanForFrontier — every ~10th
    path cell computes computeInformationForPose toward the next waypoint and
    the sum is normalized by waypoint count (CostCalculator.cpp:330-389,
    `Frontier::setFisherInformation`). The dense grid plan is replaced by a
    fixed number of straight-segment waypoints so the whole (F x S x L)
    evaluation is one batched kernel."""
    F = goal_xy.shape[0]
    ts = jnp.linspace(0.0, 1.0, num_waypoints)
    wp = robot_xy[None, None, :] + ts[None, :, None] * (
        goal_xy[:, None, :] - robot_xy[None, None, :]
    )                                                    # (F, S, 2)
    pose = wp[:, :-1, :].reshape(-1, 2)
    tgt = wp[:, 1:, :].reshape(-1, 2)
    seg = frontier_pair_information(
        points_xy, info, valid, pose, tgt,
        fov_half_angle=fov_half_angle, max_range=max_range,
    ).reshape(F, num_waypoints - 1)
    return jnp.where(goal_valid, jnp.mean(seg, axis=1), 0.0)


def generate_lookup_table(
    x_range: Tuple[float, float] = (0.0, 21.0),
    yz_half: float = 14.722,   # 8.5 * sqrt(3)
    step: float = 0.3,
    noise_var: float = 0.01,
):
    """Offline voxel-grid information table (gen_fi_lookup equivalent,
    GenerateLookupMain.cpp:5-17 / FisherInfoManager.cpp:117-229).

    Returns (grid values (Nx, Ny, Nz) float32, axes). Kept for parity tests
    and for callers that want a precomputed table; the runtime path computes
    the closed form directly instead of 24 MB of hash lookups.
    """
    xs = jnp.arange(x_range[0], x_range[1] + step / 2, step)
    ys = jnp.arange(-yz_half, yz_half + step / 2, step)
    zs = jnp.arange(-yz_half, yz_half + step / 2, step)
    X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    # reference sweeps x forward (optical axis z in our convention)
    pts = jnp.stack([Y, Z, X], axis=-1).reshape(-1, 3)
    vals = point_information_local(pts, noise_var).reshape(X.shape)
    return vals, (xs, ys, zs)


_LOOKUP_MAGIC = 0x46495431  # "FIT1"


def save_lookup_table(path: str, vals, axes) -> None:
    """Write the table as a binary .dat (gen_fi_lookup equivalent,
    FisherInfoManager.cpp:117-229): header {magic, dims, axis ranges, step}
    + float32 grid. The dense grid replaces the reference's ~1.5 M
    <LookupKey,float> hash pairs."""
    import numpy as np

    vals = np.asarray(vals, np.float32)
    xs, ys, zs = (np.asarray(a, np.float32) for a in axes)
    with open(path, "wb") as f:
        np.array([_LOOKUP_MAGIC, *vals.shape], np.int32).tofile(f)
        np.array(
            [xs[0], xs[-1], ys[0], ys[-1], zs[0], zs[-1],
             xs[1] - xs[0] if len(xs) > 1 else 1.0],
            np.float32,
        ).tofile(f)
        vals.tofile(f)


def load_lookup_table(path: str):
    """Read a table written by save_lookup_table and print reference-style
    stats (entry count, min/max/mean/var, load ms —
    FisherInfoManager.cpp:231-262). Returns (vals (Nx,Ny,Nz) jnp, axes)."""
    import time

    import numpy as np

    t0 = time.perf_counter()
    with open(path, "rb") as f:
        head = np.fromfile(f, np.int32, 4)
        if head[0] != _LOOKUP_MAGIC:
            raise ValueError(f"{path}: not a FIM lookup table")
        nx, ny, nz = (int(v) for v in head[1:])
        rng = np.fromfile(f, np.float32, 7)
        vals = np.fromfile(f, np.float32, nx * ny * nz).reshape(nx, ny, nz)
    xs = np.linspace(rng[0], rng[1], nx, dtype=np.float32)
    ys = np.linspace(rng[2], rng[3], ny, dtype=np.float32)
    zs = np.linspace(rng[4], rng[5], nz, dtype=np.float32)
    ms = (time.perf_counter() - t0) * 1e3
    from fitslam_tpu.utils import logging as logx

    logx.info(
        f"FIM lookup: {vals.size} entries, "
        f"min {vals.min():.3g} max {vals.max():.3g} "
        f"mean {vals.mean():.3g} var {vals.var():.3g}, loaded in {ms:.1f} ms"
    )
    return jnp.asarray(vals), (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs))


@vjit
def lookup_information(
    table: jax.Array,          # (Nx, Ny, Nz) float32 grid
    axes_min: jax.Array,       # (3,) first sample of each axis
    axes_step: jax.Array,      # (3,) axis spacing
    p_c: jax.Array,            # (..., 3) camera-frame points
) -> jax.Array:
    """Device-resident table evaluation (nearest-voxel gather) — the
    lookup-table runtime path of the reference (FisherInfoManager.cpp:287-324)
    as one batched gather on a dense 3D texture. Points outside the table
    return 0 (the reference's hash-miss behavior)."""
    # table axes are (forward, y, z) in the reference's sweep order: forward
    # = our optical z, table (y, z) = our camera (x, y)
    coords = jnp.stack([p_c[..., 2], p_c[..., 0], p_c[..., 1]], axis=-1)
    idx_f = (coords - axes_min) / axes_step
    idx = jnp.round(idx_f).astype(jnp.int32)
    dims = jnp.asarray(table.shape, jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < dims), axis=-1)
    idx = jnp.clip(idx, 0, dims - 1)
    vals = table[idx[..., 0], idx[..., 1], idx[..., 2]]
    return jnp.where(inb, vals, 0.0)
