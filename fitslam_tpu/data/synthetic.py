"""Procedural worlds and sequences.

Replaces the reference's Gazebo marsyard / indoor-corridor worlds
(README.md:12, SURVEY.md §4.5) as the test/bench environment: a deterministic
landmark field + camera trajectory generator, a sparse-feature "renderer"
(projected landmarks with noise — the fake SLAM backend analog of
`get_landmarks_simulator`), and a dense textured renderer for exercising the
image-level ORB frontend.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics, project_stereo


class World(NamedTuple):
    landmarks: jax.Array   # (L, 3) world points
    terrain_fn: object = None


def make_landmark_field(
    key, num: int, extent_xy: float = 30.0, z_range: Tuple[float, float] = (0.0, 2.5)
) -> World:
    """Uniform landmark cloud in a box — corridor/field scene stand-in."""
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (num, 2), minval=-extent_xy, maxval=extent_xy)
    z = jax.random.uniform(k2, (num, 1), minval=z_range[0], maxval=z_range[1])
    return World(jnp.concatenate([xy, z], axis=-1))


def corridor_world(key, num: int = 4096, length: float = 40.0, width: float = 4.0) -> World:
    """Landmarks on the two walls of a corridor along +x (indoor sequence)."""
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (num,), minval=0.0, maxval=length)
    side = jnp.where(jax.random.bernoulli(k2, 0.5, (num,)), 1.0, -1.0)
    y = side * width / 2 + 0.05 * jax.random.normal(k3, (num,))
    z = jax.random.uniform(jax.random.fold_in(key, 7), (num,), minval=0.0, maxval=2.5)
    return World(jnp.stack([x, y, z], axis=-1))


def ring_world(key, num: int = 6000, radius: float = 12.0, width: float = 5.0) -> World:
    """Landmarks on the two walls of a ring corridor (the marsyard-like loop
    sequence of BASELINE config 2): camera driving the ring sees both walls
    ahead, and the loop trajectory revisits its start."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ang = jax.random.uniform(k1, (num,), minval=0.0, maxval=2.0 * math.pi)
    side = jnp.where(jax.random.bernoulli(k2, 0.5, (num,)), 1.0, -1.0)
    r = radius + side * width / 2 + 0.05 * jax.random.normal(k3, (num,))
    z = jax.random.uniform(k4, (num,), minval=0.0, maxval=2.5)
    return World(jnp.stack([r * jnp.cos(ang), r * jnp.sin(ang), z], axis=-1))


def loop_trajectory(num_frames: int, radius: float = 12.0, height: float = 1.2) -> lie.SE3:
    """Camera going around a circle, facing tangentially — closes a loop.

    Returns world-from-camera poses (T_wc) with camera +z forward, +x right,
    +y down (optical convention).
    """
    s = jnp.linspace(0.0, 2.0 * math.pi, num_frames)
    cx = radius * jnp.cos(s)
    cy = radius * jnp.sin(s)
    cz = jnp.full_like(s, height)
    yaw = s + math.pi / 2  # tangent direction
    # Build R_wc: camera z-axis = forward (cos yaw, sin yaw, 0),
    # camera x-axis = right, camera y-axis = down.
    fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw), jnp.zeros_like(yaw)], axis=-1)
    down = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), fwd.shape)  # world -z is "down" for y-down cam? see below
    # camera y (down in image) maps to world -z (ground) => y_w = (0,0,-1)
    right = jnp.cross(down, fwd)
    R_wc = jnp.stack([right, down, fwd], axis=-1)  # columns are camera axes in world
    t_wc = jnp.stack([cx, cy, cz], axis=-1)
    return lie.SE3(R_wc, t_wc)


def straight_trajectory(num_frames: int, length: float = 30.0, height: float = 1.2,
                        start_x: float = 2.0) -> lie.SE3:
    """Camera moving along +x looking forward (corridor sequence)."""
    x = jnp.linspace(start_x, start_x + length, num_frames)
    t_wc = jnp.stack([x, jnp.zeros_like(x), jnp.full_like(x, height)], axis=-1)
    fwd = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), t_wc.shape)
    down = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), t_wc.shape)
    right = jnp.cross(down, fwd)
    R_wc = jnp.stack([right, down, fwd], axis=-1)
    return lie.SE3(R_wc, t_wc)


class SparseFrame(NamedTuple):
    """Ground-truth-projected landmark observations for one frame."""

    uvr: jax.Array       # (M, 3) [u, v, u_r] noisy pixel observations
    lm_id: jax.Array     # (M,) int32 landmark index (ground truth association)
    valid: jax.Array     # (M,) bool


def render_sparse(
    K: Intrinsics,
    world: World,
    T_wc: lie.SE3,
    key,
    max_obs: int,
    noise_px: float = 0.5,
    width: int = 640,
    height: int = 480,
    max_depth: float = 14.0,
) -> SparseFrame:
    """Project all landmarks into the camera; keep up to max_obs visible ones.

    Deterministic given key; the fixed-capacity output is filled by top-k on
    visibility (closest first) with a validity mask.
    """
    T_cw = lie.inverse(T_wc)
    p_c = lie.apply(T_cw, world.landmarks)
    uvr, z_ok = project_stereo(K, p_c)
    u, v = uvr[..., 0], uvr[..., 1]
    vis = (
        z_ok
        & (p_c[..., 2] < max_depth)
        & (u >= 1) & (u < width - 1)
        & (v >= 1) & (v < height - 1)
        & (uvr[..., 2] >= 1)
    )
    score = jnp.where(vis, -p_c[..., 2], -jnp.inf)  # prefer close landmarks
    _, idx = jax.lax.top_k(score, max_obs)
    sel_valid = vis[idx]
    noise = noise_px * jax.random.normal(key, (max_obs, 3))
    noise = noise.at[:, 2].set(noise[:, 2] * 0.5 + noise[:, 0])  # u_r correlated with u
    obs = uvr[idx] + noise
    return SparseFrame(obs, idx.astype(jnp.int32), sel_valid)


# ---------------------------------------------------------------------------
# Dense textured renderer (for the ORB image frontend)
# ---------------------------------------------------------------------------


def render_dense(
    K: Intrinsics,
    world: World,
    T_wc: lie.SE3,
    width: int = 640,
    height: int = 480,
    splat_sigma: float = 1.5,
    max_depth: float = 25.0,
) -> Tuple[jax.Array, jax.Array]:
    """Render (left, right) grayscale images: landmarks splatted as Gaussian
    blobs with per-landmark deterministic intensity. Crude but featureful —
    corners appear at blob boundaries and track consistently across frames.
    """
    def render_one(T_cam: lie.SE3):
        p_c = lie.apply(lie.inverse(T_cam), world.landmarks)
        uvr, z_ok = project_stereo(K, p_c)
        vis = z_ok & (p_c[..., 2] < max_depth)
        u, v = uvr[..., 0], uvr[..., 1]
        idx = jnp.arange(world.landmarks.shape[0])
        lum = 60.0 + 195.0 * _hash01(idx)
        # per-landmark blob width: BRIEF-style descriptors compare pixel
        # pairs, so a radially symmetric blob of fixed size is amplitude-
        # blind — size variation is what makes points distinguishable
        sig = splat_sigma * (0.6 + 1.4 * _hash01(idx + 77777))
        img = _splat(u, v, jnp.where(vis, lum, 0.0), height, width, sig)
        return img

    left = render_one(T_wc)
    # right camera: offset by +baseline along camera x-axis
    t_right = T_wc.t + T_wc.R[..., :, 0] * K.baseline
    right = render_one(lie.SE3(T_wc.R, t_right))
    return left, right


def _hash01(i: jax.Array) -> jax.Array:
    x = (i.astype(jnp.uint32) * jnp.uint32(2654435761)) ^ jnp.uint32(0x9E3779B9)
    x = x ^ (x >> 16)
    return (x & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0


def _splat(u, v, lum, height, width, sigma):
    """Scatter-add Gaussian blobs: rasterize a small stamp per landmark.
    `sigma` may be a scalar or a per-landmark (L,) array."""
    R = 3
    iu = jnp.round(u).astype(jnp.int32)
    iv = jnp.round(v).astype(jnp.int32)
    img = jnp.zeros((height, width), jnp.float32)
    offs = jnp.arange(-R, R + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    sig = jnp.asarray(sigma)
    sig = sig[:, None, None] if sig.ndim == 1 else sig
    w = jnp.exp(-(dx**2 + dy**2) / (2 * sig * sig))  # (7, 7) or (L, 7, 7)
    w = jnp.broadcast_to(w, (u.shape[0], 2 * R + 1, 2 * R + 1))
    rows = iv[:, None, None] + dy[None]
    cols = iu[:, None, None] + dx[None]
    vals = lum[:, None, None] * w
    inb = (rows >= 0) & (rows < height) & (cols >= 0) & (cols < width)
    flat = jnp.where(inb, rows * width + cols, height * width)
    img = jnp.zeros((height * width + 1,), jnp.float32).at[flat.reshape(-1)].add(
        jnp.where(inb, vals, 0.0).reshape(-1), mode="drop"
    )[: height * width]
    return jnp.clip(img.reshape(height, width), 0.0, 255.0)


# ---------------------------------------------------------------------------
# Marsyard heightfield world (rough-terrain rover scenario)
# ---------------------------------------------------------------------------


class MarsyardWorld(NamedTuple):
    """Heightfield terrain world (the marsyard scenario of the reference,
    README.md:3-12): a rover must route around slope-lethal ridge flanks and
    roughness-lethal boulder fields, through a safe corridor.

    `world` feeds the visual frontend and frustum clouds; `height_fn` is the
    analytic terrain height; `gt_lethal` is the ground-truth untraversable
    cell mask under the traversabilityParams.yaml:8-16 semantics (max_slope
    0.7, ground_clearance-scaled roughness)."""

    world: World
    gt_lethal: np.ndarray       # (G, G) bool
    gt_height: np.ndarray      # (G, G) float cell-mean height
    ridge_x: float
    corridor_y: float


def _marsyard_height(x, y, rocks_xyhr):
    """Analytic terrain height (numpy, broadcasts): gentle undulation + a
    ridge wall along x=ridge_x with a flat corridor gap at y~corridor_y +
    boulder clusters."""
    base = 0.12 * np.sin(0.45 * x) * np.cos(0.35 * y)
    # ridge: steep gaussian wall crossing the arena, gap near y=0
    ridge = 1.8 * np.exp(-((x - 1.0) / 1.1) ** 2)
    gap = 1.0 - np.exp(-(y / 1.8) ** 2)
    h = base + ridge * gap
    # boulders: tall narrow bumps (slope- and roughness-lethal)
    for (rx, ry, rh, rr) in rocks_xyhr:
        d2 = (x - rx) ** 2 + (y - ry) ** 2
        h = h + rh * np.exp(-d2 / (rr * rr))
    return h


def marsyard_world(
    spec,                       # GridSpec2D
    seed: int = 0,
    points_per_cell: int = 12,
    max_slope: float = 0.7,
    ground_clearance: float = 0.17,
    robot_height: float = 1.5,
    lethal_threshold: int = 55,
) -> MarsyardWorld:
    """Procedural marsyard: heightfield surface sampled into a dense point
    world (visual features + traversability clouds) + ground-truth lethal
    classification for assertions.

    The ridge flanks exceed `max_slope` (lethal by slope), the boulder
    clusters exceed the roughness bound (lethal by roughness/step), and the
    corridor at y~0 stays traversable — reference scenario parameters from
    traversabilityParams.yaml:8-16."""
    rng = np.random.RandomState(seed)
    G = spec.size
    ext = spec.extent

    # boulder clusters on the rover's side of the ridge
    rocks = []
    for (cx, cy) in [(-3.5, 3.5), (-4.0, -3.8)]:
        for _ in range(10):
            rocks.append((
                cx + rng.uniform(-1.2, 1.2),
                cy + rng.uniform(-1.2, 1.2),
                rng.uniform(0.6, 1.0),      # height
                rng.uniform(0.14, 0.22),    # radius
            ))

    # dense surface sampling: points_per_cell uniform samples per grid cell
    n_pts = G * G * points_per_cell
    xs = spec.origin_x + rng.uniform(0.0, ext, n_pts)
    ys = spec.origin_y + rng.uniform(0.0, ext, n_pts)
    zs = _marsyard_height(xs, ys, rocks)
    pts = np.stack([xs, ys, zs], axis=-1).astype(np.float32)

    # ground-truth per-cell classification with the SAME semantics the fused
    # grid applies (ops/grid.stats_to_grid + threshold_grid at
    # lethal_threshold): cost01 = max(slope/max_slope, rough/clearance,
    # step/robot_height), untraversable where round(cost01*200) >= threshold
    ci = np.clip(((xs - spec.origin_x) / spec.resolution).astype(int), 0, G - 1)
    cj = np.clip(((ys - spec.origin_y) / spec.resolution).astype(int), 0, G - 1)
    flat = cj * G + ci
    cnt = np.bincount(flat, minlength=G * G).astype(np.float64)
    s_z = np.bincount(flat, weights=zs, minlength=G * G)
    s_z2 = np.bincount(flat, weights=zs * zs, minlength=G * G)
    mean_z = (s_z / np.maximum(cnt, 1.0)).reshape(G, G)
    var_z = (s_z2 / np.maximum(cnt, 1.0)).reshape(G, G) - mean_z ** 2
    rough = np.sqrt(np.maximum(var_z, 0.0))
    z_mx = np.full(G * G, -np.inf)
    np.fmax.at(z_mx, flat, zs)
    z_mn = np.full(G * G, np.inf)
    np.fmin.at(z_mn, flat, zs)
    step = np.where(cnt > 0, z_mx - z_mn, 0.0).reshape(G, G)
    gy, gx = np.gradient(mean_z, spec.resolution)
    slope = np.sqrt(gx * gx + gy * gy)
    cost01 = np.maximum.reduce([
        np.clip(slope / max_slope, 0.0, 1.0),
        np.clip(rough / ground_clearance, 0.0, 1.0),
        np.clip(step / robot_height, 0.0, 1.0),
    ])
    hard = (slope > max_slope) | (step > robot_height * 0.5) | (
        rough > 2.0 * ground_clearance)
    gt_lethal = (np.round(cost01 * 200.0) >= lethal_threshold) | hard

    return MarsyardWorld(
        world=World(jnp.asarray(pts)),
        gt_lethal=gt_lethal,
        gt_height=mean_z,
        ridge_x=1.0,
        corridor_y=0.0,
    )


def marsyard_surface_z(x: float, y: float, mw: MarsyardWorld, spec) -> float:
    """Terrain height under (x, y) from the ground-truth cell means (host
    helper for placing the rover's camera on the surface)."""
    G = spec.size
    ci = int(np.clip((x - spec.origin_x) / spec.resolution, 0, G - 1))
    cj = int(np.clip((y - spec.origin_y) / spec.resolution, 0, G - 1))
    return float(mw.gt_height[cj, ci])


# ---------------------------------------------------------------------------
# 3D worlds derived from occupancy grids (active-SLAM simulation)
# ---------------------------------------------------------------------------


def world_from_occupancy(
    occ: np.ndarray,           # (G, G) uint8 ground-truth grid {0 free, 254 wall}
    spec,                      # GridSpec2D
    key,
    wall_height: float = 2.0,
    points_per_wall_cell: int = 6,
    floor_points: int = 3000,
) -> World:
    """Build a 3D landmark world from a 2D grid: textured wall surfaces at
    lethal cells + textured floor. Serves both the visual frontend (rendered
    blobs / sparse features) and traversability (frustum clouds)."""
    import numpy as _np

    rng = _np.random.RandomState(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    wall_cells = _np.argwhere(_np.asarray(occ) >= 200)  # (W, 2) as (row, col)
    pts = []
    if len(wall_cells):
        reps = _np.repeat(wall_cells, points_per_wall_cell, axis=0)
        jitter = rng.uniform(0, 1, (len(reps), 2))
        xy = _np.stack(
            [
                (reps[:, 1] + jitter[:, 0]) * spec.resolution + spec.origin_x,
                (reps[:, 0] + jitter[:, 1]) * spec.resolution + spec.origin_y,
            ],
            axis=-1,
        )
        z = rng.uniform(0.0, wall_height, (len(reps), 1))
        pts.append(_np.concatenate([xy, z], axis=-1))
    # floor texture points on free cells
    free_cells = _np.argwhere(_np.asarray(occ) < 200)
    sel = free_cells[rng.randint(0, len(free_cells), floor_points)]
    jitter = rng.uniform(0, 1, (floor_points, 2))
    xy = _np.stack(
        [
            (sel[:, 1] + jitter[:, 0]) * spec.resolution + spec.origin_x,
            (sel[:, 0] + jitter[:, 1]) * spec.resolution + spec.origin_y,
        ],
        axis=-1,
    )
    z = _np.abs(rng.normal(0.0, 0.02, (floor_points, 1)))
    pts.append(_np.concatenate([xy, z], axis=-1))
    return World(jnp.asarray(_np.concatenate(pts, axis=0), jnp.float32))


def frustum_cloud(
    K: Intrinsics,
    world: World,
    T_wc: lie.SE3,
    max_points: int,
    max_depth: float = 10.0,
    width: int = 640,
    height: int = 480,
) -> Tuple[jax.Array, jax.Array]:
    """Camera-frame point cloud of world points inside the view frustum —
    the slam_keyframe_pcl_simulator equivalent (SURVEY.md §2.1 S6): the
    per-keyframe cloud source for traversability without a depth sensor.
    Returns ((max_points, 3) camera-frame points, (max_points,) mask)."""
    T_cw = lie.inverse(T_wc)
    p_c = lie.apply(T_cw, world.landmarks)
    z = p_c[..., 2]
    z_ok = z > 0.2
    zs = jnp.where(z_ok, z, 1.0)
    u = K.fx * p_c[..., 0] / zs + K.cx
    v = K.fy * p_c[..., 1] / zs + K.cy
    vis = z_ok & (z < max_depth) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    score = jnp.where(vis, -z, -jnp.inf)
    # worlds may carry fewer points than the cloud capacity: select what
    # exists and pad the rest as invalid
    k = min(max_points, score.shape[0])
    _, idx = jax.lax.top_k(score, k)
    pts = p_c[idx]
    mask = vis[idx]
    if k < max_points:
        pad = max_points - k
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], axis=0)
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)], axis=0)
    return pts, mask


# Capture-free jitted renderer: every tensor (landmarks, intrinsics fields,
# pose) is an argument — jit-captured device constants degrade the whole
# process on this TPU backend (see utils/jit.py).
from fitslam_tpu.utils.jit import vjit as _vjit


@_vjit(static_argnames=("width", "height", "splat_sigma", "max_depth"))
def _render_dense_args(landmarks, fx, fy, cx, cy, baseline, R, t,
                       width, height, splat_sigma, max_depth):
    K = Intrinsics(fx, fy, cx, cy, baseline)
    return render_dense(K, World(landmarks), lie.SE3(R, t), width=width,
                        height=height, splat_sigma=splat_sigma,
                        max_depth=max_depth)


def render_stereo(K: Intrinsics, world: World, T_wc: lie.SE3,
                  width: int = 640, height: int = 480,
                  splat_sigma: float = 1.2, max_depth: float = 18.0):
    """Jitted stereo rendering with no captured device arrays."""
    return _render_dense_args(world.landmarks, K.fx, K.fy, K.cx, K.cy,
                              K.baseline, T_wc.R, T_wc.t,
                              width, height, splat_sigma, max_depth)


@_vjit(static_argnames=("width", "height", "splat_sigma", "max_depth"))
def _render_rgbd_args(landmarks, fx, fy, cx, cy, baseline, R, t,
                      width, height, splat_sigma, max_depth):
    K = Intrinsics(fx, fy, cx, cy, baseline)
    world = World(landmarks)
    T_wc = lie.SE3(R, t)
    left, _ = render_dense(K, world, T_wc, width=width, height=height,
                           splat_sigma=splat_sigma, max_depth=max_depth)
    p_c = lie.apply(lie.inverse(T_wc), world.landmarks)
    uvr, z_ok = project_stereo(K, p_c)
    vis = z_ok & (p_c[..., 2] < max_depth)
    depth = _splat_depth(uvr[..., 0], uvr[..., 1],
                         jnp.where(vis, p_c[..., 2], jnp.inf), height, width)
    return left, depth


def render_rgbd(K: Intrinsics, world: World, T_wc: lie.SE3,
                width: int = 640, height: int = 480,
                splat_sigma: float = 1.2, max_depth: float = 18.0):
    """RGB-D sensor model: intensity image + registered depth image
    (z-buffered point splats; 0 = no return). The depth camera analog of the
    reference's RGB-D input (orb_slam3 rgbd.launch.py)."""
    return _render_rgbd_args(world.landmarks, K.fx, K.fy, K.cx, K.cy,
                             K.baseline, T_wc.R, T_wc.t,
                             width, height, splat_sigma, max_depth)


def _splat_depth(u, v, z, height, width):
    """Scatter-min z over a small stamp per landmark (z-buffer)."""
    R = 2
    iu = jnp.round(u).astype(jnp.int32)
    iv = jnp.round(v).astype(jnp.int32)
    offs = jnp.arange(-R, R + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    rows = iv[:, None, None] + dy[None]
    cols = iu[:, None, None] + dx[None]
    inb = (rows >= 0) & (rows < height) & (cols >= 0) & (cols < width)
    flat = jnp.where(inb, rows * width + cols, height * width)
    vals = jnp.broadcast_to(z[:, None, None], flat.shape)
    zbuf = jnp.full((height * width + 1,), jnp.inf).at[flat.reshape(-1)].min(
        jnp.where(inb, vals, jnp.inf).reshape(-1), mode="drop"
    )[: height * width]
    zbuf = zbuf.reshape(height, width)
    return jnp.where(jnp.isfinite(zbuf), zbuf, 0.0)
