"""Batched grid raycasting.

Reference hot loops replaced here (SURVEY.md §2.3 E5, §3.2):
- FrontierCostCalculator::setArrivalInformationForFrontier
  (CostCalculator.cpp:23-121): per frontier, 63 Bresenham rays x depth cells
  counting unknown cells, box-filtered over the camera FOV to pick the best
  arrival heading. Here: one (F, R, S) gather + cumulative masks.
- FrontierRoadMap::isConnectable (FrontierRoadmap.cpp:716-737): straight-line
  obstacle/unknown test per candidate edge. Here: (E, S) segment sampling.

All rays are fixed-length with validity masks — no early exit, the masked
tail costs nothing on the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit

from fitslam_tpu.ops.grid import LETHAL, UNKNOWN, GridSpec2D


def _sample_occ(spec: GridSpec2D, occ: jax.Array, xy: jax.Array) -> jax.Array:
    """Gather occupancy at world positions (..., 2); out-of-bounds -> LETHAL."""
    cell, ok = spec.world_to_cell(xy)
    G = spec.size
    flat = jnp.clip(cell[..., 1] * G + cell[..., 0], 0, G * G - 1)
    vals = occ.reshape(-1)[flat]
    return jnp.where(ok, vals, jnp.uint8(LETHAL))


@vjit(static_argnames=("spec", "n_rays", "n_steps", "fov_rad"))
def arrival_information(
    spec: GridSpec2D,
    occ: jax.Array,           # (G, G) occupancy
    points_xy: jax.Array,     # (F, 2) world positions (frontier goals)
    valid: jax.Array,         # (F,) bool
    depth_m: float = 2.0,
    n_rays: int = 64,
    n_steps: int = 16,
    fov_rad: float = 1.04,
) -> Tuple[jax.Array, jax.Array]:
    """360° unknown-counting sweep per point, box-filtered over the camera FOV.

    Returns (best_heading (F,), information (F,)) — the count of unknown
    cells observable in the best FOV-wide arrival direction. Rays stop at
    lethal cells (cumulative block mask).
    """
    F = points_xy.shape[0]
    theta = jnp.arange(n_rays) * (2.0 * jnp.pi / n_rays)
    dirs = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)      # (R, 2)
    step = depth_m / n_steps
    ts = (jnp.arange(n_steps) + 1.0) * step                           # (S,)
    # sample positions: (F, R, S, 2)
    pos = points_xy[:, None, None, :] + dirs[None, :, None, :] * ts[None, None, :, None]
    occ_s = _sample_occ(spec, occ, pos)                               # (F, R, S)

    # lethal (not unknown) blocks the ray from the NEXT step on; unknown cells
    # are what we count and do not block (reference: CostCalculator raycast
    # counts unknown cells until an obstacle)
    lethal = ((occ_s != UNKNOWN) & (occ_s >= LETHAL)).astype(jnp.int32)
    blocked_before = (jnp.cumsum(lethal, axis=-1) - lethal) > 0
    visible_unknown = (occ_s == UNKNOWN) & jnp.logical_not(blocked_before)
    per_ray = jnp.sum(visible_unknown.astype(jnp.float32), axis=-1)   # (F, R)

    # circular box filter of width fov (in rays)
    w = max(1, int(round(fov_rad / (2.0 * jnp.pi / n_rays))))
    idx = (jnp.arange(n_rays)[:, None] + jnp.arange(w)[None, :] - w // 2) % n_rays
    fov_sum = jnp.sum(per_ray[:, idx], axis=-1)                       # (F, R)
    best = jnp.argmax(fov_sum, axis=-1)
    info = jnp.take_along_axis(fov_sum, best[:, None], axis=-1)[:, 0]
    heading = theta[best]
    return jnp.where(valid, heading, 0.0), jnp.where(valid, info, 0.0)


@vjit(static_argnames=("spec", "n_steps"))
def segment_clearance(
    spec: GridSpec2D,
    occ: jax.Array,
    a_xy: jax.Array,          # (E, 2)
    b_xy: jax.Array,          # (E, 2)
    n_steps: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Straight-segment obstacle test (roadmap isConnectable).

    Returns (hits_obstacle (E,) bool, unknown_fraction (E,) float).
    """
    ts = jnp.linspace(0.0, 1.0, n_steps)[None, :, None]
    pos = a_xy[:, None, :] * (1 - ts) + b_xy[:, None, :] * ts      # (E, S, 2)
    occ_s = _sample_occ(spec, occ, pos)
    hit = jnp.any((occ_s != UNKNOWN) & (occ_s >= LETHAL), axis=-1)
    unknown_frac = jnp.mean((occ_s == UNKNOWN).astype(jnp.float32), axis=-1)
    return hit, unknown_frac


@vjit(static_argnames=("spec", "n_steps"))
def free_distance(
    spec: GridSpec2D,
    occ: jax.Array,
    origin_xy: jax.Array,     # (2,)
    dirs: jax.Array,          # (D, 2) unit directions
    max_dist: float = 2.5,
    n_steps: int = 25,
) -> jax.Array:
    """Distance to the first blocking cell along each direction — the recovery
    controller's free-space probe (SURVEY.md §2.3 E14: cells < 253 or == 255
    count as free)."""
    ts = jnp.linspace(max_dist / n_steps, max_dist, n_steps)
    pos = origin_xy[None, None, :] + dirs[:, None, :] * ts[None, :, None]
    occ_s = _sample_occ(spec, occ, pos)
    blocking = (occ_s != UNKNOWN) & (occ_s >= jnp.uint8(253))
    any_block = jnp.any(blocking, axis=-1)
    first = jnp.argmax(blocking, axis=-1)
    return jnp.where(any_block, ts[first] - max_dist / n_steps, max_dist)
