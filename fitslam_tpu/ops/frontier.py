"""Frontier detection and clustering as dense grid kernels.

Reference: FrontierSearch (SURVEY.md §2.3 E3, FrontierSearch.cpp:218-249):
a frontier cell is an unknown cell with >= 1 free 4-neighbor and no lethal
neighbor, searched within a radius of the robot (radius grows on failure —
host logic); clusters grow over the 8-neighborhood and split at
`max_frontier_cluster_size`; the goal point is a representative interior
cell of each cluster.

TPU formulation: the cell predicate is a stencil over rolled occupancy
planes; clustering is iterated 8-neighbor min-label propagation (a
logarithmic-depth connected-components sweep); cluster accounting (split,
size, centroid, medoid goal) is one sort + segmented reductions over a
fixed-capacity frontier-cell list. No BFS queues, no per-cell host loops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit

from fitslam_tpu.ops.grid import FREE, LETHAL, UNKNOWN, GridSpec2D

_INF = 2**30  # python int literal (no captured device scalar)


class Frontiers(NamedTuple):
    """Fixed-capacity frontier set (the Frontier data model, SURVEY.md §2.3 E4)."""

    uid: jax.Array          # (F,) int32 hash of goal cell
    goal_xy: jax.Array      # (F, 2) float32 world coords of goal point
    centroid_xy: jax.Array  # (F, 2) float32
    size: jax.Array         # (F,) int32 cells in cluster
    valid: jax.Array        # (F,) bool


def _shift(a, dy, dx, fill):
    out = jnp.roll(a, (dy, dx), axis=(0, 1))
    if dy > 0:
        out = out.at[:dy, :].set(fill)
    elif dy < 0:
        out = out.at[dy:, :].set(fill)
    if dx > 0:
        out = out.at[:, :dx].set(fill)
    elif dx < 0:
        out = out.at[:, dx:].set(fill)
    return out


N4 = ((1, 0), (-1, 0), (0, 1), (0, -1))
N8 = N4 + ((1, 1), (1, -1), (-1, 1), (-1, -1))


@vjit(static_argnames=("lethal_threshold",))
def frontier_mask(
    occ: jax.Array,            # (G, G) uint8 occupancy {0 free, 254 lethal, 255 unknown}
    robot_cell: jax.Array,     # (2,) int32 (x, y)
    radius_cells: jax.Array,   # () float32 search radius
    lethal_threshold: int = 254,
) -> jax.Array:
    """Boolean frontier-cell mask within the search radius."""
    occ_i = occ.astype(jnp.int32)
    unknown = occ_i == UNKNOWN
    free = occ_i < lethal_threshold  # known and traversable
    known = occ_i != UNKNOWN
    lethal = known & (occ_i >= lethal_threshold)

    free4 = jnp.zeros_like(unknown)
    for dy, dx in N4:
        free4 = free4 | _shift(free & known, dy, dx, False)
    lethal8 = jnp.zeros_like(unknown)
    for dy, dx in N8:
        lethal8 = lethal8 | _shift(lethal, dy, dx, False)

    G = occ.shape[0]
    yy = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    d2 = (xx - robot_cell[0]) ** 2 + (yy - robot_cell[1]) ** 2
    within = d2.astype(jnp.float32) <= radius_cells * radius_cells

    return unknown & free4 & jnp.logical_not(lethal8) & within


@vjit(static_argnames=("spec",))
def polygon_mask(spec: GridSpec2D, verts: jax.Array) -> jax.Array:
    """(G, G) bool mask of cells inside a world-frame polygon.

    Boundary-polygon support (reference UpdateBoundaryPolygon ->
    CostAssigner::updateBoundaryPolygon, CostAssigner.cpp:121-167): the
    exploration area is clipped to a user polygon. Even-odd rule evaluated
    for every cell center at once — one (V, G, G) broadcast instead of a
    per-cell host test. verts: (V, 2) world coords, V >= 3.
    """
    G = spec.size
    yy = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    px = (xx.astype(jnp.float32) + 0.5) * spec.resolution + spec.origin_x
    py = (yy.astype(jnp.float32) + 0.5) * spec.resolution + spec.origin_y
    a = verts                        # (V, 2) edge starts
    b = jnp.roll(verts, -1, axis=0)  # (V, 2) edge ends
    ay, by = a[:, 1, None, None], b[:, 1, None, None]
    ax, bx = a[:, 0, None, None], b[:, 0, None, None]
    straddles = (ay > py[None]) != (by > py[None])
    t = (py[None] - ay) / jnp.where(jnp.abs(by - ay) < 1e-12, 1e-12, by - ay)
    x_cross = ax + t * (bx - ax)
    hits = straddles & (px[None] < x_cross)
    return (jnp.sum(hits.astype(jnp.int32), axis=0) % 2) == 1


@vjit(static_argnames=("iters",))
def propagate_labels(mask: jax.Array, iters: int = 64) -> jax.Array:
    """8-connected min-label propagation; labels are flat indices (INF off-mask).

    `iters` bounds the cluster diameter that merges fully; frontier clusters
    are small (split at ~20 cells anyway) so modest iters converge.
    """
    G = mask.shape[0]
    yy = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    lbl0 = jnp.where(mask, yy * G + xx, _INF)

    def body(_, lbl):
        m = lbl
        for dy, dx in N8:
            m = jnp.minimum(m, _shift(lbl, dy, dx, _INF))
        return jnp.where(mask, jnp.minimum(lbl, m), _INF)

    return jax.lax.fori_loop(0, iters, body, lbl0)


@vjit(static_argnames=("spec", "max_cells", "max_frontiers", "max_cluster_size", "min_cluster_size", "cc_iters"))
def extract_frontiers(
    spec: GridSpec2D,
    occ: jax.Array,
    robot_xy: jax.Array,       # (2,) world
    radius_m: jax.Array,       # () float32
    max_cells: int = 4096,
    max_frontiers: int = 128,
    max_cluster_size: int = 20,
    min_cluster_size: int = 1,
    cc_iters: int = 64,
    boundary: jax.Array = None,   # optional (G, G) bool exploration boundary
) -> Frontiers:
    """Full frontier pipeline: mask -> clusters -> split -> goals."""
    G = spec.size
    robot_cell, _ = spec.world_to_cell(robot_xy)
    mask = frontier_mask(occ, robot_cell, radius_m / spec.resolution)
    if boundary is not None:
        # clip to the boundary polygon (UpdateBoundaryPolygon, §2.3 E7)
        mask = mask & boundary
    lbl = propagate_labels(mask, cc_iters)

    # fixed-capacity frontier cell list
    flat_mask = mask.reshape(-1)
    idx = jnp.nonzero(flat_mask, size=max_cells, fill_value=G * G)[0]
    cell_ok = idx < G * G
    lbls = jnp.where(cell_ok, lbl.reshape(-1).at[jnp.minimum(idx, G * G - 1)].get(), _INF)

    # sort cells by label; stable sort keeps flat-index order within a label,
    # and invalid (INF) cells sink to the end
    order = jnp.argsort(lbls, stable=True)
    lbls_s = lbls[order]
    idx_s = idx[order]
    ok_s = cell_ok[order]

    # rank within cluster, split at max_cluster_size
    new_cluster = jnp.concatenate([jnp.array([True]), lbls_s[1:] != lbls_s[:-1]])
    # position within label-cluster
    seg_start = jnp.where(new_cluster, jnp.arange(max_cells), 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = jnp.arange(max_cells) - seg_start
    sub_boundary = new_cluster | ((rank % max_cluster_size) == 0)
    slot = jnp.cumsum(sub_boundary.astype(jnp.int32)) - 1
    slot = jnp.where(ok_s, slot, max_frontiers)  # invalid cells -> dropped bucket

    # per-slot stats via segment ops
    nseg = max_frontiers + 1
    xy_cells = jnp.stack([idx_s % G, idx_s // G], axis=-1).astype(jnp.float32)
    ones = ok_s.astype(jnp.float32)
    size = jax.ops.segment_sum(ones, slot, num_segments=nseg)
    cx = jax.ops.segment_sum(xy_cells[:, 0] * ones, slot, num_segments=nseg)
    cy = jax.ops.segment_sum(xy_cells[:, 1] * ones, slot, num_segments=nseg)
    centroid = jnp.stack(
        [cx / jnp.maximum(size, 1.0), cy / jnp.maximum(size, 1.0)], axis=-1
    )  # (nseg, 2) cell coords

    # medoid goal: cluster cell closest to the centroid
    d2 = jnp.sum((xy_cells - centroid[slot]) ** 2, axis=-1)
    d2 = jnp.where(ok_s, d2, jnp.inf)
    best_d2 = jax.ops.segment_min(d2, slot, num_segments=nseg)
    is_best = ok_s & (d2 <= best_d2[slot] + 1e-6)
    # first best cell per slot wins (deterministic)
    first_best = jax.ops.segment_min(
        jnp.where(is_best, jnp.arange(max_cells), max_cells), slot, num_segments=nseg
    )
    has_goal = first_best < max_cells
    goal_cell = xy_cells[jnp.minimum(first_best, max_cells - 1)]

    size_i = size[:max_frontiers].astype(jnp.int32)
    valid = (
        (size_i >= min_cluster_size)
        & has_goal[:max_frontiers]
        & (size_i > 0)
    )
    goal_xy = spec.cell_to_world(goal_cell[:max_frontiers])
    centroid_xy = spec.cell_to_world(centroid[:max_frontiers])
    # uid = hash of goal cell (reference: Frontier.hpp:151-161 hash of x,y)
    gc = goal_cell[:max_frontiers].astype(jnp.int32)
    uid = (gc[:, 0] * jnp.int32(73856093)) ^ (gc[:, 1] * jnp.int32(19349663))
    return Frontiers(
        uid=jnp.where(valid, uid, -1),
        goal_xy=jnp.where(valid[:, None], goal_xy, 0.0),
        centroid_xy=jnp.where(valid[:, None], centroid_xy, 0.0),
        size=jnp.where(valid, size_i, 0),
        valid=valid,
    )


def extract_frontiers_all_cells(
    spec: GridSpec2D,
    occ: jax.Array,
    max_cells: int = 4096,
    max_frontiers: int = 128,
    max_cluster_size: int = 20,
    min_cluster_size: int = 1,
    cc_iters: int = 64,
) -> Frontiers:
    """Full-map frontier sweep with no BFS radius (offline analysis mode —
    reference FrontierSearchAllCells, SURVEY.md §2.3 E18,
    FrontierSearchAllCells.cpp:18-151): the radius-limited pipeline run from
    the grid center with a radius covering every cell."""
    center = jnp.asarray(
        [spec.origin_x + spec.extent / 2.0, spec.origin_y + spec.extent / 2.0],
        jnp.float32,
    )
    return extract_frontiers(
        spec, occ, center, jnp.float32(spec.extent * 2.0),
        max_cells=max_cells, max_frontiers=max_frontiers,
        max_cluster_size=max_cluster_size, min_cluster_size=min_cluster_size,
        cc_iters=cc_iters,
    )
