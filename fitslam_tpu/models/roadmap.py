"""Keyframe-anchored exploration roadmap.

Reference capability: FrontierRoadMap (SURVEY.md §2.3 E8, FrontierRoadmap.cpp)
+ its A* (E9, planners/astar.cpp):
- incremental node set over explored space with min-separation dedup via a
  spatial hash (:178-252),
- edges to nodes within 6.1 m whose straight line hits no obstacle and < 30%
  unknown (isConnectable :716-737),
- nodes parented to the nearest SLAM keyframe and stored in that keyframe's
  camera frame, so the whole roadmap deforms with the optimized pose graph
  (mapDataCallback :42-130, optimizeSHM :132-157),
- A* over the graph (:550-635) and line-of-sight path refinement (:657-715).

TPU formulation: fixed-capacity node table + (N, E) nearest-neighbor
adjacency rebuilt as one batched pipeline (pairwise distances -> top-E ->
batched segment raycasts); shortest paths by Bellman-Ford label correction
(a fixed number of gather+min sweeps) which yields distances from a source
to ALL nodes at once — the per-frontier path costs the reference computes
one A* at a time fall out of a single run.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit
from fitslam_tpu.ops import lie, raycast
from fitslam_tpu.ops.grid import GridSpec2D

INF = 1e9


class Roadmap(NamedTuple):
    xy: jax.Array          # (N, 2) world positions
    kf_parent: jax.Array   # (N,) int32 anchor keyframe
    p_kf: jax.Array        # (N, 3) position in anchor-KF camera frame
    valid: jax.Array       # (N,) bool
    is_frontier: jax.Array # (N,) bool (frontier node vs pose node)
    n_nodes: jax.Array     # () int32
    adj: jax.Array         # (N, E) int32 neighbor index (clamped; -1 = none)
    adj_dist: jax.Array    # (N, E) float32 edge length (INF = none)

    @property
    def capacity(self) -> Tuple[int, int]:
        return self.xy.shape[0], self.adj.shape[1]


def empty_roadmap(max_nodes: int, max_edges_per_node: int = 16) -> Roadmap:
    N, E = max_nodes, max_edges_per_node
    return Roadmap(
        xy=jnp.zeros((N, 2), jnp.float32),
        kf_parent=jnp.zeros((N,), jnp.int32),
        p_kf=jnp.zeros((N, 3), jnp.float32),
        valid=jnp.zeros((N,), bool),
        is_frontier=jnp.zeros((N,), bool),
        n_nodes=jnp.int32(0),
        adj=jnp.full((N, E), -1, jnp.int32),
        adj_dist=jnp.full((N, E), INF, jnp.float32),
    )


@vjit
def add_nodes(
    rm: Roadmap,
    cand_xy: jax.Array,        # (M, 2) candidate node positions (world)
    cand_valid: jax.Array,     # (M,) bool
    cand_is_frontier: jax.Array,  # (M,) bool
    kf_T_cw: lie.SE3,          # (K,) keyframe poses (for anchoring)
    n_kf: jax.Array,           # () int32
    min_separation: float = 0.45,
) -> Roadmap:
    """Insert candidates not within min_separation of an existing node (or an
    earlier candidate). Anchors each accepted node to the nearest keyframe."""
    N, _ = rm.capacity
    M = cand_xy.shape[0]

    # dedup vs existing nodes
    d_exist = jnp.linalg.norm(cand_xy[:, None, :] - rm.xy[None, :, :], axis=-1)
    d_exist = jnp.where(rm.valid[None, :], d_exist, INF)
    clash_exist = jnp.min(d_exist, axis=1) < min_separation

    # dedup within the batch (earlier candidate wins)
    d_batch = jnp.linalg.norm(cand_xy[:, None, :] - cand_xy[None, :, :], axis=-1)
    earlier = jnp.arange(M)[None, :] < jnp.arange(M)[:, None]
    clash_batch = jnp.any(
        (d_batch < min_separation) & earlier & cand_valid[None, :], axis=1
    )

    accept = cand_valid & jnp.logical_not(clash_exist) & jnp.logical_not(clash_batch)
    slot = rm.n_nodes + jnp.cumsum(accept.astype(jnp.int32)) - 1
    accept = accept & (slot < N)
    slot_w = jnp.where(accept, slot, N)

    # anchor to nearest keyframe (by camera position)
    kf_xy = lie.inverse(kf_T_cw).t[:, :2]                     # (K, 2)
    kf_ok = jnp.arange(kf_xy.shape[0]) < n_kf
    d_kf = jnp.linalg.norm(cand_xy[:, None, :] - kf_xy[None, :, :], axis=-1)
    d_kf = jnp.where(kf_ok[None, :], d_kf, INF)
    parent = jnp.argmin(d_kf, axis=1).astype(jnp.int32)       # (M,)
    T_parent = lie.SE3(kf_T_cw.R[parent], kf_T_cw.t[parent])
    p_world = jnp.concatenate([cand_xy, jnp.zeros((M, 1))], axis=-1)
    p_kf = (T_parent.R @ p_world[..., None])[..., 0] + T_parent.t

    return rm._replace(
        xy=rm.xy.at[slot_w].set(cand_xy, mode="drop"),
        kf_parent=rm.kf_parent.at[slot_w].set(parent, mode="drop"),
        p_kf=rm.p_kf.at[slot_w].set(p_kf, mode="drop"),
        valid=rm.valid.at[slot_w].set(True, mode="drop"),
        is_frontier=rm.is_frontier.at[slot_w].set(cand_is_frontier, mode="drop"),
        n_nodes=jnp.minimum(rm.n_nodes + jnp.sum(accept.astype(jnp.int32)), N),
    )


@vjit
def reanchor_nodes(rm: Roadmap, kf_T_cw: lie.SE3) -> Roadmap:
    """optimizeSHM equivalent: recompute world positions from (corrected)
    anchor keyframe poses — the roadmap deforms with the SLAM graph."""
    T = lie.SE3(kf_T_cw.R[rm.kf_parent], kf_T_cw.t[rm.kf_parent])
    T_wc = lie.inverse(T)
    p_w = (T_wc.R @ rm.p_kf[..., :, None])[..., 0] + T_wc.t
    return rm._replace(xy=jnp.where(rm.valid[:, None], p_w[:, :2], rm.xy))


@vjit(static_argnames=("spec",))
def connect_edges(
    rm: Roadmap,
    spec: GridSpec2D,
    occ: jax.Array,
    max_edge_length: float = 6.1,
    max_unknown_fraction: float = 0.3,
) -> Roadmap:
    """Rebuild the (N, E) adjacency: top-E nearest candidates within range
    whose connecting segment is obstacle-free and mostly known.

    This is the reConstructGraph + isConnectable pipeline (reference hot
    loop, SURVEY.md §3.2) as three batched stages.
    """
    N, E = rm.capacity
    d = jnp.linalg.norm(rm.xy[:, None, :] - rm.xy[None, :, :], axis=-1)
    ok = (
        rm.valid[:, None] & rm.valid[None, :]
        & (d <= max_edge_length)
        & (jnp.arange(N)[:, None] != jnp.arange(N)[None, :])
    )
    d_masked = jnp.where(ok, d, INF)
    # top-E nearest candidates per node
    neg = -d_masked
    _, cand = jax.lax.top_k(neg, E)                           # (N, E)
    cand_d = jnp.take_along_axis(d_masked, cand, axis=1)
    cand_ok = cand_d < INF

    # batched raycast on all N*E candidate segments
    a = jnp.repeat(rm.xy, E, axis=0)
    b = rm.xy[cand.reshape(-1)]
    hit, unk = raycast.segment_clearance(spec, occ, a, b)
    hit = hit.reshape(N, E)
    unk = unk.reshape(N, E)
    good = cand_ok & jnp.logical_not(hit) & (unk < max_unknown_fraction)

    return rm._replace(
        adj=jnp.where(good, cand, -1).astype(jnp.int32),
        adj_dist=jnp.where(good, cand_d, INF),
    )


def _shortest_paths(
    rm: Roadmap,
    source_xy: jax.Array,     # (2,) world position (snapped to nearest node)
    iters: int = 64,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Bellman-Ford label correction from the node nearest source_xy.

    Returns (dist (N,) meters, parent (N,) int32, source node index).
    One run prices paths to every frontier/node — replacing per-goal A*.
    """
    N, E = rm.capacity
    d_src = jnp.linalg.norm(rm.xy - source_xy[None, :], axis=-1)
    d_src = jnp.where(rm.valid, d_src, INF)
    src = jnp.argmin(d_src).astype(jnp.int32)

    dist0 = jnp.full((N,), INF).at[src].set(0.0)
    parent0 = jnp.full((N,), -1, jnp.int32).at[src].set(src)

    adj_safe = jnp.maximum(rm.adj, 0)

    def body(_, carry):
        dist, parent = carry
        nb_dist = dist[adj_safe] + rm.adj_dist                 # (N, E)
        nb_dist = jnp.where(rm.adj >= 0, nb_dist, INF)
        best = jnp.min(nb_dist, axis=1)
        best_e = jnp.argmin(nb_dist, axis=1)
        better = best < dist
        new_dist = jnp.where(better, best, dist)
        new_parent = jnp.where(
            better, jnp.take_along_axis(adj_safe, best_e[:, None], axis=1)[:, 0], parent
        )
        return new_dist, new_parent

    dist, parent = jax.lax.fori_loop(0, iters, body, (dist0, parent0))
    dist = jnp.where(rm.valid, dist, INF)
    return dist, parent, src


shortest_paths = vjit(_shortest_paths, static_argnames=("iters",))

@vjit(static_argnames=("iters",))
def shortest_paths_multi(
    rm: Roadmap,
    sources_xy: jax.Array,    # (S, 2) world positions
    iters: int = 64,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Multi-source Bellman-Ford: ((S, N) dist, (S, N) parent, (S,) source
    node). One dispatch prices every TSP leg of the tick — the relaxation
    already touches all (N, E) labels per source, so vmapping over sources
    widens the gathers instead of re-dispatching S times (reference
    counterpart: the per-pair cached A* of FullPathOptimizer.cpp:371-420)."""
    return jax.vmap(lambda s: _shortest_paths(rm, s, iters))(sources_xy)


@vjit
def nearest_node(rm: Roadmap, xy: jax.Array) -> jax.Array:
    d = jnp.linalg.norm(rm.xy - xy[None, :], axis=-1)
    return jnp.argmin(jnp.where(rm.valid, d, INF)).astype(jnp.int32)


def extract_path(rm: Roadmap, parent, src: int, goal_node: int, max_len: int = 64):
    """Host-side: walk parents from goal back to src. Returns list of node
    indices (src..goal) or [] if unreachable."""
    import numpy as np

    parent = np.asarray(parent)
    path = [int(goal_node)]
    for _ in range(max_len):
        p = int(parent[path[-1]])
        if p < 0:
            return []
        if p == path[-1] or p == int(src):
            path.append(int(src))
            break
        path.append(p)
    return list(reversed(path))


@vjit(static_argnames=("spec",))
def refine_path_los(
    spec: GridSpec2D,
    occ: jax.Array,
    waypoints: jax.Array,      # (W, 2) padded path
    w_valid: jax.Array,        # (W,) bool
) -> jax.Array:
    """Line-of-sight shortcut mask (reference refinePath :657-715): waypoint i
    is droppable if the segment (i-1, i+1) is clear. One batched raycast."""
    W = waypoints.shape[0]
    prev_xy = jnp.roll(waypoints, 1, axis=0)
    next_xy = jnp.roll(waypoints, -1, axis=0)
    hit, unk = raycast.segment_clearance(spec, occ, prev_xy, next_xy)
    interior = w_valid & jnp.roll(w_valid, 1) & jnp.roll(w_valid, -1)
    interior = interior.at[0].set(False).at[W - 1].set(False)
    droppable = interior & jnp.logical_not(hit) & (unk < 0.3)
    return w_valid & jnp.logical_not(droppable)
