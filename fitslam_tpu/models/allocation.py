"""Multi-robot task allocation: assignment solvers + coordinator.

Reference capability (SURVEY.md §2.3 E17): TaskAllocator + Hungarian +
MinPos (frontier_multirobot_allocator: taskAllocator.cpp, hungarian/
Hungarian.cpp, minPos/), goal sharing between robots via the
`multirobot_send_current_goal` service (ExplorationBT.cpp:1375-1388), and
boost-polygon Voronoi partition utilities (src/voronoi/).

TPU formulation: assignment problems here are small (R <= 16 robots,
F <= 256 frontiers) but arrive in batches (one per tick, or one per
hypothesis in planning sweeps) — the auction solver is a fixed-shape
`lax.while_loop` that vmaps over problem batches; MinPos and the Voronoi
partition are pure rank/argmin kernels. An exact host-side Hungarian
(shortest-augmenting-path) is kept as the oracle the reference used and as
the default for single small problems.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.utils.jit import vjit
from fitslam_tpu.ops.grid import GridSpec2D

BIG = 1e9


# ---------------------------------------------------------------------------
# Exact Hungarian (host): shortest augmenting path with potentials, O(n^3).
# ---------------------------------------------------------------------------

def hungarian_assign(cost: np.ndarray) -> np.ndarray:
    """Minimum-cost assignment of R rows to F columns (R <= F).

    Returns (R,) column index per row, -1 where a row has no finite-cost
    column. Entries >= BIG/2 are treated as forbidden.
    """
    cost = np.asarray(cost, np.float64)
    R, F = cost.shape
    assert R <= F, "more rows than columns; transpose first"
    INF = float("inf")
    c = np.where(cost >= BIG / 2, INF, cost)

    # Jonker-Volgenant style: u[i], v[j] potentials; p[j] = row matched to j.
    u = np.zeros(R + 1)
    v = np.zeros(F + 1)
    p = np.full(F + 1, R)        # F is a virtual "free" column slot at index F
    way = np.zeros(F + 1, np.int64)
    for i in range(R):
        p[F] = i
        j0 = F
        minv = np.full(F + 1, INF)
        used = np.zeros(F + 1, bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(F):
                if used[j]:
                    continue
                cur = c[i0, j] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            if not np.isfinite(delta):
                # row unassignable through any augmenting path
                j1 = -1
                break
            for j in range(F + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == R:
                break
        if j1 == -1:
            continue
        while j0 != F:
            j2 = way[j0]
            p[j0] = p[j2]
            j0 = j2
    out = np.full(R, -1, np.int64)
    for j in range(F):
        if p[j] != R and np.isfinite(c[p[j], j]):
            out[p[j]] = j
    return out


# ---------------------------------------------------------------------------
# Auction algorithm (device): vmappable fixed-shape assignment.
# ---------------------------------------------------------------------------

@vjit(static_argnames=("max_rounds",))
def auction_assign(
    cost: jax.Array,              # (R, F) float32; >= BIG/2 = forbidden
    eps: jax.Array | None = None,
    max_rounds: int = 1024,
) -> jax.Array:
    """Bertsekas forward auction for min-cost assignment (R <= F).

    All unassigned bidders bid simultaneously each round; each object goes to
    its highest bidder. eps-complementary-slackness gives a solution within
    R*eps of optimal; eps defaults to cost_range/(4F) so the round count
    stays bounded (~4F^2). Returns (R,) int32 column per row (-1
    unassignable).
    """
    R, F = cost.shape
    value = -cost                                  # maximize value
    feasible = cost < BIG / 2
    if eps is None:
        fin = jnp.where(feasible, cost, 0.0)
        rng_c = jnp.max(fin) - jnp.min(jnp.where(feasible, cost, BIG))
        eps = jnp.maximum(rng_c, 1e-3) / (4.0 * F)

    def rows_assigned(owner):
        # scatter only valid (owner, True) pairs: unowned slots route to the
        # dropped out-of-bounds index R (duplicate-index scatter with mixed
        # True/False values has undefined write order in XLA)
        idx = jnp.where(owner >= 0, owner, R)
        return jnp.zeros((R,), bool).at[idx].set(True, mode="drop")

    def cond(carry):
        owner, price, rounds = carry
        # a row with no feasible column can never be assigned
        must_assign = jnp.any(feasible, axis=1)
        return (rounds < max_rounds) & jnp.any(must_assign & ~rows_assigned(owner))

    def body(carry):
        owner, price, rounds = carry               # owner (F,), price (F,)
        assigned_rows = rows_assigned(owner)
        gain = jnp.where(feasible, value - price[None, :], -BIG)   # (R, F)
        best_j = jnp.argmax(gain, axis=1)
        best = jnp.max(gain, axis=1)
        second = jnp.max(
            jnp.where(
                jnp.arange(F)[None, :] == best_j[:, None], -BIG, gain
            ),
            axis=1,
        )
        bid = price[best_j] + (best - jnp.maximum(second, -BIG / 2)) + eps
        bids_ok = (~assigned_rows) & jnp.any(feasible, axis=1)
        # each object keeps the single highest bid
        bid_val = jnp.where(bids_ok, bid, -BIG)
        obj_best_bid = jnp.full((F,), -BIG).at[best_j].max(bid_val)
        wins = bids_ok & (bid_val >= obj_best_bid[best_j] - 1e-12)
        # tie-break: lowest row index wins
        first_winner = jnp.full((F,), R, jnp.int32).at[
            jnp.where(wins, best_j, F)
        ].min(jnp.where(wins, jnp.arange(R, dtype=jnp.int32), R), mode="drop")
        new_owner = jnp.where(first_winner < R, first_winner, owner)
        new_price = jnp.where(
            first_winner < R, obj_best_bid, price
        )
        return new_owner, new_price, rounds + 1

    owner0 = jnp.full((F,), -1, jnp.int32)
    price0 = jnp.zeros((F,))
    owner, price, _ = jax.lax.while_loop(cond, body, (owner0, price0, jnp.int32(0)))
    idx = jnp.where(owner >= 0, owner, R)
    return jnp.full((R,), -1, jnp.int32).at[idx].set(
        jnp.arange(F, dtype=jnp.int32), mode="drop"
    )


# ---------------------------------------------------------------------------
# MinPos (rank-based greedy, Bautin et al. — reference minPos/)
# ---------------------------------------------------------------------------

@vjit
def minpos_assign(dist: jax.Array) -> jax.Array:
    """Each robot picks the frontier where the number of closer robots is
    minimal (ties by own distance). (R, F) -> (R,) int32; -1 if no finite
    frontier. Robots may share a frontier — that is MinPos semantics."""
    feasible = dist < BIG / 2
    # closer[r, r', f]: robot r' is strictly closer to frontier f than r
    closer = (dist[None, :, :] < dist[:, None, :]) & feasible[None, :, :]
    rank = jnp.sum(closer, axis=1)  # (R, F)
    score = jnp.where(feasible, rank.astype(jnp.float32) * BIG / 4 + dist, BIG)
    pick = jnp.argmin(score, axis=1).astype(jnp.int32)
    ok = jnp.take_along_axis(feasible, pick[:, None], axis=1)[:, 0]
    return jnp.where(ok, pick, -1)


# ---------------------------------------------------------------------------
# Voronoi partition of the grid between robots (reference src/voronoi/)
# ---------------------------------------------------------------------------

@vjit(static_argnames=("spec",))
def voronoi_partition(
    spec: GridSpec2D,
    robot_xy: jax.Array,       # (R, 2)
    robot_valid: jax.Array,    # (R,) bool
) -> jax.Array:
    """(G, G) int32 label grid: nearest valid robot per cell (-1 if none)."""
    G = spec.size
    ii = jnp.arange(G)
    cy, cx = jnp.meshgrid(ii, ii, indexing="ij")
    centers = jnp.stack(
        [
            (cx.astype(jnp.float32) + 0.5) * spec.resolution + spec.origin_x,
            (cy.astype(jnp.float32) + 0.5) * spec.resolution + spec.origin_y,
        ],
        axis=-1,
    )  # (G, G, 2)
    d = jnp.linalg.norm(centers[:, :, None, :] - robot_xy[None, None, :, :], axis=-1)
    d = jnp.where(robot_valid[None, None, :], d, BIG)
    lbl = jnp.argmin(d, axis=-1).astype(jnp.int32)
    any_ok = jnp.any(robot_valid)
    return jnp.where(any_ok, lbl, -1)


# ---------------------------------------------------------------------------
# TaskAllocator + goal sharing
# ---------------------------------------------------------------------------

class TaskAllocator:
    """Builds the robots x frontiers cost matrix and assigns goals.

    Reference: taskAllocator.hpp:10-31 — rows are robots, columns frontier
    goals; method selected by config (`multi_robot.allocator`). Shared goals
    from peers (SendCurrentGoal service parity) are penalized so two robots
    do not chase the same frontier.
    """

    def __init__(self, method: str = "hungarian", share_radius_m: float = 1.5,
                 share_penalty: float = BIG):
        assert method in ("hungarian", "minpos", "auction")
        self.method = method
        self.share_radius_m = share_radius_m
        self.share_penalty = share_penalty

    def allocate(
        self,
        cost: np.ndarray,                    # (R, F) path/utility costs
        frontier_xy: np.ndarray,             # (F, 2)
        peer_goals: Optional[Sequence[np.ndarray]] = None,
    ) -> np.ndarray:
        cost = np.array(cost, np.float32, copy=True)
        if peer_goals:
            pg = np.stack([np.asarray(g) for g in peer_goals])     # (P, 2)
            d = np.linalg.norm(
                np.asarray(frontier_xy)[:, None, :] - pg[None, :, :], axis=-1
            )
            near = (d < self.share_radius_m).any(axis=1)           # (F,)
            cost[:, near] += self.share_penalty
        if self.method == "minpos":
            return np.asarray(minpos_assign(jnp.asarray(cost)))
        if self.method == "auction":
            return np.asarray(auction_assign(jnp.asarray(cost)))
        return hungarian_assign(cost)


class MultiRobotCoordinator:
    """Shared-map multi-robot exploration: one frontier search, one cost
    matrix, one assignment per tick (the GetAllocatedGoal BT node of the
    reference, ExplorationBT.cpp GetAllocatedGoal + E17)."""

    def __init__(self, cfg, spec: GridSpec2D, get_occupancy, navs: List,
                 get_poses: Callable[[], List[Tuple[np.ndarray, float]]]):
        from fitslam_tpu.models import nav as navx
        from fitslam_tpu.models import roadmap as rmx

        self.cfg = cfg
        self.spec = spec
        self.get_occupancy = get_occupancy
        self.navs = navs
        self.get_poses = get_poses
        self.allocator = TaskAllocator(method=cfg.multi_robot.allocator)
        self._goals: List[Optional[np.ndarray]] = [None] * len(navs)
        self.done = False

    def tick(self):
        from fitslam_tpu.models import nav as navx
        from fitslam_tpu.models.exploration import GoalStatus
        from fitslam_tpu.ops import frontier as fx

        if self.done:
            return
        occ = self.get_occupancy()
        poses = self.get_poses()
        fcfg = self.cfg.frontier_search
        R = len(self.navs)

        # one frontier set on the shared map, searched from the fleet centroid
        centroid = np.mean([xy for xy, _ in poses], axis=0)
        fr = fx.extract_frontiers(
            self.spec, occ, jnp.asarray(centroid, jnp.float32),
            jnp.float32(self.spec.extent),
            max_cells=4096,
            max_frontiers=fcfg.max_frontiers,
            max_cluster_size=fcfg.max_frontier_cluster_size,
            min_cluster_size=fcfg.min_frontier_cluster_size,
            cc_iters=fcfg.cc_iters,
        )
        valid = np.asarray(fr.valid)
        if not valid.any():
            for nav in self.navs:
                nav.cancel()
            self.done = True
            return
        fxy = np.asarray(fr.goal_xy)

        # per-robot path costs from one wavefront per robot (NavFn rows)
        rows = []
        for xy, _ in poses:
            pot = navx.wavefront_potential(
                self.spec, occ, jnp.asarray(xy, jnp.float32),
                iters=self.cfg.nav.wavefront_iters, allow_unknown=True,
            )
            c, okc = self.spec.world_to_cell(jnp.asarray(fxy, jnp.float32))
            d = jnp.where(okc, pot[c[:, 1], c[:, 0]], BIG)
            rows.append(np.asarray(jnp.where(jnp.asarray(valid), d, BIG)))
        cost = np.stack(rows)                                     # (R, F)

        assign = self.allocator.allocate(cost, fxy)
        for r, nav in enumerate(self.navs):
            j = int(assign[r])
            if j < 0 or cost[r, j] >= BIG / 2:
                continue
            goal = fxy[j]
            cur = self._goals[r]
            if (cur is not None and nav.status() == GoalStatus.ACTIVE
                    and np.linalg.norm(goal - cur) < 0.5):
                continue
            nav.send_goal(goal, 0.0)
            self._goals[r] = goal
