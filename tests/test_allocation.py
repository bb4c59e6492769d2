"""Multi-robot task allocation (SURVEY.md §2.3 E17): Hungarian vs brute
force, auction vs Hungarian, MinPos semantics, Voronoi partition, goal
sharing, and a two-rover shared-map exploration run."""

import dataclasses
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from fitslam_tpu.models import allocation as al
from fitslam_tpu.models import sim_robot as sim
from fitslam_tpu.models.sim_nav import SimNavInterface
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.utils.config import FitSlamConfig
from fitslam_tpu.utils.evaluation import coverage_fraction

rng = np.random.RandomState(0)


def brute_force(cost):
    R, F = cost.shape
    best, best_cost = None, np.inf
    for perm in itertools.permutations(range(F), R):
        c = sum(cost[r, perm[r]] for r in range(R))
        if c < best_cost:
            best_cost, best = c, perm
    return np.array(best), best_cost


def test_hungarian_matches_brute_force():
    for _ in range(20):
        R, F = rng.randint(2, 5), rng.randint(4, 7)
        cost = rng.uniform(0, 10, (R, F))
        a = al.hungarian_assign(cost)
        _, opt = brute_force(cost)
        got = cost[np.arange(R), a].sum()
        assert np.isclose(got, opt, atol=1e-9), (got, opt)


def test_hungarian_forbidden_column():
    cost = np.array([[1.0, al.BIG], [al.BIG, al.BIG]])
    a = al.hungarian_assign(cost)
    assert a[0] == 0 and a[1] == -1


def test_auction_near_optimal():
    for seed in range(10):
        r = np.random.RandomState(seed)
        R, F = 3, 6
        cost = r.uniform(0, 10, (R, F)).astype(np.float32)
        a = np.asarray(al.auction_assign(jnp.asarray(cost)))
        assert (a >= 0).all()
        assert len(set(a.tolist())) == R            # one object per bidder
        _, opt = brute_force(cost)
        got = cost[np.arange(R), a].sum()
        # eps-optimality: within R * (range / 4F) of the true optimum
        assert got <= opt + R * 10.0 / (4 * F) + 1e-4, (got, opt)


def test_auction_unassignable_row():
    cost = jnp.asarray(
        np.array([[1.0, 2.0], [al.BIG, al.BIG], [3.0, 1.0]], np.float32)
    )
    a = np.asarray(al.auction_assign(cost))
    assert a[1] == -1
    assert a[0] >= 0 and a[2] >= 0 and a[0] != a[2]


def test_minpos_rank_semantics():
    # robot 0 closest to frontier 0; robot 1 closest to frontier 1
    dist = jnp.asarray(np.array([[1.0, 5.0], [4.0, 2.0]], np.float32))
    a = np.asarray(al.minpos_assign(dist))
    assert a.tolist() == [0, 1]
    # all frontiers infeasible for robot 1
    dist = jnp.asarray(np.array([[1.0, 2.0], [al.BIG, al.BIG]], np.float32))
    a = np.asarray(al.minpos_assign(dist))
    assert a[0] == 0 and a[1] == -1


def test_voronoi_partition_covers_and_separates():
    spec = gr.GridSpec2D(size=32, resolution=0.5, origin_x=-8.0, origin_y=-8.0)
    xy = jnp.asarray(np.array([[-4.0, 0.0], [4.0, 0.0]], np.float32))
    lbl = np.asarray(al.voronoi_partition(spec, xy, jnp.ones((2,), bool)))
    assert set(np.unique(lbl)) == {0, 1}
    # left half belongs to robot 0, right half to robot 1
    assert (lbl[:, :8] == 0).all()
    assert (lbl[:, 24:] == 1).all()


def test_goal_sharing_penalty():
    alloc = al.TaskAllocator(method="hungarian", share_radius_m=1.0)
    cost = np.array([[1.0, 2.0]])
    fxy = np.array([[0.0, 0.0], [5.0, 0.0]])
    # a peer already drives at frontier 0 -> robot must take frontier 1
    a = alloc.allocate(cost, fxy, peer_goals=[np.array([0.2, 0.1])])
    assert a[0] == 1


SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)


@pytest.mark.parametrize("method", ["hungarian", "minpos"])
def test_two_rover_shared_map_exploration(method):
    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg,
        nav=dataclasses.replace(cfg.nav, wavefront_iters=192, desired_speed=1.0),
        multi_robot=dataclasses.replace(cfg.multi_robot, allocator=method),
    )
    gt = jnp.asarray(sim.make_rooms_world(SPEC, seed=2))
    state = {"explored": jnp.full((SPEC.size, SPEC.size), gr.UNKNOWN, jnp.uint8)}
    robots = [
        sim.DiffDriveRobot(x=-5.0, y=-5.0, yaw=0.0, v_max=1.2, w_max=2.5),
        sim.DiffDriveRobot(x=5.0, y=5.0, yaw=3.0, v_max=1.2, w_max=2.5),
    ]

    def get_occ():
        return state["explored"]

    navs = [SimNavInterface(cfg, SPEC, r, get_occ, dt=0.15) for r in robots]
    for n in navs:
        n.controller.max_omega = 2.0
    coord = al.MultiRobotCoordinator(
        cfg, SPEC, get_occ, navs,
        get_poses=lambda: [(r.xy, r.yaw) for r in robots],
    )
    for step in range(120):
        for r in robots:
            state["explored"] = sim.reveal_sensor(
                SPEC, gt, state["explored"], jnp.asarray(r.xy, jnp.float32),
                range_m=3.0,
            )
        if step % 2 == 0:
            coord.tick()
        for _ in range(3):
            for n in navs:
                n.step()
        if coord.done:
            break
    known = np.asarray(state["explored"]) != gr.UNKNOWN
    assert coverage_fraction(known) > 0.4
    # both rovers contributed motion
    for r in robots:
        traj = np.array([(x, y) for x, y, _ in r.trajectory])
        assert np.ptp(traj[:, 0]) + np.ptp(traj[:, 1]) > 1.5
