"""End-to-end frontier exploration in a simulated rooms world — the
rapid-exploration mode of the reference (no SLAM; reveal sensor + frontier
BT loop + Nav2-equivalent planner/controller), checked by coverage growth."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitslam_tpu.models import sim_robot as sim
from fitslam_tpu.models.exploration import ExplorationServer, ExplorationState
from fitslam_tpu.models.sim_nav import SimNavInterface
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.utils.config import FitSlamConfig
from fitslam_tpu.utils.evaluation import coverage_fraction

SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)


@pytest.fixture(scope="module")
def exploration_run():
    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg,
        frontier_search=dataclasses.replace(
            cfg.frontier_search, search_radius_m=6.0, max_frontiers=64,
        ),
        roadmap=dataclasses.replace(cfg.roadmap, max_nodes=256, cleanup_period_s=5.0),
        nav=dataclasses.replace(cfg.nav, wavefront_iters=192, desired_speed=0.8),
        exploration_bt=dataclasses.replace(
            cfg.exploration_bt, nav2_goal_timeout_s=30.0,
        ),
        fisher_information=dataclasses.replace(cfg.fisher_information, enabled=False),
    )

    gt = jnp.asarray(sim.make_rooms_world(SPEC, seed=1))
    explored = jnp.full((SPEC.size, SPEC.size), gr.UNKNOWN, jnp.uint8)
    robot = sim.DiffDriveRobot(x=-5.0, y=-5.0, yaw=0.0, v_max=1.2, w_max=2.5)

    state = {"explored": explored}

    def get_occ():
        return state["explored"]

    nav = SimNavInterface(cfg, SPEC, robot, get_occ, dt=0.15)
    nav.controller.max_omega = 2.0
    server = ExplorationServer(
        cfg, SPEC, get_occ, nav,
        get_robot_pose=lambda: (robot.xy, robot.yaw),
    )

    coverage = []
    for step in range(300):
        state["explored"] = sim.reveal_sensor(
            SPEC, gt, state["explored"], jnp.asarray(robot.xy, jnp.float32),
            range_m=3.0,
        )
        if step % 2 == 0:
            st = server.tick()
            if st == ExplorationState.DONE:
                break
        for _ in range(4):  # controller at ~4x the sensor/tick rate
            nav.step()
        known = np.asarray(state["explored"]) != gr.UNKNOWN
        coverage.append(coverage_fraction(known))
    return server, robot, coverage, np.asarray(state["explored"]), np.asarray(gt)


def test_coverage_grows(exploration_run):
    server, robot, coverage, explored, gt = exploration_run
    assert coverage[-1] > 0.5, f"final coverage {coverage[-1]:.2f}"
    assert coverage[-1] > coverage[10] + 0.2  # actually explored, not just spawned


def test_robot_moved_between_rooms(exploration_run):
    server, robot, coverage, explored, gt = exploration_run
    traj = np.array([(x, y) for x, y, _ in robot.trajectory])
    assert np.ptp(traj[:, 0]) > 3.0  # crossed a significant x range
    assert server.diag.goals_sent >= 2


def test_explored_matches_ground_truth(exploration_run):
    """Revealed cells must agree with the GT world (sensor correctness)."""
    server, robot, coverage, explored, gt = exploration_run
    known = explored != gr.UNKNOWN
    agree = (explored[known] == gt[known]).mean()
    assert agree > 0.97, agree


def test_diagnostics_consistent(exploration_run):
    server, robot, coverage, explored, gt = exploration_run
    assert server.diag.ticks > 10
    assert server.diag.frontiers_found >= 0
    assert int(server.roadmap.n_nodes) > 3


def test_initialization_sequence_bootstrap():
    """E2 InitializationSequence: with bootstrap enabled the server drives a
    forward leg then a full spin open-loop before dispatching any goal."""
    import dataclasses as dc
    import math

    cfg = FitSlamConfig()
    cfg = dc.replace(
        cfg,
        exploration_bt=dc.replace(
            cfg.exploration_bt, bootstrap_enabled=True,
            bootstrap_forward_s=0.5, bootstrap_spin_rate=2.0,
            tick_dt_s=0.1,
        ),
        fisher_information=dc.replace(cfg.fisher_information, enabled=False),
    )
    gt = jnp.asarray(sim.make_rooms_world(SPEC, seed=1))
    state = {"explored": jnp.full((SPEC.size, SPEC.size), gr.UNKNOWN, jnp.uint8)}
    robot = sim.DiffDriveRobot(x=-5.0, y=-5.0, yaw=0.0, v_max=1.0, w_max=3.0)
    nav = SimNavInterface(cfg, SPEC, robot, lambda: state["explored"], dt=0.1)
    server = ExplorationServer(cfg, SPEC, lambda: state["explored"], nav,
                               get_robot_pose=lambda: (robot.xy, robot.yaw))
    assert server.state == ExplorationState.INITIALIZING

    yaw0 = robot.yaw
    spun = 0.0
    last = robot.yaw
    steps_in_init = 0
    for _ in range(200):
        state["explored"] = sim.reveal_sensor(
            SPEC, gt, state["explored"], jnp.asarray(robot.xy, jnp.float32),
            range_m=3.0,
        )
        st = server.tick()
        d = (robot.yaw - last + math.pi) % (2 * math.pi) - math.pi
        spun += abs(d)
        last = robot.yaw
        if st != ExplorationState.INITIALIZING:
            break
        steps_in_init += 1
    assert steps_in_init >= 5
    assert robot.x > -5.0 + 0.05          # forward leg happened
    assert spun > 2 * math.pi * 0.8       # (nearly) full spin happened
    assert server.diag.goals_sent == 0    # no goal during bootstrap
