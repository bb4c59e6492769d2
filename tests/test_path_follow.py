"""Exploration-path following (E16) + LOS-refined published plan (E12).

Reference: FullPathOptimizer::refineAndPublishPath publishes the TSP
first-leg path smoothed by ThetaStar (FullPathOptimizer.cpp:663-702), and
the FrontierRoadmapPlanner nav2 plugin replays it so Nav2 follows the
roadmap path instead of NavFn (roadmap_planner_plugin.cpp:1-80, selected in
active_slam_explore_to_pose.xml:10)."""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models import sim_robot as simr
from fitslam_tpu.models.exploration import ExplorationServer, ExplorationState
from fitslam_tpu.models.sim_nav import SimNavInterface
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.utils.config import FitSlamConfig

SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)


def _cfg(planner):
    cfg = FitSlamConfig()
    return dataclasses.replace(
        cfg,
        nav=dataclasses.replace(cfg.nav, planner=planner, wavefront_iters=192,
                                desired_speed=0.8),
        frontier_search=dataclasses.replace(cfg.frontier_search,
                                            search_radius_m=10.0,
                                            max_frontiers=64),
        fisher_information=dataclasses.replace(cfg.fisher_information,
                                               enabled=False),
        exploration_bt=dataclasses.replace(cfg.exploration_bt,
                                           bootstrap_enabled=False),
    )


def _run(planner, steps=120):
    """Rooms world, sensor-revealed occupancy, server drives the sim rover."""
    cfg = _cfg(planner)
    gt = jnp.asarray(simr.make_rooms_world(SPEC, seed=4))
    state = {"occ": jnp.full((SPEC.size, SPEC.size), gr.UNKNOWN, jnp.uint8)}
    robot = simr.DiffDriveRobot(x=-5.0, y=-5.0, yaw=0.5, v_max=1.0, w_max=2.0)
    nav = SimNavInterface(cfg, SPEC, robot, lambda: state["occ"], dt=0.12)
    srv = ExplorationServer(
        cfg, SPEC,
        get_occupancy=lambda: state["occ"],
        nav=nav,
        get_robot_pose=lambda: (robot.xy, robot.yaw),
    )
    published = []
    for step in range(steps):
        state["occ"] = simr.reveal_sensor(
            SPEC, gt, state["occ"], jnp.asarray(robot.xy, jnp.float32),
            range_m=3.0,
        )
        if step % 3 == 0:
            srv.tick()
            if srv.published_path is not None and len(srv.published_path) >= 2:
                published.append(np.array(srv.published_path))
        for _ in range(2):
            nav.step()
        if srv.state == ExplorationState.DONE:
            break
    traj = np.array([(x, y) for x, y, _ in robot.trajectory])
    return srv, nav, traj, published


def _dist_to_polyline(p, poly):
    best = np.inf
    for a, b in zip(poly[:-1], poly[1:]):
        ab = b - a
        t = np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-9), 0.0, 1.0)
        best = min(best, float(np.linalg.norm(p - (a + t * ab))))
    return best


def test_server_publishes_refined_path():
    srv, nav, traj, published = _run("wavefront")
    assert published, "no plan ever published"
    # every published plan starts at the robot and ends at the active goal
    for plan in published[:5]:
        assert plan.shape[1] == 2 and len(plan) >= 2


def test_roadmap_mode_follows_published_plan():
    """E16: with planner='roadmap' the rover tracks the published plan —
    each driven pose stays close to a published polyline."""
    srv, nav, traj, published = _run("roadmap")
    assert published, "no plan ever published"
    assert srv.diag.goals_sent >= 1
    # the robot moved and its driven path hugs the published polylines:
    # measure deviation of each trajectory point to the nearest published
    # plan (plans update as the robot advances, so check the minimum)
    assert np.ptp(traj[:, 0]) + np.ptp(traj[:, 1]) > 1.5
    sampled = traj[:: max(1, len(traj) // 40)]
    devs = []
    for p in sampled:
        devs.append(min(_dist_to_polyline(p, plan) for plan in published))
    assert float(np.median(devs)) < 0.6, float(np.median(devs))
    assert float(np.max(devs)) < 2.0, float(np.max(devs))
