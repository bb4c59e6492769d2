"""Marsyard rough-terrain e2e: the reference's headline scenario — a rover on
3D terrain where slope/roughness (not walls) decide traversability
(README.md:3-12; traversabilityParams.yaml:8-16). The full active-SLAM loop
runs on a procedural heightfield with a slope-lethal ridge, roughness-lethal
boulder fields, and one safe corridor; asserts the fused grid classifies the
terrain and the rover avoids lethal cells while exploring."""

import dataclasses
import math

import jax
import numpy as np
import pytest

from fitslam_tpu.data import synthetic
from fitslam_tpu.models import sim_robot as simr
from fitslam_tpu.models.active_slam import ActiveSlamSystem, camera_pose_from_robot
from fitslam_tpu.models.sim_nav import SimNavInterface
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.utils.config import FitSlamConfig

SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)
W, H = 320, 240


def _cfg():
    cfg = FitSlamConfig()
    return dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, width=W, height=H, fx=200.0,
                                   fy=200.0, cx=W / 2, cy=H / 2, baseline=0.2),
        orb=dataclasses.replace(cfg.orb, num_features=320, num_levels=2,
                                fast_threshold=12.0),
        tracking=dataclasses.replace(cfg.tracking, min_inliers=10,
                                     keyframe_min_interval=2,
                                     keyframe_translation=0.25),
        mapping=dataclasses.replace(cfg.mapping, max_keyframes=48,
                                    max_landmarks=3072, max_observations=8192,
                                    local_window=4, ba_iters=3),
        loop=dataclasses.replace(cfg.loop, enabled=False),
        # reference terrain semantics: traversabilityParams.yaml:8-16
        traversability=dataclasses.replace(cfg.traversability,
                                           max_points_per_cloud=4096,
                                           max_clouds=48),
        frontier_search=dataclasses.replace(cfg.frontier_search,
                                            search_radius_m=6.0,
                                            max_frontiers=64),
        roadmap=dataclasses.replace(cfg.roadmap, max_nodes=256,
                                    cleanup_period_s=5.0),
        nav=dataclasses.replace(cfg.nav, wavefront_iters=192,
                                desired_speed=0.7),
        fisher_information=dataclasses.replace(cfg.fisher_information,
                                               threshold=5.0),
    )


@pytest.fixture(scope="module")
def marsyard_run():
    cfg = _cfg()
    K = Intrinsics.from_config(cfg.camera)
    mw = synthetic.marsyard_world(SPEC, seed=3, points_per_cell=6)

    robot = simr.DiffDriveRobot(x=-5.0, y=-0.5, yaw=0.2, v_max=0.8, w_max=1.0)

    system_box = {}

    def get_occ():
        return system_box["sys"].occupancy()

    nav = SimNavInterface(cfg, SPEC, robot, get_occ, dt=0.15)
    nav.controller.max_omega = 0.9
    system = ActiveSlamSystem(
        cfg, SPEC, nav,
        get_robot_pose=lambda: system_box["sys"].estimated_robot_pose(),
    )
    system_box["sys"] = system

    for step in range(150):
        z = synthetic.marsyard_surface_z(robot.x, robot.y, mw, SPEC)
        cam = camera_pose_from_robot(robot.x, robot.y, robot.yaw,
                                     height=z + 0.8)
        if step == 0:
            system.set_world_anchor(cam)
        left, right = synthetic.render_stereo(K, mw.world, cam, width=W,
                                              height=H, max_depth=12.0)
        cloud, cvalid = synthetic.frustum_cloud(
            K, mw.world, cam, max_points=cfg.traversability.max_points_per_cloud,
            max_depth=8.0, width=W, height=H,
        )
        system.process_frame(left, right, cloud, cvalid)
        if step % 4 == 3:
            system.tick_exploration()
        nav.step()
    return system, robot, mw


def test_slope_terrain_classified(marsyard_run):
    """The fused grid must mark slope/roughness-lethal terrain as LETHAL
    without any vertical wall in the world (grid cost >= lethal comes purely
    from the slope/rough/step classification of fuse_clouds)."""
    system, robot, mw = marsyard_run
    occ = np.asarray(system.occupancy())
    known = occ != gr.UNKNOWN
    assert known.mean() > 0.05, "rover saw almost nothing"
    grid_lethal = (occ != gr.UNKNOWN) & (occ >= gr.INSCRIBED)

    # the seen part of the ridge/boulders shows up lethal
    assert grid_lethal.sum() >= 10, "no lethal terrain detected"


def test_lethal_matches_ground_truth(marsyard_run):
    system, robot, mw = marsyard_run
    occ = np.asarray(system.occupancy())
    grid_lethal = (occ != gr.UNKNOWN) & (occ >= gr.INSCRIBED)
    # dilate GT by the security-distance inflation radius (0.6 m ~ 3 cells)
    gt = mw.gt_lethal.copy()
    r = 3
    gt_dil = np.zeros_like(gt)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            gt_dil |= np.roll(np.roll(gt, dy, axis=0), dx, axis=1)
    hits = grid_lethal & gt_dil
    precision = hits.sum() / max(grid_lethal.sum(), 1)
    assert precision > 0.7, f"lethal precision {precision:.2f}"


def test_rover_avoids_lethal_terrain(marsyard_run):
    """The rover's executed trajectory never enters a ground-truth lethal
    cell — the slope/roughness gating actually steered navigation."""
    system, robot, mw = marsyard_run
    viol = 0
    for (x, y, _) in robot.trajectory:
        ci = int(np.clip((x - SPEC.origin_x) / SPEC.resolution, 0, SPEC.size - 1))
        cj = int(np.clip((y - SPEC.origin_y) / SPEC.resolution, 0, SPEC.size - 1))
        viol += bool(mw.gt_lethal[cj, ci])
    assert viol == 0, f"rover entered lethal terrain {viol} times"


def test_rover_explored_terrain(marsyard_run):
    system, robot, mw = marsyard_run
    traj = np.array([(x, y) for x, y, _ in robot.trajectory])
    assert np.ptp(traj[:, 0]) + np.ptp(traj[:, 1]) > 2.0
    assert system.explorer.diag.goals_sent >= 1
