"""Full active-SLAM loop (BASELINE.json configs[3]): stereo SLAM + per-KF
frustum clouds -> traversability grid -> frontier exploration with the
Fisher-information safety oracle, on a simulated rooms world."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitslam_tpu.data import synthetic
from fitslam_tpu.models import sim_robot as simr
from fitslam_tpu.models.active_slam import ActiveSlamSystem, camera_pose_from_robot
from fitslam_tpu.models.exploration import ExplorationState
from fitslam_tpu.models.sim_nav import SimNavInterface
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.utils.config import FitSlamConfig
from fitslam_tpu.utils import evaluation as ev

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
def active_run():
    cfg = _cfg()
    K = Intrinsics.from_config(cfg.camera)
    occ_gt = simr.make_rooms_world(SPEC, seed=3)
    world3d = synthetic.world_from_occupancy(
        occ_gt, SPEC, jax.random.PRNGKey(5), wall_height=2.0,
        points_per_wall_cell=4, floor_points=4000,
    )
    # rotation rate capped so inter-frame feature motion stays inside the
    # tracker's search window (1.0 rad/s * 0.15 s * 200 px/rad ~ 30 px)
    robot = simr.DiffDriveRobot(x=-5.0, y=-5.0, yaw=0.3, v_max=0.8, w_max=1.0)

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

    gt_traj = []
    fi_values = []
    # 150 frames: arrival now includes rotate-to-heading (the goal is a POSE,
    # matching Nav2), which spends controller steps turning the camera into
    # the unknown instead of translating
    for step in range(150):
        cam = camera_pose_from_robot(robot.x, robot.y, robot.yaw)
        if step == 0:
            system.set_world_anchor(cam)
        left, right = synthetic.render_stereo(K, world3d, cam, width=W, height=H,
                                              max_depth=12.0)
        cloud, cvalid = synthetic.frustum_cloud(
            K, world3d, cam, max_points=cfg.traversability.max_points_per_cloud,
            max_depth=8.0, width=W, height=H,
        )
        system.process_frame(left, right, cloud, cvalid)
        gt_traj.append(np.asarray(cam.matrix()))

        if step % 4 == 3:
            system.tick_exploration()
            fi_values.append(system.fisher_information_of_pose(robot.xy, robot.yaw))
        # one control step per camera frame: a real camera runs at >= the
        # controller rate (reference: 10 Hz controller, 15-30 fps camera)
        nav.step()
    system.finalize()   # drain async keyframe events + materialize trajectory
    return system, robot, gt_traj, fi_values


def test_slam_tracks(active_run):
    system, robot, gt_traj, fi_values = active_run
    assert int(system.slam.map.n_kf) >= 5
    # world-anchored ATE against ground truth camera trajectory
    anchored = [gt_traj[0] @ T for T in system.slam.trajectory]
    ate = ev.ate_rmse(anchored, gt_traj, align=False)
    assert ate < 0.5, f"ATE {ate:.3f} m"


def test_traversability_built(active_run):
    system, robot, gt_traj, fi_values = active_run
    occ = np.asarray(system.occupancy())
    known = occ != gr.UNKNOWN
    assert known.mean() > 0.08
    assert (occ[known] == gr.LETHAL).sum() > 10  # walls show up as lethal


def test_fisher_oracle_positive(active_run):
    system, robot, gt_traj, fi_values = active_run
    assert len(fi_values) > 5
    assert max(fi_values) > 5.0  # landmarks in view give usable information


def test_robot_explored(active_run):
    system, robot, gt_traj, fi_values = active_run
    traj = np.array([(x, y) for x, y, _ in robot.trajectory])
    assert np.ptp(traj[:, 0]) + np.ptp(traj[:, 1]) > 2.0
    assert system.explorer.diag.goals_sent >= 1
