"""RGB-D SLAM + traversability fusion + frontier detection
(BASELINE.json configs[3... index 2]): the rgbd mode of the reference
(orb_slam3 rgbd.launch.py, SURVEY.md §2.1 S2) — depth comes from a rendered
depth image and the traversability clouds are backprojected from that same
depth image (no ground-truth geometry reaches the pipeline)."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitslam_tpu.data import synthetic
from fitslam_tpu.models import sim_robot as simr
from fitslam_tpu.models.active_slam import camera_pose_from_robot
from fitslam_tpu.models.slam import StereoSlam
from fitslam_tpu.ops import frontier as fx
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.utils import evaluation as ev

SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)
W, H = 320, 240


def _cfg():
    cfg = __import__("fitslam_tpu.utils.config", fromlist=["FitSlamConfig"]).FitSlamConfig()
    return dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, width=W, height=H, fx=200.0,
                                   fy=200.0, cx=W / 2, cy=H / 2, baseline=0.2,
                                   rgbd=True),
        orb=dataclasses.replace(cfg.orb, num_features=320, num_levels=2,
                                fast_threshold=12.0),
        tracking=dataclasses.replace(cfg.tracking, min_inliers=10,
                                     keyframe_min_interval=2,
                                     keyframe_translation=0.25),
        mapping=dataclasses.replace(cfg.mapping, max_keyframes=32,
                                    max_landmarks=3072, max_observations=8192,
                                    local_window=4, ba_iters=3),
        loop=dataclasses.replace(cfg.loop, enabled=False),
        traversability=dataclasses.replace(cfg.traversability,
                                           max_points_per_cloud=4800,
                                           max_clouds=32),
    )


@pytest.fixture(scope="module")
def rgbd_run():
    cfg = _cfg()
    K = Intrinsics.from_config(cfg.camera)
    occ_gt = simr.make_rooms_world(SPEC, seed=3)
    world3d = synthetic.world_from_occupancy(
        occ_gt, SPEC, jax.random.PRNGKey(5), wall_height=2.0,
        points_per_wall_cell=4, floor_points=5000,
    )
    slam = StereoSlam(cfg)
    tcfg = cfg.traversability
    clouds = gr.empty_cloud_buffer(tcfg.max_clouds, tcfg.max_points_per_cloud)

    # arc through the room: forward with a gentle turn
    x, y, yaw = -5.0, -5.0, 0.3
    gt_traj = []
    frames = {"depth": None}

    def on_kf(s, kf_idx):
        nonlocal clouds
        pts, ok = gr.depth_image_to_cloud(K, frames["depth"], stride=4,
                                          max_depth=8.0)
        clouds = gr.add_cloud(clouds, pts, ok, jnp.int32(kf_idx))

    slam.keyframe_events.append(on_kf)

    for step in range(40):
        cam = camera_pose_from_robot(x, y, yaw)
        img, depth = synthetic.render_rgbd(K, world3d, cam, width=W, height=H,
                                           max_depth=12.0)
        frames["depth"] = depth
        info = slam.process_rgbd_frame(img, depth)
        gt_traj.append(np.asarray(cam.matrix()))
        if step >= 2:
            yaw += 0.04
            x += 0.12 * math.cos(yaw)
            y += 0.12 * math.sin(yaw)

    # world-anchored fusion through the estimated keyframe poses
    T_anchor = camera_pose_from_robot(-5.0, -5.0, 0.3)
    kf_T_cw_world = lie.compose(slam.map.kf_T_cw, lie.inverse(T_anchor))
    grid = gr.fuse_clouds(
        SPEC, clouds, kf_T_cw_world,
        max_slope=tcfg.max_slope, ground_clearance=tcfg.ground_clearance,
        robot_height=tcfg.robot_height, security_distance=tcfg.security_distance,
    )
    occ = gr.threshold_grid(grid, tcfg.lethal_threshold)
    return slam, gt_traj, np.asarray(occ)


def test_rgbd_tracks(rgbd_run):
    slam, gt_traj, occ = rgbd_run
    assert int(slam.map.n_kf) >= 4
    anchored = [gt_traj[0] @ T for T in slam.trajectory]
    ate = ev.ate_rmse(anchored, gt_traj, align=False)
    assert ate < 0.3, f"ATE {ate:.3f} m"


def test_rgbd_depth_features(rgbd_run):
    slam, gt_traj, occ = rgbd_run
    # landmarks were created from depth-image reads, not stereo matching
    assert int(slam.map.n_lm) > 200


def test_rgbd_traversability_and_frontiers(rgbd_run):
    slam, gt_traj, occ = rgbd_run
    known = occ != gr.UNKNOWN
    assert known.mean() > 0.05
    assert (occ[known] == gr.FREE).sum() > 50
    fr = fx.extract_frontiers(
        SPEC, jnp.asarray(occ), jnp.asarray([-5.0, -5.0], jnp.float32),
        jnp.float32(SPEC.extent), max_cells=4096, max_frontiers=64,
        max_cluster_size=20, min_cluster_size=2, cc_iters=48,
    )
    assert int(fr.valid.sum()) >= 1
