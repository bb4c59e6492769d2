"""Atlas multi-map + relocalization (ORB-SLAM3 S1 capability):
- a teleport (kidnapped-robot) with relocalization disabled spawns a new map,
- with relocalization enabled, returning to mapped territory re-locks the
  tracker onto the old map without a reinit."""

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
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.utils.config import FitSlamConfig

SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)
W, H = 320, 240


def _cfg(reloc: bool):
    cfg = FitSlamConfig()
    return dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, width=W, height=H, fx=200.0,
                                   fy=200.0, cx=W / 2, cy=H / 2, baseline=0.2),
        orb=dataclasses.replace(cfg.orb, num_features=320, num_levels=2,
                                fast_threshold=12.0),
        tracking=dataclasses.replace(cfg.tracking, min_inliers=10,
                                     keyframe_min_interval=2,
                                     keyframe_translation=0.25,
                                     reinit_after_lost=3,
                                     reloc_enabled=reloc,
                                     reloc_after_lost=1,
                                     reloc_min_inliers=15),
        mapping=dataclasses.replace(cfg.mapping, max_keyframes=24,
                                    max_landmarks=2048, max_observations=6144,
                                    local_window=4, ba_iters=2),
        loop=dataclasses.replace(cfg.loop, enabled=False),
    )


def _world():
    occ_gt = simr.make_rooms_world(SPEC, seed=3)
    return synthetic.world_from_occupancy(
        occ_gt, SPEC, jax.random.PRNGKey(5), wall_height=2.0,
        points_per_wall_cell=4, floor_points=4000,
    )


def _step(slam, K, world3d, x, y, yaw):
    cam = camera_pose_from_robot(x, y, yaw)
    left, right = synthetic.render_stereo(K, world3d, cam, width=W, height=H,
                                          max_depth=12.0)
    return slam.process_frame(left, right)


def test_teleport_spawns_new_map():
    cfg = _cfg(reloc=False)
    K = Intrinsics.from_config(cfg.camera)
    world3d = _world()
    slam = StereoSlam(cfg)
    # map the start area while creeping forward
    x, y, yaw = -5.0, -5.0, 0.3
    for i in range(8):
        _step(slam, K, world3d, x, y, yaw)
        x += 0.15 * math.cos(yaw)
        y += 0.15 * math.sin(yaw)
    assert int(jnp.max(slam.map.kf_map_id)) == 0
    # kidnapped: far-away pose, opposite heading
    for i in range(8):
        _step(slam, K, world3d, 5.0 + 0.1 * i, 5.0, -2.6)
    kf_ids = np.asarray(slam.map.kf_map_id)[np.asarray(slam.map.kf_valid)]
    assert kf_ids.max() >= 1, "teleport must open a new Atlas map"
    assert int(slam.state.map_id) >= 1


def test_relocalization_relocks_old_map():
    cfg = _cfg(reloc=True)
    K = Intrinsics.from_config(cfg.camera)
    world3d = _world()
    slam = StereoSlam(cfg)
    x, y, yaw = -5.0, -5.0, 0.3
    for i in range(8):
        _step(slam, K, world3d, x, y, yaw)
        x += 0.15 * math.cos(yaw)
        y += 0.15 * math.sin(yaw)
    # kidnap long enough that the motion-model prediction runs far away and
    # a reinit opens a second map around the kidnap site
    for i in range(6):
        _step(slam, K, world3d, 5.0 + 0.1 * i, 5.0, -2.6)
    assert int(slam.state.map_id) >= 1
    # return to the exact start: tracking against map-1 landmarks fails,
    # relocalization must re-lock onto map 0 via place recognition
    back = []
    for i in range(5):
        back.append(_step(slam, K, world3d, -5.0, -5.0, 0.3))
    assert any(b.get("relocalized") for b in back), \
        "relocalization should have fired"
    assert int(slam.state.map_id) == 0
    assert back[-1]["n_inliers"] >= 15
    T = np.asarray(slam.current_pose_wc.matrix())
    # slam frame is anchored at the first camera: world pose = anchor @ T
    anchor = np.asarray(camera_pose_from_robot(-5.0, -5.0, 0.3).matrix())
    T_w = anchor @ T
    est_xy = T_w[:2, 3]
    assert np.linalg.norm(est_xy - np.array([-5.0, -5.0])) < 0.5
