"""RGB-D fusion bench stage-cost probe (r05): which per-keyframe stage
keeps the fusion config under the 60 fps bar — the frame path itself,
cloud fusion, grid derivation, or frontier extraction?

Runs the exact bench_rgbd_fusion pipeline with the per-keyframe callback
doing cumulatively more work; fps deltas attribute the device cost.

Usage: python tools/diag_rgbd_perf.py
"""

import sys
import time
import dataclasses

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench_suite import _slam_cfg, _sync
from fitslam_tpu.data import synthetic
from fitslam_tpu.models.slam import StereoSlam
from fitslam_tpu.ops import frontier as fx
from fitslam_tpu.ops import grid as gridops
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.ops.grid import GridSpec2D


def main():
    n_frames = 60
    cfg, (W, H) = _slam_cfg(False)
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, rgbd=True),
        loop=dataclasses.replace(cfg.loop, enabled=False),
        traversability=dataclasses.replace(cfg.traversability,
                                           max_points_per_cloud=4096,
                                           max_clouds=64),
    )
    K = Intrinsics.from_config(cfg.camera)
    spec = GridSpec2D(size=128, resolution=0.25, origin_x=-16.0,
                      origin_y=-16.0)
    world = synthetic.corridor_world(jax.random.PRNGKey(3), num=4000,
                                     length=24.0, width=5.0)
    T_gt = synthetic.straight_trajectory(n_frames, length=n_frames * 0.15,
                                         height=1.2, start_x=0.5)
    frames = []
    for i in range(n_frames):
        Ti = lie.SE3(T_gt.R[i], T_gt.t[i])
        img, depth = synthetic.render_rgbd(K, world, Ti, width=W, height=H,
                                           max_depth=12.0)
        cloud, cvalid = synthetic.frustum_cloud(
            K, world, Ti, max_points=cfg.traversability.max_points_per_cloud,
            max_depth=8.0, width=W, height=H)
        frames.append((img, depth, cloud, cvalid))

    POLL = 4

    def run(level):
        slam = StereoSlam(cfg)
        state = {
            "clouds": gridops.empty_cloud_buffer(
                cfg.traversability.max_clouds,
                cfg.traversability.max_points_per_cloud),
            "stats": gridops.empty_cell_stats(spec),
            "occ": None, "fr": None,
        }
        cloud_ring = {}

        def on_kf(s, kf_idx):
            cloud, cvalid = cloud_ring.get(s.last_keyframe_frame_id,
                                           (None, None))
            if cloud is None or level < 1:
                return
            state["clouds"] = gridops.add_cloud(state["clouds"], cloud,
                                                cvalid, jnp.int32(kf_idx))
            T_kf = lie.SE3(s.map.kf_T_cw.R[kf_idx], s.map.kf_T_cw.t[kf_idx])
            state["stats"] = gridops.scatter_cloud_stats(
                spec, state["stats"], cloud, cvalid, T_kf)
            if level < 2:
                return
            g = gridops.grid_from_stats(
                spec, state["stats"],
                max_slope=cfg.traversability.max_slope,
                ground_clearance=cfg.traversability.ground_clearance,
                robot_height=cfg.traversability.robot_height,
                security_distance=cfg.traversability.security_distance)
            state["occ"] = gridops.threshold_grid(
                g, cfg.traversability.lethal_threshold)
            if level < 3:
                return
            state["fr"] = fx.extract_frontiers(
                spec, state["occ"], s.map.kf_T_cw.t[0][:2],
                jnp.float32(12.0), max_cells=4096, max_frontiers=64,
                max_cluster_size=20)

        slam.keyframe_events.append(on_kf)
        t0 = time.monotonic()
        for i, (img, depth, cloud, cvalid) in enumerate(frames):
            cloud_ring[i] = (cloud, cvalid)
            slam.process_rgbd_frame_async(img, depth)
            if i % POLL == POLL - 1:
                slam.poll_keyframe_events()
                cloud_ring.clear()
        slam.poll_keyframe_events()
        if state["occ"] is not None:
            _sync(state["occ"])
        else:
            _sync(slam.outs_log[-1].pose_wc)
        return time.monotonic() - t0, int(slam.map.n_kf)

    names = ["frames+polls only", "+cloud fusion", "+grid derive",
             "+frontiers"]
    for level in range(4):
        run(level)                 # warm/compile
        wall, n_kf = run(level)
        print(f"level {level} ({names[level]:18s}): {wall:.3f}s "
              f"{n_frames/wall:6.1f} fps  n_kf={n_kf}", flush=True)


if __name__ == "__main__":
    main()
