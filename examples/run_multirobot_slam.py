"""Multi-robot active SLAM: each rover runs its OWN full SLAM stack.

Usage:
    python examples/run_multirobot_slam.py --cpu --steps 120

Reference capability: the full multi-robot launch (`multi_launch_nodes.sh` +
`multirobot_send_current_goal`, SURVEY.md §2.3 E17/E1): scout_1/scout_2 each
run their own ORB-SLAM3 + traversability + exploration processes and share
their current goals so the fleet spreads out. Here each rover owns a complete
ActiveSlamSystem (stereo frontend, backend step, cloud fusion, FI-gated
exploration, EKF) and the goal-sharing seam is the `peer_goals` callback —
peers' active goals act as blacklist circles in frontier selection, exactly
the reference's service semantics. Prints per-robot SLAM stats and fleet
coverage; the union of the rovers' traversability maps is the fleet map.
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fleet_cfg(W, H):
    from fitslam_tpu.utils.config import FitSlamConfig

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


def build_rover(cfg, spec, world3d, start, peer_goal_fn):
    """One complete rover: sim body + nav stack + full ActiveSlamSystem."""
    from fitslam_tpu.models import sim_robot as simr
    from fitslam_tpu.models.active_slam import ActiveSlamSystem
    from fitslam_tpu.models.sim_nav import SimNavInterface

    robot = simr.DiffDriveRobot(x=start[0], y=start[1], yaw=start[2],
                                v_max=0.8, w_max=1.0)
    box = {}
    nav = SimNavInterface(cfg, spec, robot, lambda: box["s"].occupancy(),
                          dt=0.15)
    nav.controller.max_omega = 0.9
    system = ActiveSlamSystem(
        cfg, spec, nav,
        get_robot_pose=lambda: box["s"].estimated_robot_pose(),
        peer_goals=peer_goal_fn,
    )
    box["s"] = system
    return robot, nav, system


def run_fleet(n_robots, steps, seed=3, W=320, H=240, verbose=True):
    """Run `n_robots` full-SLAM rovers for `steps` frames; returns
    (systems, robots, fleet_coverage_curve)."""
    import jax
    import numpy as np

    from fitslam_tpu.data import synthetic
    from fitslam_tpu.models import sim_robot as simr
    from fitslam_tpu.models.active_slam import camera_pose_from_robot
    from fitslam_tpu.ops import grid as gr
    from fitslam_tpu.ops.geometry import Intrinsics

    spec = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)
    cfg = fleet_cfg(W, H)
    K = Intrinsics.from_config(cfg.camera)
    occ_gt = simr.make_rooms_world(spec, seed=seed)
    world3d = synthetic.world_from_occupancy(
        occ_gt, spec, jax.random.PRNGKey(5), wall_height=2.0,
        points_per_wall_cell=4, floor_points=4000)

    starts = [(-5.0, -5.0, 0.3), (5.0, 5.0, -2.6), (-5.0, 5.0, -0.8)]
    fleet = []

    def peers_of(i):
        # the reference's multirobot_send_current_goal: peers' current goals
        def get():
            return [fleet[j][2].explorer._goal_xy
                    for j in range(len(fleet)) if j != i]
        return get

    for i in range(n_robots):
        fleet.append(build_rover(cfg, spec, world3d, starts[i], peers_of(i)))

    coverage = []
    for step in range(steps):
        for (robot, nav, system) in fleet:
            cam = camera_pose_from_robot(robot.x, robot.y, robot.yaw)
            if step == 0:
                system.set_world_anchor(cam)
            left, right = synthetic.render_stereo(K, world3d, cam, width=W,
                                                  height=H, max_depth=12.0)
            cloud, cvalid = synthetic.frustum_cloud(
                K, world3d, cam,
                max_points=cfg.traversability.max_points_per_cloud,
                max_depth=8.0, width=W, height=H)
            system.process_frame(left, right, cloud, cvalid)
            if step % 4 == 3:
                system.tick_exploration()
            nav.step()
        if step % 4 == 3:
            known = np.zeros((spec.size, spec.size), bool)
            for (_, _, system) in fleet:
                known |= np.asarray(system.occupancy()) != gr.UNKNOWN
            coverage.append(float(known.mean()))
            if verbose and step % 20 == 19:
                print(f"[fleet] step {step + 1}: union coverage "
                      f"{coverage[-1]:.3f}")
    return fleet, coverage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=2)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    fleet, coverage = run_fleet(args.robots, args.steps)
    print(f"[fleet] final union coverage: {coverage[-1]:.3f}")
    for i, (robot, nav, system) in enumerate(fleet):
        m = system.slam.map
        d = system.explorer.diag
        print(f"[rover {i}] keyframes={int(m.n_kf)} landmarks={int(m.n_lm)} "
              f"goals_sent={d.goals_sent} "
              f"pos=({robot.x:+.1f},{robot.y:+.1f})")


if __name__ == "__main__":
    main()
