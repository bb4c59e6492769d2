"""Run the full active-SLAM loop on a simulated rooms world.

Usage:
    python examples/run_active_slam.py --cpu --frames 60     # small CPU run
    python examples/run_active_slam.py --frames 160          # TPU run

The complete stack of the reference's `active_slam` launch mode in one
process (SURVEY.md §3.1): stereo SLAM -> per-keyframe clouds -> traversability
grid -> frontier exploration with the Fisher-information gate -> simulated
Nav2 + rover. Prints the coverage-vs-time curve (explored_map_counter
equivalent), ATE, keyframes, and exploration diagnostics. Optionally
checkpoints the full system state at the end (--checkpoint PATH).
"""

import argparse
import dataclasses
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=110)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--checkpoint", type=str, default="")
    ap.add_argument("--record", type=str, default="",
                    help="directory for run artifacts: streams npz, coverage "
                         "CSV, rendered world PPMs (RosVisualizer parity)")
    ap.add_argument("--bootstrap", action="store_true",
                    help="run the InitializationSequence wiggle first")
    ap.add_argument("--live", type=int, default=-1, metavar="PORT",
                    help="serve a live inspection page on this port "
                         "(0 = auto; the RViz-panel analog)")
    ap.add_argument("--ekf", action="store_true",
                    help="enable the dual-EKF + twist-mux state-estimation "
                         "layer (ekf_with_gps.yaml / twist_mux.yaml parity)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fitslam_tpu.data import synthetic
    from fitslam_tpu.models import sim_robot as simr
    from fitslam_tpu.models.active_slam import ActiveSlamSystem, camera_pose_from_robot
    from fitslam_tpu.models.sim_nav import SimNavInterface
    from fitslam_tpu.ops import grid as gr
    from fitslam_tpu.ops.geometry import Intrinsics
    from fitslam_tpu.utils import evaluation as ev
    from fitslam_tpu.utils.config import FitSlamConfig

    W, H = 320, 240
    SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)
    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
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
        exploration_bt=dataclasses.replace(cfg.exploration_bt,
                                           bootstrap_enabled=args.bootstrap),
        localization=dataclasses.replace(cfg.localization, enabled=args.ekf),
    )
    K = Intrinsics.from_config(cfg.camera)
    occ_gt = simr.make_rooms_world(SPEC, seed=args.seed)
    world3d = synthetic.world_from_occupancy(
        occ_gt, SPEC, jax.random.PRNGKey(5), wall_height=2.0,
        points_per_wall_cell=4, floor_points=4000,
    )
    robot = simr.DiffDriveRobot(x=-5.0, y=-5.0, yaw=0.3, v_max=0.8, w_max=1.0)
    box = {}
    from fitslam_tpu.models.localization import TwistMux

    nav = SimNavInterface(
        cfg, SPEC, robot, lambda: box["s"].occupancy(), dt=0.15,
        get_overlay=lambda: box["s"].explorer.lethal_overlay,
        twist_mux=TwistMux() if args.ekf else None,
    )
    nav.controller.max_omega = 0.9
    system = ActiveSlamSystem(cfg, SPEC, nav,
                              get_robot_pose=lambda: box["s"].estimated_robot_pose())
    box["s"] = system

    from fitslam_tpu.utils import viz

    rec = viz.ArtifactRecorder(enabled=bool(args.record) or args.live >= 0)

    live = None
    if args.live >= 0:
        from fitslam_tpu.utils.liveview import LiveView

        ex = system.explorer
        live = LiveView(
            rec,
            get_status=lambda: {
                "state": ex.state.name, "tick": ex.diag.ticks,
                "goals_sent": ex.diag.goals_sent,
                "keyframes": int(system.slam.map.n_kf),
                "robot": [round(robot.x, 2), round(robot.y, 2)],
            },
            on_pause=ex.pause, on_resume=ex.resume,
        )
        port = live._port = args.live
        port = live.start()
        print(f"[active_slam] live view: http://127.0.0.1:{port}/")

    print(f"[active_slam] {args.frames} frames @ {W}x{H} on "
          f"{jax.devices()[0].platform}; world seed {args.seed}")
    gt_traj = []
    coverage = []
    t0 = None
    for step in range(args.frames):
        cam = camera_pose_from_robot(robot.x, robot.y, robot.yaw)
        if step == 0:
            system.set_world_anchor(cam)
        left, right = synthetic.render_stereo(K, world3d, cam, width=W,
                                              height=H, max_depth=12.0)
        cloud, cvalid = synthetic.frustum_cloud(
            K, world3d, cam, max_points=cfg.traversability.max_points_per_cloud,
            max_depth=8.0, width=W, height=H,
        )
        jax.block_until_ready(left)
        if step == 1:
            t0 = time.monotonic()
        system.process_frame(left, right, cloud, cvalid)
        gt_traj.append(np.asarray(cam.matrix()))
        if step % 4 == 3:
            system.tick_exploration()
        nav.step()
        occ_now = np.asarray(system.occupancy())
        known = occ_now != gr.UNKNOWN
        coverage.append(ev.coverage_fraction(known))
        if rec.enabled:
            t = step * 0.15
            rec.publish_pose(np.array([robot.x, robot.y, robot.yaw]), t)
            rec.record_coverage(occ_now, t)
            if system.explorer.current_goal is not None:
                rec.publish("goal", system.explorer.current_goal, t)
            # live-view streams (latest-only consumers)
            rec.publish("occupancy", occ_now, t)
            cell, _ = SPEC.world_to_cell(jnp.asarray([robot.x, robot.y]))
            rec.publish("robot_cell", np.asarray(cell), t)
        if step % 10 == 0:
            print(f"  step {step:4d} coverage={coverage[-1]:.3f} "
                  f"kf={int(system.slam.map.n_kf)} "
                  f"goals={system.explorer.diag.goals_sent} "
                  f"state={system.explorer.state.name}")
    wall = time.monotonic() - (t0 or time.monotonic())
    fps = (args.frames - 1) / max(wall, 1e-9)
    system.finalize()   # drain async keyframe events + materialize trajectory

    anchored = [gt_traj[0] @ T for T in system.slam.trajectory]
    ate = ev.ate_rmse(anchored, gt_traj, align=False)
    d = system.explorer.diag
    print(f"\n[active_slam] coverage curve (every 10 frames): "
          f"{[round(c, 3) for c in coverage[::10]]}")
    print(f"[active_slam] final coverage = {coverage[-1]:.3f}; "
          f"ATE RMSE = {ate * 100:.1f} cm; keyframes = {int(system.slam.map.n_kf)}")
    print(f"[active_slam] goals={d.goals_sent} replans={d.replans} "
          f"fi_rejections={d.fi_rejections} recoveries={d.recoveries} "
          f"blacklisted={d.blacklisted}")
    print(f"[active_slam] throughput = {fps:.2f} frames/s (full loop incl. "
          f"exploration ticks, excl. first-frame compile)")
    print()
    print(system.log.summary())
    if args.checkpoint:
        from fitslam_tpu.utils import checkpoint as ckpt

        ckpt.save_active_system(args.checkpoint, system)
        print(f"[active_slam] checkpointed full system -> {args.checkpoint}")
    if rec.enabled:
        out = Path(args.record)
        rec.export_npz(str(out / "streams.npz"))
        rec.export_coverage_csv(str(out / "coverage.csv"))
        occ_now = np.asarray(system.occupancy())
        rcell, _ = SPEC.world_to_cell(jnp.array([robot.x, robot.y]))
        viz.render_world_ppm(
            occ_now, str(out / "world.ppm"),
            robot_cell=(int(rcell[0]), int(rcell[1])),
            roadmap_cells=np.asarray(
                SPEC.world_to_cell(system.explorer.roadmap.xy)[0]
            )[np.asarray(system.explorer.roadmap.valid)],
        )
        viz.grid_to_pgm(occ_now, str(out / "map.pgm"))
        print(f"[active_slam] artifacts -> {out}/ (streams.npz, coverage.csv, "
              f"world.ppm, map.pgm)")
    if ate > 0.5:
        print("[active_slam] WARNING: ATE above 50 cm bound")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
