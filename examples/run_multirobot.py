"""Multi-robot shared-map exploration demo (SURVEY.md §2.3 E17).

Usage:
    python examples/run_multirobot.py --cpu --robots 3 --steps 150

The reference's multi-robot story (scout_1/scout_2 namespaces sharing goals
via the `multirobot_send_current_goal` service + Hungarian/MinPos allocation,
`frontier_multirobot_allocator`): here one MultiRobotCoordinator runs ONE
frontier search, ONE cost matrix (a wavefront potential per robot), and ONE
assignment per tick on the shared map; each rover follows its goal with the
simulated Nav2 stack. Prints per-robot path length and the fleet coverage
curve; optionally renders the final world (--record DIR).
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", type=int, default=2)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=2)
    ap.add_argument("--allocator", default="hungarian",
                    choices=["hungarian", "minpos"])
    ap.add_argument("--record", type=str, default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fitslam_tpu.models import allocation as al
    from fitslam_tpu.models import sim_robot as sim
    from fitslam_tpu.models.sim_nav import SimNavInterface
    from fitslam_tpu.ops import grid as gr
    from fitslam_tpu.utils.config import FitSlamConfig
    from fitslam_tpu.utils.evaluation import coverage_fraction, path_length

    SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)
    cfg = dataclasses.replace(
        FitSlamConfig(),
        nav=dataclasses.replace(FitSlamConfig().nav, wavefront_iters=192,
                                desired_speed=1.0),
        multi_robot=dataclasses.replace(FitSlamConfig().multi_robot,
                                        allocator=args.allocator),
    )
    gt = jnp.asarray(sim.make_rooms_world(SPEC, seed=args.seed))
    state = {"explored": jnp.full((SPEC.size, SPEC.size), gr.UNKNOWN, jnp.uint8)}

    starts = [(-5.0, -5.0, 0.0), (5.0, 5.0, 3.0), (-5.0, 5.0, -1.5),
              (5.0, -5.0, 1.5)]
    robots = [
        sim.DiffDriveRobot(x=x, y=y, yaw=a, v_max=1.2, w_max=2.5)
        for x, y, a in starts[: args.robots]
    ]
    navs = [SimNavInterface(cfg, SPEC, r, lambda: state["explored"], dt=0.15)
            for r in robots]
    for n in navs:
        n.controller.max_omega = 2.0
    coord = al.MultiRobotCoordinator(
        cfg, SPEC, lambda: state["explored"], navs,
        get_poses=lambda: [(r.xy, r.yaw) for r in robots],
    )

    print(f"[multirobot] {len(robots)} rovers, allocator={args.allocator}, "
          f"world seed {args.seed}, on {jax.devices()[0].platform}")
    coverage = []
    t0 = time.monotonic()
    for step in range(args.steps):
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
        known = np.asarray(state["explored"]) != gr.UNKNOWN
        coverage.append(coverage_fraction(known))
        if step % 20 == 0:
            print(f"  step {step:4d} coverage={coverage[-1]:.3f} "
                  f"done={coord.done}")
        if coord.done:
            break
    wall = time.monotonic() - t0

    print(f"\n[multirobot] coverage curve (every 10 steps): "
          f"{[round(c, 3) for c in coverage[::10]]}")
    print(f"[multirobot] final coverage = {coverage[-1] if coverage else 0.0:.3f} "
          f"in {len(coverage)} steps ({wall:.1f} s wall)")
    for i, r in enumerate(robots):
        traj = [(x, y, 0.0) for x, y, _ in r.trajectory]
        print(f"[multirobot] rover {i}: path length = "
              f"{path_length(np.array(traj)):.1f} m")
    if args.record:
        from fitslam_tpu.utils import viz

        out = Path(args.record)
        occ = np.asarray(state["explored"])
        cells = [SPEC.world_to_cell(jnp.asarray(r.xy, jnp.float32))[0]
                 for r in robots]
        viz.render_world_ppm(
            occ, str(out / "fleet.ppm"),
            robot_cell=(int(cells[0][0]), int(cells[0][1])),
            roadmap_cells=np.array([[int(c[0]), int(c[1])] for c in cells[1:]])
            if len(cells) > 1 else None,
        )
        print(f"[multirobot] artifacts -> {out}/fleet.ppm")
    return 0 if coverage and coverage[-1] > 0.3 else 1


if __name__ == "__main__":
    raise SystemExit(main())
