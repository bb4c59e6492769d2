"""Run stereo visual SLAM on a synthetic corridor sequence.

Usage:
    python examples/run_vo.py --frames 24 --cpu          # small CPU run
    python examples/run_vo.py --frames 100               # TPU run

Prints per-frame tracking stats, final ATE vs ground truth, and the
profiler's module-level timing table (the EventLogger analog of the
reference's per-BT-iteration timings, SURVEY.md §5).
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--features", type=int, default=512)
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--dataset", type=str, default="",
                    help="directory with left/ and right/ PGM sequences; "
                         "frames stream through the native prefetch reader")
    ap.add_argument("--export-dataset", type=str, default="",
                    help="render the synthetic sequence to PGM files here "
                         "and exit (creates left/ and right/)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fitslam_tpu.data import synthetic
    from fitslam_tpu.models.slam import StereoSlam
    from fitslam_tpu.ops import lie
    from fitslam_tpu.ops.geometry import Intrinsics
    from fitslam_tpu.utils import evaluation as ev
    from fitslam_tpu.utils.config import FitSlamConfig

    W, H = args.width, args.height
    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(
            cfg.camera, width=W, height=H, fx=0.625 * W, fy=0.625 * W,
            cx=W / 2, cy=H / 2, baseline=0.2,
        ),
        orb=dataclasses.replace(
            cfg.orb, num_features=args.features, num_levels=args.levels,
            fast_threshold=12.0,
        ),
        tracking=dataclasses.replace(
            cfg.tracking, min_inliers=12, keyframe_min_interval=2,
            keyframe_translation=0.3,
        ),
        mapping=dataclasses.replace(
            cfg.mapping, max_keyframes=64, max_landmarks=4096,
            max_observations=16384, local_window=4, ba_iters=4,
        ),
    )
    K = Intrinsics.from_config(cfg.camera)

    key = jax.random.PRNGKey(42)
    world = synthetic.corridor_world(key, num=1500, length=30.0, width=5.0)
    T_gt = synthetic.straight_trajectory(args.frames, length=args.frames * 0.17,
                                         height=1.2, start_x=0.5)

    if args.export_dataset:
        from pathlib import Path as _P

        from fitslam_tpu.runtime import write_pgm

        ldir = _P(args.export_dataset) / "left"
        rdir = _P(args.export_dataset) / "right"
        ldir.mkdir(parents=True, exist_ok=True)
        rdir.mkdir(parents=True, exist_ok=True)
        for i in range(args.frames):
            left, right = synthetic.render_stereo(
                K, world, lie.SE3(T_gt.R[i], T_gt.t[i]), width=W, height=H)
            write_pgm(str(ldir / f"{i:06d}.pgm"), np.asarray(left))
            write_pgm(str(rdir / f"{i:06d}.pgm"), np.asarray(right))
        print(f"[run_vo] exported {args.frames} stereo PGM pairs -> "
              f"{args.export_dataset}")
        return 0

    readers = None
    if args.dataset:
        from fitslam_tpu.runtime import PgmSequenceReader

        readers = (PgmSequenceReader(args.dataset + "/left", prefetch=8),
                   PgmSequenceReader(args.dataset + "/right", prefetch=8))
        args.frames = min(args.frames, readers[0].count)
        assert (readers[0].width, readers[0].height) == (W, H), \
            "dataset resolution must match --width/--height"

    slam = StereoSlam(cfg)

    src = f"dataset {args.dataset} (native prefetch)" if readers else "synthetic"
    print(f"[run_vo] {args.frames} frames @ {W}x{H}, {args.features} features, "
          f"{args.levels} pyramid levels on {jax.devices()[0].platform}; {src}")
    t0 = None
    for i in range(args.frames):
        if readers:
            left = jnp.asarray(next(readers[0]), jnp.float32)
            right = jnp.asarray(next(readers[1]), jnp.float32)
        else:
            left, right = synthetic.render_stereo(K, world, lie.SE3(T_gt.R[i], T_gt.t[i]), width=W, height=H)
        jax.block_until_ready(left)
        if i == 1:
            t0 = time.monotonic()  # skip frame 0 (compile)
        info = slam.process_frame(left, right)
        tag = "KF" if info["keyframe"] else "  "
        if i % 5 == 0 or info["keyframe"]:
            print(f"  frame {i:4d} {tag} inliers={info.get('n_inliers', 0):4d} "
                  f"lost={info['lost'] if 'lost' in info else False}")
    wall = time.monotonic() - (t0 or time.monotonic())
    fps = (args.frames - 1) / max(wall, 1e-9)

    gt = [np.asarray(lie.SE3(T_gt.R[i], T_gt.t[i]).matrix()) for i in range(args.frames)]
    ate = ev.ate_rmse(slam.trajectory, gt)
    print(f"\n[run_vo] keyframes={int(slam.map.n_kf)} landmarks={int(slam.map.n_lm)} "
          f"observations={int(slam.map.n_obs)}")
    print(f"[run_vo] ATE RMSE = {ate * 100:.2f} cm over {ev.path_length(gt):.1f} m")
    print(f"[run_vo] throughput = {fps:.2f} frames/s (excl. first-frame compile)")
    print()
    print(slam.log.summary())
    if ate > 0.2:
        print("[run_vo] WARNING: ATE above 20 cm bound")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
