"""Run stereo SLAM over an on-disk PGM sequence through the NATIVE runtime.

This is the camera-driver/rosbag seam of the reference (orb_slam3 wrapper
fed by image topics, SURVEY.md §2.1 S2) closed with the native C++ host
runtime (native/runtime.cc): a prefetching PGM sequence reader pulls frames
off disk on its own thread (never holding the GIL across IO) while the TPU
chews on the previous frame, and a ns-resolution native event log records
the read/compute overlap, exported as CSV (the reference's EventLogger CSV
export, event_logger.cpp:14-24 — commented out there, working here).

Usage:
    python examples/run_dataset.py --record /tmp/seq --frames 60   # synthesize
    python examples/run_dataset.py --dataset /tmp/seq --cpu        # run it
    python examples/run_dataset.py --frames 40 --cpu               # both
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def record_sequence(out_dir: Path, n_frames: int, W: int, H: int, cfg, seed=0):
    """Render a synthetic stereo corridor sequence to PGM files + GT poses
    (the rosbag-recording analog; slam_keyframe_pcl_simulator territory)."""
    import jax
    import numpy as np

    from fitslam_tpu.data import synthetic
    from fitslam_tpu.ops import lie
    from fitslam_tpu.ops.geometry import Intrinsics
    from fitslam_tpu.runtime.native import write_pgm

    K = Intrinsics.from_config(cfg.camera)
    world = synthetic.corridor_world(jax.random.PRNGKey(seed), num=3000,
                                     length=30.0, width=5.0)
    T_gt = synthetic.straight_trajectory(n_frames, length=n_frames * 0.15,
                                         height=1.2, start_x=0.5)
    (out_dir / "left").mkdir(parents=True, exist_ok=True)
    (out_dir / "right").mkdir(parents=True, exist_ok=True)
    gt = []
    for i in range(n_frames):
        Ti = lie.SE3(T_gt.R[i], T_gt.t[i])
        l, r = synthetic.render_stereo(K, world, Ti, width=W, height=H,
                                       max_depth=12.0)
        # renderer output is already 0..255 luminance
        write_pgm(str(out_dir / "left" / f"{i:06d}.pgm"), np.asarray(l))
        write_pgm(str(out_dir / "right" / f"{i:06d}.pgm"), np.asarray(r))
        gt.append(np.asarray(Ti.matrix()))
    np.save(out_dir / "gt_poses.npy", np.stack(gt))
    print(f"[dataset] recorded {n_frames} stereo frames -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="")
    ap.add_argument("--record", type=str, default="")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--prefetch", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fitslam_tpu.models.slam import StereoSlam
    from fitslam_tpu.runtime.native import (NativeEventLog, PgmSequenceReader,
                                            load_library)
    from fitslam_tpu.utils import evaluation as ev
    from fitslam_tpu.utils.config import FitSlamConfig

    if load_library() is None:
        print("[dataset] native runtime unavailable (no g++?)", file=sys.stderr)
        return 2

    W, H = 320, 240
    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, width=W, height=H, fx=200.0,
                                   fy=200.0, cx=W / 2, cy=H / 2, baseline=0.2),
        orb=dataclasses.replace(cfg.orb, num_features=512, num_levels=2,
                                fast_threshold=12.0),
        tracking=dataclasses.replace(cfg.tracking, min_inliers=10,
                                     keyframe_min_interval=2,
                                     keyframe_translation=0.3),
        mapping=dataclasses.replace(cfg.mapping, max_keyframes=64,
                                    max_landmarks=4096, max_observations=12288,
                                    local_window=4, ba_iters=3),
        loop=dataclasses.replace(cfg.loop, enabled=False),
    )

    seq_dir = Path(args.dataset or args.record or "/tmp/fitslam_seq")
    if args.record or not (seq_dir / "left").exists():
        record_sequence(seq_dir, args.frames, W, H, cfg)
        if args.record and not args.dataset:
            return 0

    # native prefetching readers: IO thread per camera, frames pulled ahead
    # of the consumer
    left_rd = PgmSequenceReader(seq_dir / "left", prefetch=args.prefetch)
    right_rd = PgmSequenceReader(seq_dir / "right", prefetch=args.prefetch)
    assert (left_rd.width, left_rd.height) == (W, H), "sequence size mismatch"
    evlog = NativeEventLog()

    slam = StereoSlam(cfg)
    n = min(left_rd.count, right_rd.count)
    print(f"[dataset] {n} frames @ {W}x{H} from {seq_dir} "
          f"(native prefetch={args.prefetch}) on {jax.devices()[0].platform}")
    t0 = None
    for i, (l8, r8) in enumerate(zip(left_rd, right_rd)):
        e = evlog.begin("h2d")
        l = jnp.asarray(l8, jnp.float32)
        r = jnp.asarray(r8, jnp.float32)
        evlog.end(e)
        e = evlog.begin("slam_step")
        slam.process_frame(l, r)
        evlog.end(e)
        if i == 0:
            t0 = time.monotonic()
    wall = time.monotonic() - (t0 or time.monotonic())
    fps = (n - 1) / max(wall, 1e-9)

    gt_path = seq_dir / "gt_poses.npy"
    ate = None
    if gt_path.exists():
        gt = list(np.load(gt_path))[:n]
        ate = ev.ate_rmse(slam.trajectory, gt)
    csv_path = seq_dir / "events.csv"
    n_events = evlog.export_csv(str(csv_path))
    print(f"[dataset] throughput = {fps:.2f} frames/s; keyframes = "
          f"{int(slam.map.n_kf)}"
          + (f"; ATE RMSE = {ate * 100:.1f} cm" if ate is not None else ""))
    print(f"[dataset] native event log: {n_events} spans -> {csv_path}")
    left_rd.close()
    right_rd.close()
    evlog.close()
    if ate is not None and ate > 0.5:
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
