"""Benchmark: end-to-end stereo SLAM frames/s per chip on a synthetic corridor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (suchetanrs/FIT-SLAM) publishes no numbers
(BASELINE.md); its SLAM layer is ORB-SLAM3 tracking at camera rate on CPU
(~30 fps nominal). The driver target is >=2x reference CPU frames/s per chip,
so vs_baseline is measured against 60 fps.
"""

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
# persistent compile cache: first-ever run pays remote compiles (~5 min),
# later runs start hot
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

BASELINE_FPS = 60.0  # 2x nominal 30 fps CPU reference tracking rate
W, H = 640, 480
N_FRAMES = 60
N_FEATURES = 1024
N_LEVELS = 4


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fitslam_tpu.data import synthetic
    from fitslam_tpu.models.slam import StereoSlam
    from fitslam_tpu.ops import lie
    from fitslam_tpu.ops.geometry import Intrinsics
    from fitslam_tpu.utils import evaluation as ev
    from fitslam_tpu.utils.config import FitSlamConfig

    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(
            cfg.camera, width=W, height=H, fx=0.625 * W, fy=0.625 * W,
            cx=W / 2, cy=H / 2, baseline=0.2,
        ),
        orb=dataclasses.replace(
            cfg.orb, num_features=N_FEATURES, num_levels=N_LEVELS,
            fast_threshold=12.0,
        ),
        # keyframe policy at the knee of the measured KF-rate/ATE trade
        # curve (BENCH_NOTES.md r04): KF every ~5 frames with a 6-KF covis
        # BA window (3 accept/reject GN iters) + the track-refine pass holds
        # ATE under the 0.01 m bar at 1.56x the r03 every-2-frames cadence
        tracking=dataclasses.replace(
            cfg.tracking, min_inliers=12, keyframe_min_interval=2,
            keyframe_translation=0.75,
        ),
        mapping=dataclasses.replace(
            cfg.mapping, max_keyframes=64, max_landmarks=8192,
            max_observations=32768, local_window=6, ba_iters=3,
        ),
    )
    K = Intrinsics.from_config(cfg.camera)

    key = jax.random.PRNGKey(42)
    world = synthetic.corridor_world(key, num=3000, length=40.0, width=5.0)
    T_gt = synthetic.straight_trajectory(N_FRAMES, length=N_FRAMES * 0.15,
                                         height=1.2, start_x=0.5)

    from fitslam_tpu.utils.profiling import device_sync

    frames = []
    for i in range(N_FRAMES):
        l, r = synthetic.render_stereo(
            K, world, lie.SE3(T_gt.R[i], T_gt.t[i]), width=W, height=H,
        )
        frames.append((l, r))
    device_sync(frames[-1])

    # pass 1 (uncounted): compiles every code path. device_sync (a real
    # device->host readback) is the ONLY true barrier on this backend:
    # jax.block_until_ready returns at dispatch-accept, not completion —
    # r01/r02 "frames/s" numbers timed with it measured dispatch rate, not
    # compute (BENCH_NOTES.md has the full post-mortem).
    warm = StereoSlam(cfg)
    for i in range(N_FRAMES):
        warm.process_frame_async(*frames[i])
    device_sync(warm.outs_log[-1].pose_wc)

    # pass 2 (measured): fresh SLAM state, fully warm executables; frames are
    # dispatched without per-frame syncs and the clock stops on a true
    # barrier against the final frame's output (which data-depends on the
    # whole chain of map/tracker state). Best of 2 reps: single-shot wall
    # clock through the tunnel jitters ~8% run-to-run.
    fps = 0.0
    for _rep in range(2):
        slam = StereoSlam(cfg)
        slam.process_frame_async(*frames[0])
        device_sync(slam.outs_log[-1].pose_wc)
        t0 = time.monotonic()
        for i in range(1, N_FRAMES):
            outs = slam.process_frame_async(*frames[i])
        device_sync(outs.pose_wc)
        wall = time.monotonic() - t0
        fps = max(fps, (N_FRAMES - 1) / wall)

    # only now do readbacks (ATE evaluation etc.)
    slam.finalize()
    gt = [np.asarray(lie.SE3(T_gt.R[i], T_gt.t[i]).matrix()) for i in range(N_FRAMES)]
    ate = ev.ate_rmse(slam.trajectory, gt)

    # loop-closure pass recorded alongside the corridor headline (VERDICT
    # r03 #7): a ring trajectory that actually fires detect->verify->PGO->GBA,
    # so the committed perf artifact exercises the full loop-closing path
    from bench_suite import bench_loop_slam

    loop = bench_loop_slam(small=False, n_frames=150, as_dict=True)

    print(
        json.dumps(
            {
                "metric": "stereo_slam_frames_per_s_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "extra": {
                    "ate_rmse_m": round(ate, 4),
                    "n_keyframes": int(slam.map.n_kf),
                    "n_landmarks": int(slam.map.n_lm),
                    "resolution": f"{W}x{H}",
                    "features": N_FEATURES,
                    "levels": N_LEVELS,
                    "platform": jax.devices()[0].platform,
                    "loop_slam": {
                        "frames_per_s_per_chip": round(loop["value"], 3),
                        **loop["extra"],
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
