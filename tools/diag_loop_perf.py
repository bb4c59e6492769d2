"""Loop-bench wall-clock breakdown (r05): where do the non-frame
milliseconds go — poll readbacks, loop corrections, or device compute?

Runs the exact bench_loop_slam loop for one seed and accounts wall time
into: frame dispatch, poll readback (minus correction time inside the
poll), and loop corrections (on_keyframe when it closes a loop).

Usage: python tools/diag_loop_perf.py [seed]
"""

import sys
import time
import dataclasses

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench_suite import _slam_cfg
from fitslam_tpu.data import synthetic
from fitslam_tpu.models.slam import StereoSlam
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.utils.profiling import device_sync


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_frames = 200
    cfg, (W, H) = _slam_cfg(False)
    cfg = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, enabled=True,
                                      min_gap_keyframes=15, min_score=0.22,
                                      consistency_threshold=2,
                                      min_matches=40))
    K = Intrinsics.from_config(cfg.camera)
    T_ring = synthetic.loop_trajectory(n_frames, radius=8.0)
    overlap = max(4, n_frames // 25)
    T_gt = lie.SE3(
        jnp.concatenate([T_ring.R, T_ring.R[:overlap]]),
        jnp.concatenate([T_ring.t, T_ring.t[:overlap]]),
    )
    n_total = n_frames + overlap
    world = synthetic.ring_world(jax.random.PRNGKey(seed), num=5000,
                                 radius=8.0, width=5.0)
    frames = [synthetic.render_stereo(K, world, lie.SE3(T_gt.R[i], T_gt.t[i]),
                                      width=W, height=H, max_depth=14.0)
              for i in range(n_total)]

    POLL = 4

    def run(measure):
        slam = StereoSlam(cfg)
        # instrument on_keyframe to time corrections separately
        t_corr = [0.0]
        orig = slam.loop_closer.on_keyframe

        def timed(s, kf_idx, cand_idx=None, score=None):
            t0 = time.monotonic()
            r = orig(s, kf_idx, cand_idx=cand_idx, score=score)
            t_corr[0] += time.monotonic() - t0
            return r

        slam.loop_closer.on_keyframe = timed

        slam.process_frame_async(*frames[0])
        device_sync(slam.outs_log[-1].pose_wc)
        t_start = time.monotonic()
        t_disp = 0.0
        t_poll = 0.0
        for i in range(1, n_total):
            t0 = time.monotonic()
            outs = slam.process_frame_async(*frames[i])
            t_disp += time.monotonic() - t0
            if i % POLL == 0:
                t0 = time.monotonic()
                slam.poll_keyframe_events(flush=False)
                t_poll += time.monotonic() - t0
        t0 = time.monotonic()
        slam.poll_keyframe_events()
        t_poll += time.monotonic() - t0
        t0 = time.monotonic()
        device_sync(outs.pose_wc)
        t_drain = time.monotonic() - t0
        wall = time.monotonic() - t_start
        if measure:
            n_polls = (n_total - 1) // POLL + 1
            print(f"seed={seed} wall={wall:.3f}s fps={(n_total-1)/wall:.1f}")
            print(f"  frame dispatch : {t_disp:.3f}s")
            print(f"  polls ({n_polls:3d})    : {t_poll:.3f}s "
                  f"({1000*t_poll/n_polls:.1f} ms each, incl corrections)")
            print(f"  corrections    : {t_corr[0]:.3f}s "
                  f"({len(slam.loop_events)} loops)")
            print(f"  final drain    : {t_drain:.3f}s")

    run(measure=False)
    run(measure=True)


if __name__ == "__main__":
    main()
