"""Per-frame device-cost attribution for the loop-bench config (r05).

The loop bench is device-bound at ~22 ms/frame (polls are just barriers
draining compute, tools/diag_loop_perf.py). This probe measures the async
frame path's device throughput under config ablations: landmark capacity
(the matcher/association work scales with L) and keyframe insertion
(local BA + spawn + cull on every 2nd frame on the ring).

Usage: python tools/diag_frame_cost.py [n_frames]
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


def measure(name, cfg, frames, seg=0):
    def run():
        slam = StereoSlam(cfg)
        slam.process_frame_async(*frames[0])
        device_sync(slam.outs_log[-1].pose_wc)
        t0 = time.monotonic()
        segs = []
        t_seg = t0
        for k, f in enumerate(frames[1:]):
            outs = slam.process_frame_async(*f)
            if seg and (k + 1) % seg == 0:
                device_sync(outs.pose_wc)
                now = time.monotonic()
                segs.append(seg / (now - t_seg))
                t_seg = now
        device_sync(outs.pose_wc)
        return (len(frames) - 1) / (time.monotonic() - t0), slam, segs

    run()
    fps, slam, segs = run()
    print(f"{name:44s} {fps:7.1f} fps  ({1000/fps:5.1f} ms/frame) "
          f"n_kf={int(slam.map.n_kf)} n_lm={int(slam.map.n_lm)}", flush=True)
    if segs:
        print("   segments: " + " ".join(f"{s:.0f}" for s in segs),
              flush=True)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    base, (W, H) = _slam_cfg(False)
    base = dataclasses.replace(
        base, loop=dataclasses.replace(base.loop, enabled=False))
    K = Intrinsics.from_config(base.camera)
    T_ring = synthetic.loop_trajectory(200, radius=8.0)
    world = synthetic.ring_world(jax.random.PRNGKey(1), num=5000,
                                 radius=8.0, width=5.0)
    frames = [synthetic.render_stereo(K, world,
                                      lie.SE3(T_ring.R[i], T_ring.t[i]),
                                      width=W, height=H, max_depth=14.0)
              for i in range(n_frames)]

    no_kf = dataclasses.replace(
        base, tracking=dataclasses.replace(
            base.tracking, keyframe_min_interval=10**6))
    small_map = dataclasses.replace(
        base, mapping=dataclasses.replace(base.mapping, max_landmarks=8192,
                                          max_observations=32768))
    small_no_kf = dataclasses.replace(
        small_map, tracking=dataclasses.replace(
            small_map.tracking, keyframe_min_interval=10**6))
    loop_on = dataclasses.replace(
        base, loop=dataclasses.replace(base.loop, enabled=True,
                                       min_gap_keyframes=15))

    measure("bench config (L=20480, KF on)", base, frames, seg=24)
    measure("L=8192, KF on", small_map, frames, seg=24)


if __name__ == "__main__":
    main()
