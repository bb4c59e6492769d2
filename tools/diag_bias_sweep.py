"""Front-end translation-scale-bias sweep on the ring (r05).

The ring carries a systematic ~-1.4% per-step translation bias that the
straight corridor does NOT show — it is rotation-coupled. This harness
runs a no-loop ring arc under one-knob-at-a-time variations of the
tracking/mapping front-end and reports the per-step translation scale
(median est-step/gt-step) plus ATE, isolating which stage injects the
bias.

Usage: python tools/diag_bias_sweep.py [seed] [n_frames]
"""

import sys
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
from fitslam_tpu.utils import evaluation as ev


def run_variant(name, cfg, frames, gt):
    slam = StereoSlam(cfg)
    for f in frames:
        slam.process_frame_async(*f)
    slam.finalize()
    pe = np.stack([np.asarray(T)[:3, 3] for T in slam.trajectory])
    pg = np.stack([g[:3, 3] for g in gt[:len(pe)]])
    de = np.linalg.norm(np.diff(pe, axis=0), axis=1)
    dg = np.linalg.norm(np.diff(pg, axis=0), axis=1)
    ok = dg > 1e-6
    step_scale = float(np.median(de[ok] / dg[ok]))
    ate = ev.ate_rmse(slam.trajectory, gt)
    ate_s = ev.ate_rmse(slam.trajectory, gt, with_scale=True)
    print(f"{name:34s} step_scale={step_scale:.5f} "
          f"ate={ate:.4f} ate_sim3={ate_s:.4f}", flush=True)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    base, (W, H) = _slam_cfg(False)
    base = dataclasses.replace(
        base, loop=dataclasses.replace(base.loop, enabled=False))
    K = Intrinsics.from_config(base.camera)
    T_ring = synthetic.loop_trajectory(200, radius=8.0)
    gt = [np.asarray(lie.SE3(T_ring.R[i], T_ring.t[i]).matrix())
          for i in range(n_frames)]
    world = synthetic.ring_world(jax.random.PRNGKey(seed), num=5000,
                                 radius=8.0, width=5.0)
    frames = [synthetic.render_stereo(K, world,
                                      lie.SE3(T_ring.R[i], T_ring.t[i]),
                                      width=W, height=H, max_depth=14.0)
              for i in range(n_frames)]

    variants = {
        "base": base,
        "pose_iters=16": dataclasses.replace(
            base, tracking=dataclasses.replace(base.tracking,
                                               pose_gn_iters=16)),
        "match_ratio=0.7": dataclasses.replace(
            base, tracking=dataclasses.replace(base.tracking,
                                               match_ratio=0.7)),
        "search_radius=12": dataclasses.replace(
            base, tracking=dataclasses.replace(base.tracking,
                                               search_radius_px=12.0)),
        "ba_iters=8": dataclasses.replace(
            base, mapping=dataclasses.replace(base.mapping, ba_iters=8)),
        "local_window=8": dataclasses.replace(
            base, mapping=dataclasses.replace(base.mapping, local_window=8)),
        "close_depth=20": dataclasses.replace(
            base, mapping=dataclasses.replace(base.mapping,
                                              close_depth_factor=20.0)),
        "close_depth=60": dataclasses.replace(
            base, mapping=dataclasses.replace(base.mapping,
                                              close_depth_factor=60.0)),
        "kf_every_frame": dataclasses.replace(
            base, tracking=dataclasses.replace(
                base.tracking, keyframe_min_interval=1,
                keyframe_translation=0.05, keyframe_rotation=0.02)),
    }
    for name, cfg in variants.items():
        run_variant(name, cfg, frames, gt)


if __name__ == "__main__":
    main()
