"""Stereo-depth bias probe (r05): per-feature depth from the sub-pixel
stereo pipeline vs the renderer's true z-buffer, across ring viewpoints.

The ring bench's residual corrected-ATE (~0.11 m on an 8 m ring) is
consistent with a ~1.4% uniform map-scale error — the one error mode loop
closure cannot observe. Scale error in a stereo system comes from biased
disparity; this probe measures the bias directly: median and mean of
(z_est - z_true)/z_true bucketed by true depth.

Usage: python tools/diag_depth_bias.py [seed] [n_frames]
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench_suite import _slam_cfg
from fitslam_tpu.data import synthetic
from fitslam_tpu.models import tracking as tr
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg, (W, H) = _slam_cfg(False)
    K = Intrinsics.from_config(cfg.camera)
    T_ring = synthetic.loop_trajectory(200, radius=8.0)
    world = synthetic.ring_world(jax.random.PRNGKey(seed), num=5000,
                                 radius=8.0, width=5.0)

    rels = []
    zs = []
    for fi in range(0, 200, 200 // n_frames):
        T = lie.SE3(T_ring.R[fi], T_ring.t[fi])
        left, right = synthetic.render_stereo(K, world, T, width=W, height=H,
                                              max_depth=14.0)
        _, ztrue_img = synthetic.render_rgbd(K, world, T, width=W, height=H,
                                             max_depth=14.0)
        frame = tr.process_stereo(K, left, right,
                                  num_features=cfg.orb.num_features,
                                  num_levels=cfg.orb.num_levels,
                                  scale_factor=cfg.orb.scale_factor,
                                  fast_threshold=cfg.orb.fast_threshold)
        xy = np.asarray(frame.feats.xy)
        z_est = np.asarray(frame.depth)
        ok = np.asarray(frame.feats.valid) & (z_est > 1e-3)
        zt = np.asarray(ztrue_img)
        iu = np.clip(np.round(xy[:, 0]).astype(int), 0, W - 1)
        iv = np.clip(np.round(xy[:, 1]).astype(int), 0, H - 1)
        z_true = zt[iv, iu]
        ok &= (z_true > 0.3) & (z_true < 14.0)
        rels.append(((z_est - z_true) / z_true)[ok])
        zs.append(z_true[ok])

    rel = np.concatenate(rels)
    z = np.concatenate(zs)
    print(f"n={len(rel)}  overall: median {np.median(rel)*100:+.3f}%  "
          f"mean {np.mean(rel)*100:+.3f}%  (clip@20%: "
          f"{np.mean(np.clip(rel, -0.2, 0.2))*100:+.3f}%)")
    edges = [0.3, 2, 4, 6, 8, 10, 14]
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (z >= lo) & (z < hi)
        if m.sum() < 10:
            continue
        print(f"  z in [{lo:4.1f},{hi:4.1f}): n={m.sum():5d} "
              f"median {np.median(rel[m])*100:+.3f}%  "
              f"mean {np.mean(rel[m])*100:+.3f}%")


if __name__ == "__main__":
    main()
