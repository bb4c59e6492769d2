"""Stage-wise loop-closing diagnostic on the ring bench (r05).

For one seed, run the exact bench_loop_slam configuration but instrument
every loop correction: keyframe-pose ATE vs ground truth BEFORE the
correction, after PGO, and after GBA, plus the loop edge's own error vs
the ground-truth relative pose. Pinpoints which stage of
detect -> PGO -> GBA -> re-anchor hurts on seeds where the corrected
trajectory is WORSE than the uncorrected one (BENCH_r05 seed 3).

Usage: python tools/diag_loop.py [seed]
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
from fitslam_tpu.models import loop_closing as lc
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.utils import evaluation as ev


def kf_ate(slam, gt, align=True):
    """ATE over keyframe poses, matched to GT via kf_frame_id."""
    n_kf = int(slam.map.n_kf)
    fids = np.asarray(slam.map.kf_frame_id[:n_kf])
    T_wc = np.asarray(lie.inverse(slam.map.kf_T_cw).matrix())[:n_kf]
    gts = [gt[int(f)] for f in fids]
    return ev.ate_rmse(list(T_wc), gts, align=align)


def main():
    seeds = [int(a) for a in sys.argv[1:]] or [3]
    for seed in seeds:
        run_seed(seed)


def run_seed(seed):
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
    gt = [np.asarray(lie.SE3(T_gt.R[i], T_gt.t[i]).matrix())
          for i in range(n_total)]

    world = synthetic.ring_world(jax.random.PRNGKey(seed), num=5000,
                                 radius=8.0, width=5.0)
    frames = [synthetic.render_stereo(K, world, lie.SE3(T_gt.R[i], T_gt.t[i]),
                                      width=W, height=H, max_depth=14.0)
              for i in range(n_total)]

    slam = StereoSlam(cfg)

    # --- instrument the loop closer ---
    records = []
    orig_on_kf = slam.loop_closer.on_keyframe

    def traced_on_kf(s, kf_idx, cand_idx=None, score=None):
        pre = kf_ate(s, gt)
        info = orig_on_kf(s, kf_idx, cand_idx=cand_idx, score=score)
        if info is None:
            return None
        post = kf_ate(s, gt)
        i, j = info["loop_to"], info["loop_from"]
        # loop edge error vs GT: T_ij estimated vs GT relative pose
        fid_i = int(s.map.kf_frame_id[i])
        fid_j = int(s.map.kf_frame_id[j])
        T_ij_est = np.asarray(s.loop_closer.loop_edges[-1][2])
        gt_i_cw = np.linalg.inv(gt[fid_i])
        T_ij_gt = gt_i_cw @ gt[fid_j]
        err = np.linalg.inv(T_ij_gt) @ T_ij_est
        sc = info.get("scale_correction")
        records.append({
            "kf": kf_idx, "i": i, "j": j,
            "scale": float(sc) if sc is not None else 1.0,
            "inliers": info["inliers"],
            "pre_kf_ate": pre, "post_kf_ate": post,
            "edge_t_err_m": float(np.linalg.norm(err[:3, 3])),
            "edge_R_err_deg": float(np.degrees(np.arccos(
                np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)))),
        })
        return info

    slam.loop_closer.on_keyframe = traced_on_kf

    POLL = 4
    slam.process_frame_async(*frames[0])
    for i in range(1, n_total):
        slam.process_frame_async(*frames[i])
        if i % POLL == 0:
            slam.poll_keyframe_events(flush=False)
    slam.poll_keyframe_events()
    slam.finalize()

    ate_raw = ev.ate_rmse(slam.trajectory, gt)
    corr = slam.corrected_trajectory()
    ate_corr = ev.ate_rmse(corr, gt)
    ate_corr_s = ev.ate_rmse(corr, gt, with_scale=True)
    # per-step translation scale: est step length / gt step length, median
    pe = np.stack([np.asarray(T)[:3, 3] for T in corr])
    pg = np.stack([g[:3, 3] for g in gt[:len(corr)]])
    de = np.linalg.norm(np.diff(pe, axis=0), axis=1)
    dg = np.linalg.norm(np.diff(pg, axis=0), axis=1)
    step_scale = float(np.median(de / np.maximum(dg, 1e-9)))
    final_kf = kf_ate(slam, gt)

    print(f"seed={seed}")
    for r in records:
        print(f"  loop kf={r['kf']:3d} edge {r['i']:3d}->{r['j']:3d} "
              f"inl={r['inliers']:3d} kfATE {r['pre_kf_ate']:.4f}->"
              f"{r['post_kf_ate']:.4f} edge_err t={r['edge_t_err_m']:.4f} m "
              f"R={r['edge_R_err_deg']:.3f} deg s={r['scale']:.5f}")
    print(f"  final: kfATE={final_kf:.4f} traj_raw={ate_raw:.4f} "
          f"traj_corrected={ate_corr:.4f} corrected_sim3={ate_corr_s:.4f} "
          f"step_scale={step_scale:.5f} loops={len(slam.loop_events)}")


if __name__ == "__main__":
    main()
