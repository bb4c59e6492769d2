"""Single-step bias probe (r05): insert ONE keyframe at the ground-truth
pose (fresh map, single-view spawns from measured stereo depth), track the
NEXT frame with the ground-truth motion model, and compare the solved step
to ground truth. No BA, no multi-frame feedback — isolates the
spawn + association + motion-only-solve chain.

If the one-step translation ratio reproduces the ring's -2% the bias lives
in this chain (landmark spawn geometry or the pose solve against it);
if it is ~1.0 the bias accumulates through the map-evolution feedback
(local BA / multi-view refinement / culling).

Usage: python tools/diag_single_step.py [seed] [n_samples]
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench_suite import _slam_cfg
from fitslam_tpu.data import synthetic
from fitslam_tpu.models import slam_map as sm
from fitslam_tpu.models import tracking as tr
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.ops.place import signature_from_descriptors


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    cfg, (W, H) = _slam_cfg(False)
    K = Intrinsics.from_config(cfg.camera)
    T_ring = synthetic.loop_trajectory(200, radius=8.0)
    world = synthetic.ring_world(jax.random.PRNGKey(seed), num=5000,
                                 radius=8.0, width=5.0)

    max_spawn = cfg.mapping.close_depth_factor * cfg.camera.baseline
    ratios = []
    rot_ratios = []
    for i in range(2, 2 + n_samples * 8, 8):
        T_i = lie.SE3(T_ring.R[i], T_ring.t[i])
        T_i1 = lie.SE3(T_ring.R[i + 1], T_ring.t[i + 1])
        T_cw_i = lie.inverse(T_i)
        T_cw_i1 = lie.inverse(T_i1)
        li, ri = synthetic.render_stereo(K, world, T_i, width=W, height=H,
                                         max_depth=14.0)
        li1, ri1 = synthetic.render_stereo(K, world, T_i1, width=W, height=H,
                                           max_depth=14.0)
        fa = tr.process_stereo(K, li, ri,
                               num_features=cfg.orb.num_features,
                               num_levels=cfg.orb.num_levels,
                               scale_factor=cfg.orb.scale_factor,
                               fast_threshold=cfg.orb.fast_threshold)
        fb = tr.process_stereo(K, li1, ri1,
                               num_features=cfg.orb.num_features,
                               num_levels=cfg.orb.num_levels,
                               scale_factor=cfg.orb.scale_factor,
                               fast_threshold=cfg.orb.fast_threshold)
        m = sm.empty_map(8, cfg.mapping.max_landmarks, 8192,
                         signature_dim=cfg.loop.vocab_dim)
        sig = signature_from_descriptors(fa.feats.desc, fa.feats.valid)
        m = sm.insert_keyframe(
            m, K, T_cw_i, fa.feats, fa.depth,
            -jnp.ones((fa.feats.desc.shape[0],), jnp.int32),
            jnp.int32(i), sig, scale_factor=cfg.orb.scale_factor,
            max_spawn_depth=max_spawn)
        # ground-truth motion model: prediction lands exactly at truth
        vel_gt = lie.se3_log(lie.compose(T_cw_i1, lie.inverse(T_cw_i)))
        state = tr.init_track_state()._replace(
            T_cw=T_cw_i, velocity=vel_gt, T_cw_last_kf=T_cw_i,
            initialized=jnp.bool_(True))
        state2, lm_match, n_inl = tr.track_frame(
            K, m, state, fb,
            search_radius=cfg.tracking.search_radius_px,
            wide_radius=cfg.tracking.wide_radius_px,
            match_max_hamming=cfg.tracking.match_max_hamming,
            match_ratio=cfg.tracking.match_ratio,
            min_inliers=cfg.tracking.min_inliers,
            width=W, height=H, pose_iters=cfg.tracking.pose_gn_iters,
        )
        c_i = np.asarray(T_i.t)
        c_est = np.asarray(lie.inverse(state2.T_cw).t)
        c_gt = np.asarray(T_i1.t)
        d_est = np.linalg.norm(c_est - c_i)
        d_gt = np.linalg.norm(c_gt - c_i)
        ratios.append(d_est / d_gt)
        # rotation step ratio
        R_rel_est = np.asarray(state2.T_cw.R) @ np.asarray(T_cw_i.R).T
        R_rel_gt = np.asarray(T_cw_i1.R) @ np.asarray(T_cw_i.R).T
        ang = lambda R: np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
        rot_ratios.append(ang(R_rel_est) / max(ang(R_rel_gt), 1e-9))

    r = np.asarray(ratios)
    rr = np.asarray(rot_ratios)
    print(f"one-step translation ratio: median {np.median(r):.5f} "
          f"mean {np.mean(r):.5f} std {np.std(r):.5f} (n={len(r)})")
    print(f"one-step rotation ratio   : median {np.median(rr):.5f} "
          f"mean {np.mean(rr):.5f} std {np.std(rr):.5f}")


if __name__ == "__main__":
    main()
