"""GBA accuracy-ceiling probe (r05): do the stored observations support the
ground-truth trajectory?

Runs the ring WITHOUT loop closing, then optimizes the final map three ways:
  A. GBA from the drifted estimate (what loop closing's GBA starts near)
  B. GBA from GROUND-TRUTH keyframe poses (landmarks free)
If B stays at ~0 keyframe ATE, the observation data is unbiased and loop
closing + enough GBA iterations can in principle recover the map; if B
drifts away from GT at equal-or-better chi2, a front-end bias remains and
no amount of back-end iteration will fix it (the r05 pre-sub-pixel state).

Usage: python tools/diag_gba_ceiling.py [seed] [gba_iters]
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
from fitslam_tpu.models import slam_map as sm
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.utils import evaluation as ev


def kf_ate(m, gt, align=True):
    n_kf = int(m.n_kf)
    fids = np.asarray(m.kf_frame_id[:n_kf])
    T_wc = np.asarray(lie.inverse(m.kf_T_cw).matrix())[:n_kf]
    gts = [gt[int(f)] for f in fids]
    return ev.ate_rmse(list(T_wc), gts, align=align)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    gba_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n_frames = 200
    cfg, (W, H) = _slam_cfg(False)
    cfg = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, enabled=False))
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
    for i in range(n_total):
        slam.process_frame_async(*frames[i])
    slam.finalize()
    m = slam.map
    print(f"seed={seed} n_kf={int(m.n_kf)} drifted kfATE={kf_ate(m, gt):.4f}")

    # A: GBA from the drifted basin
    mA, statsA = sm.global_ba(m, K, iters=gba_iters)
    print(f"A: GBA(drifted, {gba_iters} it) kfATE={kf_ate(mA, gt):.4f} "
          f"chi2={float(statsA.chi2[-1]):.1f}")

    # B: GBA from ground-truth poses (landmarks free to follow)
    n_kf_cap = m.kf_valid.shape[0]
    fids = np.asarray(m.kf_frame_id)
    R_gt = np.asarray(m.kf_T_cw.R)
    t_gt = np.asarray(m.kf_T_cw.t)
    for k in range(int(m.n_kf)):
        T_cw = np.linalg.inv(gt[int(fids[k])])
        R_gt[k] = T_cw[:3, :3]
        t_gt[k] = T_cw[:3, 3]
    m_gt = m._replace(kf_T_cw=lie.SE3(jnp.asarray(R_gt), jnp.asarray(t_gt)))
    print(f"B init: kfATE={kf_ate(m_gt, gt):.5f}")
    mB, statsB = sm.global_ba(m_gt, K, iters=gba_iters)
    print(f"B: GBA(GT init, {gba_iters} it) kfATE={kf_ate(mB, gt):.4f} "
          f"chi2={float(statsB.chi2[-1]):.1f}")


if __name__ == "__main__":
    main()
