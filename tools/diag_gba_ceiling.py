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

    print("A chi2 history:", " ".join(
        f"{float(c):.0f}" for c in statsA.chi2))

    # E: iterated retriangulate+GBA cycles from the drifted basin — does
    # breaking pose-landmark complicity each cycle let GN walk the scale
    # valley toward the deeper (ground-truth) basin?
    from fitslam_tpu.ops import ba
    from fitslam_tpu.ops.ba import Observations

    obs = Observations(kf=m.obs_kf, lm=m.obs_lm, uvr=m.obs_uvr,
                       sigma2=m.obs_sigma2, valid=m.obs_valid)
    from fitslam_tpu.models.loop_closing import scale_search

    mE = m
    scales = jnp.linspace(0.98, 1.03, 21)
    for rnd in range(4):
        for cyc in range(4):
            mE = mE._replace(lm_pos=ba.retriangulate_points(
                K, mE.kf_T_cw, mE.lm_pos, obs, mE.lm_valid))
            mE, stE = sm.global_ba(mE, K, iters=15)
        print(f"G round {rnd} post-cycles: kfATE={kf_ate(mE, gt):.4f} "
              f"chi2={float(stE.chi2[-1]):.1f}")
        mE2, s_best, chis = scale_search(K, mE, scales)
        print(f"G round {rnd} scale-search: s={float(s_best):.4f} "
              f"chi2={float(jnp.min(chis)):.1f} kfATE={kf_ate(mE2, gt):.4f}")
        mE = mE2

    # B: GBA from ground-truth poses (landmarks free to follow)
    n_kf_cap = m.kf_valid.shape[0]
    fids = np.asarray(m.kf_frame_id)
    R_gt = np.array(np.asarray(m.kf_T_cw.R))
    t_gt = np.array(np.asarray(m.kf_T_cw.t))
    for k in range(int(m.n_kf)):
        T_cw = np.linalg.inv(gt[int(fids[k])])
        R_gt[k] = T_cw[:3, :3]
        t_gt[k] = T_cw[:3, 3]
    m_gt = m._replace(kf_T_cw=lie.SE3(jnp.asarray(R_gt), jnp.asarray(t_gt)))
    print(f"B init: kfATE={kf_ate(m_gt, gt):.5f}")
    # landmark re-triangulation at GT poses (host DLT over each landmark's
    # observations): the robust chi2 CLAMP makes a GN landmark-refit from
    # GT-poses+drifted-landmarks reject every step (all residuals start at
    # the clamp), so triangulate directly instead
    from fitslam_tpu.ops import ba as ba_mod
    from fitslam_tpu.ops.ba import Observations

    obs_kf = np.asarray(m.obs_kf)
    obs_lm = np.asarray(m.obs_lm)
    obs_uvr = np.asarray(m.obs_uvr)
    obs_ok = np.asarray(m.obs_valid)
    lm_valid = np.asarray(m.lm_valid)
    L = lm_valid.shape[0]
    fx, fy = float(K.fx), float(K.fy)
    cx, cy = float(K.cx), float(K.cy)
    bf = float(K.bf)
    pts = np.array(np.asarray(m.lm_pos))
    # rows of A p = b per observation: u, v (and ur where stereo)
    by_lm = {}
    for o in np.nonzero(obs_ok)[0]:
        by_lm.setdefault(int(obs_lm[o]), []).append(o)
    n_tri = 0
    for l, olist in by_lm.items():
        if not lm_valid[l]:
            continue
        A_rows, b_rows = [], []
        for o in olist:
            k = int(obs_kf[o])
            R, t = R_gt[k], t_gt[k]
            u, v, ur = obs_uvr[o]
            # (u - cx)/fx * (r3 p + t3) = r1 p + t1  etc.
            a1 = (u - cx) / fx * R[2] - R[0]
            b1 = t[0] - (u - cx) / fx * t[2]
            a2 = (v - cy) / fy * R[2] - R[1]
            b2 = t[1] - (v - cy) / fy * t[2]
            A_rows += [a1, a2]
            b_rows += [b1, b2]
            if ur > 0:
                # u - ur = bf / z  =>  (r3 p + t3) = bf / (u - ur)
                z = bf / max(u - ur, 1e-6)
                A_rows.append(R[2])
                b_rows.append(z - t[2])
        A = np.stack(A_rows)
        b = np.asarray(b_rows)
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        pts[l] = sol
        n_tri += 1
    m_gt = m_gt._replace(lm_pos=jnp.asarray(pts))
    obs = Observations(kf=m_gt.obs_kf, lm=m_gt.obs_lm, uvr=m_gt.obs_uvr,
                       sigma2=m_gt.obs_sigma2, valid=m_gt.obs_valid)
    chi_gt = float(ba_mod.chi2_residuals(K, m_gt.kf_T_cw, m_gt.lm_pos, obs))
    print(f"B after DLT re-triangulation ({n_tri} lms): chi2={chi_gt:.1f}")
    mB, statsB = sm.global_ba(m_gt, K, iters=gba_iters)
    print(f"B: GBA(GT init, {gba_iters} it) kfATE={kf_ate(mB, gt):.4f} "
          f"chi2={float(statsB.chi2[-1]):.1f}")


if __name__ == "__main__":
    main()
