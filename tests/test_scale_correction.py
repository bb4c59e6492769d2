"""Scale-drift correction machinery (r05): DLT re-triangulation and the
uniform-scale line search that repairs the one drift mode an SE(3) loop
closure cannot observe (models/loop_closing.scale_search,
ops/ba.retriangulate_points).

Construction: a camera arc over known landmarks; observations are exact
projections (including stereo rows, which pin absolute depth). The map
handed to the correction has every camera center shrunk by 1.5% about the
gauge keyframe and landmarks consistent with the SHRUNK geometry (the
drifted-basin state: locally self-consistent, globally off-scale). The
scale search must recover s ~ 1/0.985 and cut chi2."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fitslam_tpu.models import slam_map as sm
from fitslam_tpu.models.loop_closing import scale_search
from fitslam_tpu.ops import ba, lie
from fitslam_tpu.ops.geometry import Intrinsics

K = Intrinsics(fx=jnp.float32(400.0), fy=jnp.float32(400.0),
               cx=jnp.float32(320.0), cy=jnp.float32(240.0),
               baseline=jnp.float32(0.2))


def _arc_problem(n_kf=10, n_lm=300, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-4, 4, (n_lm, 3)) + [0, 0, 9.0]
    R_all, t_all = [], []
    for k in range(n_kf):
        c = np.array([0.4 * k, 0.05 * k, 0.2 * np.sin(0.3 * k)])
        R = np.eye(3)
        R_all.append(R)
        t_all.append(-R @ c)
    T = lie.SE3(jnp.asarray(np.stack(R_all), jnp.float32),
                jnp.asarray(np.stack(t_all), jnp.float32))
    okf, olm, uvr = [], [], []
    for k in range(n_kf):
        for l in range(n_lm):
            pc = R_all[k] @ pts[l] + t_all[k]
            if pc[2] < 1.0:
                continue
            u = 400 * pc[0] / pc[2] + 320
            v = 400 * pc[1] / pc[2] + 240
            if not (0 <= u < 640 and 0 <= v < 480):
                continue
            ur = u - 400 * 0.2 / pc[2]
            okf.append(k)
            olm.append(l)
            uvr.append([u, v, ur])
    O = len(okf)
    obs = ba.Observations(
        kf=jnp.asarray(okf, jnp.int32), lm=jnp.asarray(olm, jnp.int32),
        uvr=jnp.asarray(np.asarray(uvr, np.float32)),
        sigma2=jnp.ones((O,)), valid=jnp.ones((O,), bool))
    return T, jnp.asarray(pts, jnp.float32), obs


def _shrunk(T, s):
    """Scale every camera center about keyframe 0's center."""
    R = np.asarray(T.R)
    t = np.asarray(T.t)
    c = -np.einsum("kij,ki->kj", R.transpose(0, 2, 1), t)
    c_s = c[0] + s * (c - c[0])
    return lie.SE3(jnp.asarray(R), jnp.asarray(-np.einsum(
        "kij,kj->ki", R, c_s), jnp.float32))


def test_retriangulate_recovers_points():
    T, pts, obs = _arc_problem()
    bad = pts + jax.random.normal(jax.random.PRNGKey(1), pts.shape) * 0.4
    out = ba.retriangulate_points(K, T, bad, obs,
                                  jnp.ones((pts.shape[0],), bool))
    err = np.linalg.norm(np.asarray(out) - np.asarray(pts), axis=1)
    observed = np.zeros(pts.shape[0], bool)
    observed[np.asarray(obs.lm)] = True
    # exact observations; f32 normal equations with light Tikhonov damping
    # leave sub-centimeter worst-case residual. Unobserved landmarks keep
    # their (noisy) fallback position by design — excluded.
    assert float(np.median(err[observed])) < 5e-4
    assert float(err[observed].max()) < 1e-2, float(err[observed].max())
    assert float(err[~observed].min()) > 1e-2  # fallback really kept


def test_scale_search_recovers_global_scale():
    T, pts, obs = _arc_problem()
    SHRINK = 0.985
    T_bad = _shrunk(T, SHRINK)
    # drifted-basin landmarks: consistent with the shrunk poses (DLT under
    # the shrunk geometry using the mono rows only would be scale-free, so
    # build them by scaling the true points about the gauge center instead)
    c0 = np.asarray(-(T.R[0].T @ T.t[0]))
    pts_bad = jnp.asarray(c0 + SHRINK * (np.asarray(pts) - c0), jnp.float32)

    m = sm.empty_map(16, 512, obs.kf.shape[0], signature_dim=8)
    K_cap = 16
    padR = jnp.tile(jnp.eye(3)[None], (K_cap, 1, 1)).at[:10].set(T_bad.R)
    padt = jnp.zeros((K_cap, 3)).at[:10].set(T_bad.t)
    m = m._replace(
        kf_T_cw=lie.SE3(padR, padt),
        kf_valid=jnp.arange(K_cap) < 10,
        n_kf=jnp.int32(10),
        lm_pos=jnp.zeros_like(m.lm_pos).at[:pts.shape[0]].set(pts_bad),
        lm_valid=jnp.arange(m.lm_valid.shape[0]) < pts.shape[0],
        obs_kf=obs.kf, obs_lm=obs.lm, obs_uvr=obs.uvr,
        obs_sigma2=obs.sigma2, obs_valid=obs.valid,
    )
    chi_before = float(ba.chi2_residuals(
        K, m.kf_T_cw, m.lm_pos,
        ba.Observations(kf=m.obs_kf, lm=m.obs_lm, uvr=m.obs_uvr,
                        sigma2=m.obs_sigma2, valid=m.obs_valid)))
    scales = jnp.linspace(0.97, 1.03, 13)
    m2, s_best, chis = scale_search(K, m, scales)
    # winning scale within one grid step of the true correction 1/0.985
    assert abs(float(s_best) - 1.0 / SHRINK) < 0.006, float(s_best)
    assert float(jnp.min(chis)) < 0.5 * chi_before
    # gauge keyframe pose exactly preserved
    np.testing.assert_allclose(np.asarray(m2.kf_T_cw.t[0]),
                               np.asarray(m.kf_T_cw.t[0]), atol=1e-5)


def test_scale_search_identity_when_unbiased():
    """On an already-correct map the search must pick s ~ 1.0."""
    T, pts, obs = _arc_problem()
    K_cap = 16
    m = sm.empty_map(K_cap, 512, obs.kf.shape[0], signature_dim=8)
    padR = jnp.tile(jnp.eye(3)[None], (K_cap, 1, 1)).at[:10].set(T.R)
    padt = jnp.zeros((K_cap, 3)).at[:10].set(T.t)
    m = m._replace(
        kf_T_cw=lie.SE3(padR, padt),
        kf_valid=jnp.arange(K_cap) < 10,
        n_kf=jnp.int32(10),
        lm_pos=jnp.zeros_like(m.lm_pos).at[:pts.shape[0]].set(pts),
        lm_valid=jnp.arange(m.lm_valid.shape[0]) < pts.shape[0],
        obs_kf=obs.kf, obs_lm=obs.lm, obs_uvr=obs.uvr,
        obs_sigma2=obs.sigma2, obs_valid=obs.valid,
    )
    scales = jnp.linspace(0.97, 1.03, 13)
    _, s_best, _ = scale_search(K, m, scales)
    assert abs(float(s_best) - 1.0) < 1e-6

def test_refine_map_improves_chi2_and_rebases_tracker():
    """StereoSlam.refine_map (deferred full-BA cycles) must lower the
    robust chi2 of the map and keep the tracker pose consistent with the
    refined last keyframe (delta composition, same contract as loop
    corrections)."""
    import dataclasses

    from fitslam_tpu.data import synthetic
    from fitslam_tpu.models.slam import StereoSlam
    from fitslam_tpu.utils.config import FitSlamConfig

    W, H = 160, 120
    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, width=W, height=H,
                                   fx=0.625 * W, fy=0.625 * W,
                                   cx=W / 2, cy=H / 2, baseline=0.2),
        orb=dataclasses.replace(cfg.orb, num_features=192, num_levels=2,
                                fast_threshold=12.0),
        tracking=dataclasses.replace(cfg.tracking, min_inliers=8,
                                     keyframe_min_interval=1,
                                     keyframe_translation=0.2),
        mapping=dataclasses.replace(cfg.mapping, max_keyframes=32,
                                    max_landmarks=2048,
                                    max_observations=4096,
                                    local_window=3, ba_iters=2),
        loop=dataclasses.replace(cfg.loop, enabled=False),
    )
    Kc = Intrinsics.from_config(cfg.camera)
    world = synthetic.corridor_world(jax.random.PRNGKey(0), num=1500,
                                     length=18.0, width=5.0)
    T = synthetic.straight_trajectory(10, length=1.2, height=1.2,
                                      start_x=0.5)
    slam = StereoSlam(cfg)
    for i in range(10):
        l, r = synthetic.render_stereo(Kc, world, lie.SE3(T.R[i], T.t[i]),
                                       width=W, height=H)
        slam.process_frame_async(l, r)
    slam.finalize()

    obs = ba.Observations(kf=slam.map.obs_kf, lm=slam.map.obs_lm,
                          uvr=slam.map.obs_uvr, sigma2=slam.map.obs_sigma2,
                          valid=slam.map.obs_valid)
    chi_before = float(ba.chi2_residuals(Kc, slam.map.kf_T_cw,
                                         slam.map.lm_pos, obs))
    chi2 = slam.refine_map(cycles=2, gba_iters=5)
    chi_after = float(ba.chi2_residuals(Kc, slam.map.kf_T_cw,
                                        slam.map.lm_pos, obs))
    assert chi2 is not None and np.isfinite(float(chi2))
    assert chi_after <= chi_before * 1.001, (chi_before, chi_after)
    # tracker rebased onto the refined last keyframe: current pose must sit
    # within numerical noise of it (the last frame WAS a keyframe or very
    # close to it in this dense-cadence setup)
    j = int(slam.map.n_kf) - 1
    d = np.asarray(slam.state.T_cw.t) - np.asarray(slam.map.kf_T_cw.t[j])
    assert np.linalg.norm(d) < 1.0
