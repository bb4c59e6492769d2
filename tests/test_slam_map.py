import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models import slam_map as sm
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.ops.orb import FrameFeatures

K = Intrinsics(
    fx=jnp.float32(160.0), fy=jnp.float32(160.0),
    cx=jnp.float32(160.0), cy=jnp.float32(120.0),
    baseline=jnp.float32(0.12),
)


def _feats(key, n=64, w=320, h=240):
    kxy, kd = jax.random.split(key)
    xy = jax.random.uniform(kxy, (n, 2)) * jnp.array([w - 40, h - 40]) + 20.0
    desc = jnp.where(jax.random.bernoulli(kd, 0.5, (n, 256)), 1.0, -1.0).astype(jnp.bfloat16)
    return FrameFeatures(
        xy=xy,
        response=jnp.ones((n,)),
        angle=jnp.zeros((n,)),
        level=jnp.zeros((n,), jnp.int32),
        desc=desc,
        valid=jnp.ones((n,), bool),
    )


def test_insert_keyframe_spawns_landmarks():
    m = sm.empty_map(8, 256, 1024)
    f = _feats(jax.random.PRNGKey(0))
    depth = jnp.full((64,), 5.0)
    m = sm.insert_keyframe(
        m, K, lie.SE3.identity(), f, depth,
        -jnp.ones((64,), jnp.int32), jnp.int32(0), jnp.zeros((256,)),
    )
    assert int(m.n_kf) == 1
    assert int(m.n_lm) == 64
    assert int(m.n_obs) == 64
    assert bool(m.kf_valid[0])
    # landmarks at ~5 m depth in front of the camera
    z = np.asarray(m.lm_pos[:64, 2])
    np.testing.assert_allclose(z, 5.0, atol=1e-4)


def test_insert_matched_observations():
    m = sm.empty_map(8, 256, 1024)
    f = _feats(jax.random.PRNGKey(1))
    depth = jnp.full((64,), 5.0)
    m = sm.insert_keyframe(m, K, lie.SE3.identity(), f, depth,
                           -jnp.ones((64,), jnp.int32), jnp.int32(0), jnp.zeros((256,)))
    # second keyframe: first 32 features matched to landmarks 0..31, rest spawn
    lm_match = jnp.where(jnp.arange(64) < 32, jnp.arange(64), -1).astype(jnp.int32)
    T2 = lie.se3_exp(jnp.array([0.1, 0, 0, 0, 0, 0]))
    m = sm.insert_keyframe(m, K, T2, f, depth, lm_match, jnp.int32(4), jnp.zeros((256,)))
    assert int(m.n_kf) == 2
    assert int(m.n_lm) == 64 + 32
    assert int(m.n_obs) == 64 + 64
    assert int(m.lm_nobs[:32].sum()) == 64  # 2 obs each
    assert np.asarray(m.obs_kf[64:128]).max() == 1


def test_landmarks_in_view_respects_frustum():
    m = sm.empty_map(4, 64, 256)
    f = _feats(jax.random.PRNGKey(2), n=32)
    depth = jnp.full((32,), 4.0)
    m = sm.insert_keyframe(m, K, lie.SE3.identity(), f, depth,
                           -jnp.ones((32,), jnp.int32), jnp.int32(0), jnp.zeros((256,)))
    # same pose: all visible
    _, ok = sm.landmarks_in_view(m, K, lie.SE3.identity(), 14.0, 320, 240)
    assert int(ok.sum()) == 32
    # turned 180 deg about the camera's vertical (y) axis: none visible
    T_back = lie.SE3(lie.so3_exp(jnp.array([0.0, np.pi, 0.0])), jnp.zeros(3))
    _, ok2 = sm.landmarks_in_view(m, K, T_back, 14.0, 320, 240)
    assert int(ok2.sum()) == 0
    # too far away
    _, ok3 = sm.landmarks_in_view(m, K, lie.SE3.identity(), 1.0, 320, 240)
    assert int(ok3.sum()) == 0


def test_reanchor_follows_keyframe_update():
    m = sm.empty_map(4, 64, 256)
    f = _feats(jax.random.PRNGKey(3), n=32)
    depth = jnp.full((32,), 4.0)
    m = sm.insert_keyframe(m, K, lie.SE3.identity(), f, depth,
                           -jnp.ones((32,), jnp.int32), jnp.int32(0), jnp.zeros((256,)))
    before = np.asarray(m.lm_pos[:32])
    # loop closure moves KF 0 by +1 m in x (T_cw shifts by -1 in x)
    shift = lie.se3_exp(jnp.array([-1.0, 0, 0, 0, 0, 0]))
    newT = lie.compose(shift, lie.SE3(m.kf_T_cw.R[0], m.kf_T_cw.t[0]))
    m = m._replace(
        kf_T_cw=lie.SE3(m.kf_T_cw.R.at[0].set(newT.R), m.kf_T_cw.t.at[0].set(newT.t))
    )
    m = sm.reanchor_landmarks(m)
    after = np.asarray(m.lm_pos[:32])
    np.testing.assert_allclose(after - before, np.tile([[1.0, 0, 0]], (32, 1)), atol=1e-5)


def _multiview_map(key, n_kf=6, n_lm=64, noise_pose=0.05, noise_lm=0.08):
    """Ground-truth multi-view map, then perturbed poses (except KF0) and
    landmark positions. Returns (perturbed map, gt poses, gt landmarks)."""
    from fitslam_tpu.ops.geometry import project_stereo

    kl, kp = jax.random.split(jax.random.PRNGKey(7))
    pts_w = jax.random.uniform(kl, (n_lm, 3), minval=-2.5, maxval=2.5) + jnp.array([0.0, 0.0, 6.0])
    m = sm.empty_map(n_kf + 2, n_lm * 2, n_kf * n_lm * 2)
    gt_T = []
    for k in range(n_kf):
        T_k = lie.se3_exp(jnp.array([0.25 * k, 0.0, 0.0, 0.0, 0.02 * k, 0.0]))
        gt_T.append(T_k)
        p_c = (T_k.R @ pts_w[..., None])[..., 0] + T_k.t
        uvr, ok = project_stereo(K, p_c)
        feats = FrameFeatures(
            xy=uvr[:, :2], response=jnp.ones((n_lm,)),
            angle=jnp.zeros((n_lm,)), level=jnp.zeros((n_lm,), jnp.int32),
            desc=jnp.zeros((n_lm, 256), jnp.bfloat16),
            valid=ok & (p_c[..., 2] > 0.5),
        )
        lm_match = (-jnp.ones((n_lm,), jnp.int32) if k == 0
                    else jnp.arange(n_lm, dtype=jnp.int32))
        m = sm.insert_keyframe(m, K, T_k, feats, p_c[..., 2],
                               lm_match, jnp.int32(k), jnp.zeros((256,)))
    # perturb: intermediate/last poses + all landmark positions
    keys = jax.random.split(kp, 2)
    dx = jax.random.normal(keys[0], (n_kf + 2, 6)) * noise_pose
    dx = dx.at[0].set(0.0)
    T_noisy = lie.compose(lie.se3_exp(dx), m.kf_T_cw)
    lm_noise = jax.random.normal(keys[1], (n_lm * 2, 3)) * noise_lm
    m = m._replace(
        kf_T_cw=lie.SE3(
            jnp.where(m.kf_valid[:, None, None], T_noisy.R, m.kf_T_cw.R),
            jnp.where(m.kf_valid[:, None], T_noisy.t, m.kf_T_cw.t),
        ),
        lm_pos=m.lm_pos + lm_noise * m.lm_valid[:, None],
    )
    return m, gt_T, pts_w


def test_global_ba_recovers_structure():
    """global_ba pulls noisy poses AND landmarks back to ground truth —
    the correction reanchoring alone cannot do (reanchor moves landmarks
    rigidly with their anchor; it cannot fix independent landmark noise).
    Reference capability: GBA in the loop-closing thread (SURVEY.md §3.4)."""
    m, gt_T, pts_w = _multiview_map(jax.random.PRNGKey(7))
    n_lm = pts_w.shape[0]

    def pose_err(mm):
        errs = []
        for k, T_gt in enumerate(gt_T):
            T_k = lie.SE3(mm.kf_T_cw.R[k], mm.kf_T_cw.t[k])
            errs.append(float(jnp.linalg.norm(
                lie.se3_log(lie.compose(T_k, lie.inverse(T_gt))))))
        return float(np.mean(errs))

    def lm_rmse(mm):
        d = np.asarray(mm.lm_pos[:n_lm]) - np.asarray(pts_w)
        return float(np.sqrt((d ** 2).sum(-1).mean()))

    e_pose0, e_lm0 = pose_err(m), lm_rmse(m)
    m2, stats = sm.global_ba(m, K, iters=10)
    e_pose1, e_lm1 = pose_err(m2), lm_rmse(m2)
    chi2 = np.asarray(stats.chi2)
    assert chi2[-1] < 0.05 * chi2[0], chi2
    assert e_pose1 < 0.2 * e_pose0, (e_pose0, e_pose1)
    assert e_lm1 < 0.2 * e_lm0, (e_lm0, e_lm1)
    # gauge: KF0 untouched
    np.testing.assert_allclose(np.asarray(m2.kf_T_cw.t[0]),
                               np.asarray(m.kf_T_cw.t[0]), atol=1e-6)
    # anchor-frame positions refreshed to match the new world positions
    T_a = lie.SE3(m2.kf_T_cw.R[m2.lm_anchor_kf], m2.kf_T_cw.t[m2.lm_anchor_kf])
    p_anchor = (T_a.R @ m2.lm_pos[..., :, None])[..., 0] + T_a.t
    np.testing.assert_allclose(
        np.asarray(p_anchor[:n_lm]), np.asarray(m2.lm_pos_anchor[:n_lm]),
        atol=1e-4,
    )


def test_covisibility_window_beats_temporal_on_revisit():
    """Revisit trajectory (VERDICT #8): the newest keyframe re-observes OLD
    structure. A temporal last-N window holds those landmarks fixed (their
    anchors are outside the window), so landmark noise persists; the
    covisibility window selects the old co-observing keyframes and jointly
    refines structure + pose (ORB-SLAM3 covisible LocalBA)."""
    from fitslam_tpu.ops.geometry import project_stereo

    key = jax.random.PRNGKey(11)
    n_lm = 64
    pts_a = jax.random.uniform(key, (n_lm, 3), minval=-2.5, maxval=2.5) + jnp.array([0.0, 0.0, 6.0])
    m = sm.empty_map(12, 256, 4096)

    def insert(m, T, pts, lm_match, fid):
        p_c = (T.R @ pts[..., None])[..., 0] + T.t
        uvr, ok = project_stereo(K, p_c)
        feats = FrameFeatures(
            xy=uvr[:, :2], response=jnp.ones((n_lm,)),
            angle=jnp.zeros((n_lm,)), level=jnp.zeros((n_lm,), jnp.int32),
            desc=jnp.zeros((n_lm, 256), jnp.bfloat16),
            valid=ok & (p_c[..., 2] > 0.5),
        )
        return sm.insert_keyframe(m, K, T, feats, p_c[..., 2], lm_match,
                                  jnp.int32(fid), jnp.zeros((256,)))

    # KFs 0-3 observe field A near the origin
    for k in range(4):
        T_k = lie.se3_exp(jnp.array([0.25 * k, 0, 0, 0, 0, 0]))
        match = (-jnp.ones((n_lm,), jnp.int32) if k == 0
                 else jnp.arange(n_lm, dtype=jnp.int32))
        m = insert(m, T_k, pts_a, match, k)
    # KFs 4-7 observe a DIFFERENT field far away (field B spawns fresh lms)
    pts_b = pts_a + jnp.array([100.0, 0.0, 0.0])
    for k in range(4, 8):
        T_k = lie.compose(lie.se3_exp(jnp.array([0.25 * k, 0, 0, 0, 0, 0])),
                          lie.se3_exp(jnp.array([-100.0, 0, 0, 0, 0, 0])))
        match = (-jnp.ones((n_lm,), jnp.int32) if k == 4
                 else (jnp.arange(n_lm, dtype=jnp.int32) + n_lm))
        m = insert(m, T_k, pts_b, match, k)
    # KF 8 revisits field A
    T8 = lie.se3_exp(jnp.array([0.1, 0.05, 0, 0, 0, 0]))
    m = insert(m, T8, pts_a, jnp.arange(n_lm, dtype=jnp.int32), 8)

    # perturb: field-A landmarks + the revisit pose
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    lm_noise = jax.random.normal(k1, (n_lm, 3)) * 0.08
    m_noisy = m._replace(lm_pos=m.lm_pos.at[:n_lm].add(lm_noise))
    d8 = jax.random.normal(k2, (6,)) * 0.05
    T8n = lie.compose(lie.se3_exp(d8), T8)
    m_noisy = m_noisy._replace(
        kf_T_cw=lie.SE3(m_noisy.kf_T_cw.R.at[8].set(T8n.R),
                        m_noisy.kf_T_cw.t.at[8].set(T8n.t)),
    )

    def metrics(mm):
        d = np.asarray(mm.lm_pos[:n_lm]) - np.asarray(pts_a)
        rmse = float(np.sqrt((d ** 2).sum(-1).mean()))
        T = lie.SE3(mm.kf_T_cw.R[8], mm.kf_T_cw.t[8])
        perr = float(jnp.linalg.norm(lie.se3_log(lie.compose(T, lie.inverse(T8)))))
        return rmse, perr

    m_temporal = sm.local_ba(m_noisy, K, window=4, max_obs_local=2048,
                             iters=12, covis=False)
    m_covis = sm.local_ba(m_noisy, K, window=4, max_obs_local=2048,
                          iters=12, covis=True)
    rmse0, perr0 = metrics(m_noisy)
    rmse_t, perr_t = metrics(m_temporal)
    rmse_c, perr_c = metrics(m_covis)
    # temporal window cannot touch field-A landmarks (anchored at KF0)
    assert abs(rmse_t - rmse0) < 1e-5
    # covisibility window refines them and the revisit pose
    assert rmse_c < 0.55 * rmse0, (rmse0, rmse_c)
    assert perr_c < perr_t, (perr_c, perr_t)
    assert perr_c < 0.5 * perr0, (perr0, perr_c)


def test_cull_landmarks():
    m = sm.empty_map(8, 64, 256)
    f = _feats(jax.random.PRNGKey(4), n=32)
    depth = jnp.full((32,), 4.0)
    m = sm.insert_keyframe(m, K, lie.SE3.identity(), f, depth,
                           -jnp.ones((32,), jnp.int32), jnp.int32(0), jnp.zeros((256,)))
    m = m._replace(n_kf=jnp.int32(5))  # pretend 4 more KFs passed
    m2 = sm.cull_landmarks(m, min_obs=2, grace_kf=2)
    assert int(m2.lm_valid.sum()) == 0  # all single-obs landmarks culled
    assert int(m2.obs_valid.sum()) == 0


def test_compact_map_recycles_stale_landmarks():
    """compact_map keeps the most-recently-observed landmarks, remaps the
    observation table consistently, and frees slots so insertion continues
    (fixed-capacity long-run safety; the loop benchmark starved without it)."""
    import jax.numpy as jnp

    from fitslam_tpu.models import slam_map as smod

    L, O = 64, 256
    m = smod.empty_map(8, L, O)
    rng = np.random.RandomState(0)
    pos = rng.randn(L, 3).astype(np.float32)
    # 48 valid landmarks: 0..23 last seen by KF 1 (stale), 24..47 by KF 5
    m = m._replace(
        lm_pos=jnp.asarray(pos),
        lm_valid=jnp.arange(L) < 48,
        lm_nobs=jnp.where(jnp.arange(L) < 48, 2, 0),
        lm_anchor_kf=jnp.zeros((L,), jnp.int32),
        n_lm=jnp.int32(48),
        n_kf=jnp.int32(6),
    )
    obs_lm = np.arange(48, dtype=np.int32)
    obs_kf = np.where(obs_lm < 24, 1, 5).astype(np.int32)
    m = m._replace(
        obs_lm=jnp.zeros((O,), jnp.int32).at[:48].set(jnp.asarray(obs_lm)),
        obs_kf=jnp.zeros((O,), jnp.int32).at[:48].set(jnp.asarray(obs_kf)),
        obs_uvr=jnp.zeros((O, 3)).at[:48, 0].set(jnp.arange(48, dtype=jnp.float32)),
        obs_valid=jnp.arange(O) < 48,
        n_obs=jnp.int32(48),
    )

    out = smod.compact_map(m, target_fraction=0.375)  # keep 24 of 64 slots
    assert int(out.n_lm) == 24
    assert int(out.n_obs) == 24
    # two-tier keep (r04): Q = max(8, 24 // K_cap=8) = 8 landmarks per
    # anchor KF are PROTECTED (all anchors are 0 here -> slots 0..7, which
    # are the stale KF-1-observed ones — protection beats recency so every
    # keyframe stays loop-verifiable); the remaining 16 budget goes to the
    # most recent unprotected (KF-5-observed, slot tie-break -> 32..47)
    kept = np.asarray(out.lm_pos[:24])
    expect = np.concatenate([pos[0:8], pos[32:48]])
    np.testing.assert_allclose(np.sort(kept, axis=0),
                               np.sort(expect, axis=0), atol=1e-6)
    # observation remap is consistent: each obs points at the landmark whose
    # u-coordinate stamp matches its original landmark id
    o_lm = np.asarray(out.obs_lm[:24])
    o_u = np.asarray(out.obs_uvr[:24, 0])
    np.testing.assert_allclose(np.asarray(out.lm_pos)[o_lm],
                               pos[o_u.astype(int)], atol=1e-6)
    # freed slots accept new landmarks again
    assert not bool(out.lm_valid[30])
