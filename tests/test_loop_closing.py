"""Loop closing on a synthetic drifted revisit: detection by signature,
geometric verification against the candidate's landmarks, pose-graph
correction, and landmark re-anchoring (SURVEY.md §3.4 capability)."""

import dataclasses
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models import loop_closing as lc
from fitslam_tpu.models import slam_map as sm
from fitslam_tpu.models import tracking as tr
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics, project_stereo
from fitslam_tpu.ops.orb import FrameFeatures
from fitslam_tpu.ops.place import signature_from_descriptors
from fitslam_tpu.utils.config import FitSlamConfig

K = Intrinsics(
    fx=jnp.float32(200.0), fy=jnp.float32(200.0),
    cx=jnp.float32(160.0), cy=jnp.float32(120.0), baseline=jnp.float32(0.2),
)
N = 128


def _frame_from_landmarks(key, pts_w, T_cw):
    """Fabricate a stereo frame observing given world points from T_cw,
    with per-landmark deterministic descriptors."""
    p_c = (T_cw.R @ pts_w[..., None])[..., 0] + T_cw.t
    uvr, ok = project_stereo(K, p_c)
    desc = jnp.where(jax.random.bernoulli(key, 0.5, (N, 256)), 1.0, -1.0).astype(jnp.bfloat16)
    feats = FrameFeatures(
        xy=uvr[:, :2],
        response=jnp.ones((N,)),
        angle=jnp.zeros((N,)),
        level=jnp.zeros((N,), jnp.int32),
        desc=desc,
        valid=ok & (p_c[..., 2] > 0.5),
    )
    return tr.StereoFrame(feats, p_c[..., 2] * feats.valid), desc


def test_loop_close_corrects_drift():
    kw = jax.random.PRNGKey(0)
    pts_w = jax.random.uniform(kw, (N, 3), minval=-4.0, maxval=4.0) + jnp.array([0, 0, 8.0])

    T_true = lie.SE3.identity()  # KF0 camera at origin looking +z
    frame0, desc = _frame_from_landmarks(jax.random.fold_in(kw, 1), pts_w, T_true)

    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, min_gap_keyframes=3, min_score=0.1,
                                      min_matches=20)
    )
    m = sm.empty_map(16, 512, 2048)
    sig0 = signature_from_descriptors(desc, frame0.feats.valid)
    m = sm.insert_keyframe(m, K, T_true, frame0.feats, frame0.depth,
                           -jnp.ones((N,), jnp.int32), jnp.int32(0), sig0)

    # intermediate keyframes far away (no shared landmarks)
    for k in range(1, 8):
        T_k = lie.se3_exp(jnp.array([5.0 * k, 0, 0, 0, 0, 0]))
        fk, dk = _frame_from_landmarks(jax.random.fold_in(kw, 10 + k),
                                       pts_w + 100.0, T_k)
        m = sm.insert_keyframe(m, K, T_k, fk.feats, fk.depth,
                               -jnp.ones((N,), jnp.int32), jnp.int32(k),
                               signature_from_descriptors(dk, fk.feats.valid))

    # revisit: true pose = origin again, but estimated pose is drifted 0.5 m
    T_drift = lie.se3_exp(jnp.array([0.5, 0.2, 0.0, 0.0, 0.0, 0.05]))
    T_est = lie.compose(T_drift, T_true)
    frame9 = tr.StereoFrame(frame0.feats, frame0.depth)  # same observations
    m = sm.insert_keyframe(m, K, T_est, frame9.feats, frame9.depth,
                           -jnp.ones((N,), jnp.int32), jnp.int32(8), sig0)
    kf9 = int(m.n_kf) - 1

    # detection finds KF0
    cand = lc.detect_loop(m, sig0, jnp.int32(kf9), cfg.loop.min_gap_keyframes)
    assert int(cand.kf_idx) == 0
    assert float(cand.score) > 0.5

    # verification recovers the true pose from KF0's landmarks
    T_loop, n_inl = lc.verify_loop(K, m, frame9, cand.kf_idx)
    assert int(n_inl) > 50
    err = float(jnp.linalg.norm(lie.se3_log(lie.compose(T_loop, lie.inverse(T_true)))))
    assert err < 0.02, err

    # full correction via LoopCloser
    closer = lc.LoopCloser(cfg, K)
    slam = SimpleNamespace(
        map=m, last_frame=frame9,
        state=tr.mark_keyframe(tr.init_track_state()._replace(T_cw=T_est), jnp.int32(0)),
    )
    info = closer.on_keyframe(slam, kf9)
    assert info is not None
    assert info["loop_to"] == 0
    # corrected KF9 pose close to truth
    T9 = lie.SE3(slam.map.kf_T_cw.R[kf9], slam.map.kf_T_cw.t[kf9])
    err9 = float(jnp.linalg.norm(lie.se3_log(lie.compose(T9, lie.inverse(T_true)))))
    assert err9 < 0.1, err9
    # tracker rebased
    np.testing.assert_allclose(np.asarray(slam.state.T_cw.t), np.asarray(T9.t), atol=1e-6)
    # global BA ran after PGO (run_global_ba default True) and converged
    assert info["gba_chi2"] is not None

    # flag off: PGO-only correction, no GBA stage
    cfg_off = dataclasses.replace(
        cfg, loop=dataclasses.replace(cfg.loop, run_global_ba=False)
    )
    closer2 = lc.LoopCloser(cfg_off, K)
    slam2 = SimpleNamespace(
        map=m, last_frame=frame9,
        state=tr.mark_keyframe(tr.init_track_state()._replace(T_cw=T_est), jnp.int32(0)),
    )
    info2 = closer2.on_keyframe(slam2, kf9)
    assert info2 is not None and info2["gba_chi2"] is None
