"""Distributed BA on the virtual 8-device CPU mesh: must agree with the
single-device solver and actually shard (SURVEY.md §2.5 TPU mapping)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitslam_tpu.ops import ba, lie
from fitslam_tpu.parallel import dist_ba, mesh as mesh_mod
from tests.test_ba import K, _make_problem


@pytest.fixture(scope="module")
def problem():
    # obs capacity 1024 divisible by 8
    return _make_problem(jax.random.PRNGKey(7), n_kf=4, n_lm=128, n_obs=1024)


def test_matches_single_device(problem):
    prob, T_gt, pts_gt = problem
    m = mesh_mod.make_mesh(8)
    out_d, chis = dist_ba.distributed_bundle_adjust(m, K, prob, iters=6)
    out_s, stats = ba.bundle_adjust(K, prob, iters=6, damping=1e-3)
    # same final chi2 trajectory within float tolerance
    np.testing.assert_allclose(
        np.asarray(chis)[1:], np.asarray(stats.chi2)[:-1], rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_d.T_cw.t), np.asarray(out_s.T_cw.t), atol=5e-3
    )
    err = np.linalg.norm(
        np.asarray(lie.se3_log(lie.compose(out_d.T_cw, lie.inverse(T_gt)))), axis=-1
    )
    assert err[1:].max() < 0.03


def test_landmark_sharded_matches_single_device(problem):
    """Map-block sharding (BASELINE.json north star): landmarks + coupling
    tensor sharded; only pose-side reductions psum. Must agree with the
    single-device solver on the SAME repacked problem."""
    prob, T_gt, pts_gt = problem
    n_dev = 8
    packed = dist_ba.shard_problem_by_landmark(prob, n_dev)
    m = mesh_mod.make_mesh(n_dev)
    out_d, chis = dist_ba.landmark_sharded_bundle_adjust(m, K, packed, iters=6)
    out_s, stats = ba.bundle_adjust(K, packed, iters=6, damping=1e-3)
    np.testing.assert_allclose(
        np.asarray(chis)[1:], np.asarray(stats.chi2)[:-1], rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_d.T_cw.t), np.asarray(out_s.T_cw.t), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_d.points), np.asarray(out_s.points), atol=5e-3
    )
    err = np.linalg.norm(
        np.asarray(lie.se3_log(lie.compose(out_d.T_cw, lie.inverse(T_gt)))), axis=-1
    )
    assert err[1:].max() < 0.03


def test_shard_problem_routes_all_observations(problem):
    prob, _, _ = problem
    packed = dist_ba.shard_problem_by_landmark(prob, 8)
    assert int(packed.obs.valid.sum()) == int(prob.obs.valid.sum())
    Lb = prob.points.shape[0] // 8
    lm = np.asarray(packed.obs.lm).reshape(8, -1)
    ok = np.asarray(packed.obs.valid).reshape(8, -1)
    for d in range(8):
        assert (lm[d][ok[d]] // Lb == d).all()


def test_mesh_sizes(problem):
    prob, T_gt, _ = problem
    for nd in (1, 2, 4):
        m = mesh_mod.make_mesh(nd)
        out, chis = dist_ba.distributed_bundle_adjust(m, K, prob, iters=4)
        err = np.linalg.norm(
            np.asarray(lie.se3_log(lie.compose(out.T_cw, lie.inverse(T_gt)))), axis=-1
        )
        assert err[1:].max() < 0.05, (nd, err)


def test_live_gba_landmark_sharded_matches_single():
    """The LIVE loop-closing GBA path on a >1-device mesh
    (slam_map.global_ba_dist -> landmark-sharded solver) must produce the
    same corrected map as the single-device global_ba (VERDICT r04
    next-step #9: dist-BA wired into the live system, not just benches)."""
    from fitslam_tpu.models import slam_map as sm
    from tests.test_slam_map import _multiview_map, K as K_map

    m, gt_T, pts_w = _multiview_map(jax.random.PRNGKey(7))
    mesh = mesh_mod.make_mesh(8)
    m_d, chis = sm.global_ba_dist(m, K_map, mesh, iters=6)
    m_s, stats = sm.global_ba(m, K_map, iters=6)
    np.testing.assert_allclose(np.asarray(m_d.kf_T_cw.t),
                               np.asarray(m_s.kf_T_cw.t), atol=5e-3)
    val = np.asarray(m.lm_valid)
    np.testing.assert_allclose(np.asarray(m_d.lm_pos)[val],
                               np.asarray(m_s.lm_pos)[val], atol=5e-3)
