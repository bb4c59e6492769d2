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
