import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.ops import fisher, lie


def test_bearing_jacobian_matches_autodiff():
    p = jnp.array([0.4, -0.2, 3.0])

    def bearing(xi, p_w):
        # local perturbation of the camera: p_c' = R(xi)^T? reference applies
        # translation -I and rotation [p]x — equivalent to differentiating
        # f(p - t + [p]x phi ...) — check against the chain rule directly:
        dp = -xi[:3] + jnp.cross(xi[3:], p_w) * (-1.0)
        pc = p_w + dp
        return pc / jnp.linalg.norm(pc)

    J = fisher.bearing_jacobian_local(p)
    J_ad = jax.jacfwd(lambda xi: bearing(xi, p))(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-4)


def test_information_decreases_with_distance():
    near = fisher.point_information_local(jnp.array([0.0, 0.0, 2.0]))
    far = fisher.point_information_local(jnp.array([0.0, 0.0, 10.0]))
    assert float(near) > float(far) > 0.0


def test_pose_information_saturation():
    """Many landmarks in one voxel must contribute far less than the same
    number spread out (FisherInfoManager saturation)."""
    key = jax.random.PRNGKey(0)
    # 32 landmarks almost at the same spot (one voxel)
    clustered = jnp.array([1.0, 0.5, 5.0]) + 0.005 * jax.random.normal(key, (32, 3))
    # 32 landmarks spread widely
    spread = jnp.concatenate(
        [
            jax.random.uniform(jax.random.fold_in(key, 1), (32, 2), minval=-4, maxval=4),
            jax.random.uniform(jax.random.fold_in(key, 2), (32, 1), minval=3, maxval=10),
        ],
        axis=-1,
    )
    valid = jnp.ones((32,), bool)
    i_clustered = float(fisher.pose_information(clustered, valid))
    i_spread = float(fisher.pose_information(spread, valid))
    assert i_clustered < i_spread * 0.5, (i_clustered, i_spread)


def test_pose_information_invalid_masked():
    pts = jnp.array([[0.0, 0.0, 3.0], [0.5, 0.5, 4.0]])
    both = float(fisher.pose_information(pts, jnp.array([True, True])))
    one = float(fisher.pose_information(pts, jnp.array([True, False])))
    none = float(fisher.pose_information(pts, jnp.array([False, False])))
    assert both > one > none == 0.0


def test_safety_threshold():
    assert bool(fisher.is_pose_safe(jnp.float32(600.0), 550.0))
    assert not bool(fisher.is_pose_safe(jnp.float32(500.0), 550.0))


def test_frontier_pair_information_fov():
    # landmarks on +x axis; pose at origin looking toward frontier at +x
    pts = jnp.array([[5.0, 0.0], [5.0, 10.0], [-5.0, 0.0]])
    info = jnp.ones((3,))
    valid = jnp.ones((3,), bool)
    pose = jnp.zeros((1, 2))
    target = jnp.array([[10.0, 0.0]])
    s = fisher.frontier_pair_information(pts, info, valid, pose, target)
    assert float(s[0]) == 1.0  # only the landmark straight ahead is inside


def test_lookup_table_matches_direct():
    vals, (xs, ys, zs) = fisher.generate_lookup_table(
        x_range=(1.0, 3.0), yz_half=1.0, step=0.5
    )
    # sample one voxel and check against direct computation
    p = jnp.array([ys[1], zs[2], xs[0]])
    direct = fisher.point_information_local(p)
    np.testing.assert_allclose(float(vals[0, 1, 2]), float(direct), rtol=1e-5)
    assert bool(jnp.isfinite(vals).all())


def test_lookup_table_roundtrip_and_gather(tmp_path):
    import numpy as np

    vals, axes = fisher.generate_lookup_table(
        x_range=(0.5, 6.0), yz_half=3.0, step=0.25, noise_var=0.01
    )
    p = str(tmp_path / "fi_lookup.dat")
    fisher.save_lookup_table(p, vals, axes)
    vals2, axes2 = fisher.load_lookup_table(p)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals2), rtol=1e-6)
    for a, b in zip(axes, axes2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # device gather at exact voxel centers must equal the closed form
    key = jax.random.PRNGKey(0)
    pts = jnp.stack(
        [
            jax.random.uniform(key, (64,), minval=-2.5, maxval=2.5),
            jax.random.uniform(jax.random.fold_in(key, 1), (64,), minval=-2.5, maxval=2.5),
            jax.random.uniform(jax.random.fold_in(key, 2), (64,), minval=1.0, maxval=5.5),
        ],
        axis=-1,
    )
    xs, ys, zs = axes2
    axes_min = jnp.asarray([xs[0], ys[0], zs[0]])
    step = jnp.asarray([xs[1] - xs[0], ys[1] - ys[0], zs[1] - zs[0]])
    # snap points to voxel centers so gather == closed form exactly
    coords = jnp.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=-1)
    snapped = jnp.round((coords - axes_min) / step) * step + axes_min
    pts_snap = jnp.stack([snapped[:, 1], snapped[:, 2], snapped[:, 0]], axis=-1)
    got = fisher.lookup_information(vals2, axes_min, step, pts_snap)
    want = fisher.point_information_local(pts_snap, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4)

    # out-of-table points return 0 (hash-miss behavior)
    far = jnp.asarray([[50.0, 50.0, 50.0]])
    assert float(fisher.lookup_information(vals2, axes_min, step, far)[0]) == 0.0


def test_lookup_table_bad_magic(tmp_path):
    import pytest

    p = str(tmp_path / "junk.dat")
    open(p, "wb").write(b"nope" * 10)
    with pytest.raises(ValueError):
        fisher.load_lookup_table(p)
