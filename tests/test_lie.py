import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from fitslam_tpu.ops import lie


def _rand_rotvec(key, n, scale=2.5):
    """Random rotation vectors with |phi| uniform in [0, scale], scale < pi
    so exp/log roundtrips are well-defined."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (n, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    mag = jax.random.uniform(k2, (n, 1), minval=0.0, maxval=scale)
    return axis * mag


def test_so3_exp_matches_scipy():
    phi = np.asarray(_rand_rotvec(jax.random.PRNGKey(0), 64, scale=3.0))
    R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    R_ref = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip():
    phi = np.asarray(_rand_rotvec(jax.random.PRNGKey(1), 64, scale=3.0))
    R = lie.so3_exp(jnp.asarray(phi))
    phi2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(phi2, phi, atol=1e-4)


def test_so3_log_near_pi():
    axis = np.array([[1.0, 0.0, 0.0], [0.0, 1 / np.sqrt(2), 1 / np.sqrt(2)]])
    for theta in [np.pi - 1e-5, np.pi - 1e-4]:
        phi = theta * axis
        R = lie.so3_exp(jnp.asarray(phi, jnp.float32))
        phi2 = np.asarray(lie.so3_log(R))
        # log may return the equivalent rotation; compare via exp
        R2 = np.asarray(lie.so3_exp(jnp.asarray(phi2)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-4)


def test_so3_exp_zero():
    R = lie.so3_exp(jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
    # gradient is finite at zero
    g = jax.grad(lambda p: jnp.sum(lie.so3_exp(p)))(jnp.zeros((3,)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_log_roundtrip():
    xi = np.asarray(0.8 * jax.random.normal(jax.random.PRNGKey(2), (32, 6)))
    T = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_compose_inverse():
    key = jax.random.PRNGKey(3)
    xi = 0.5 * jax.random.normal(key, (16, 6))
    T = lie.se3_exp(xi)
    I = lie.compose(T, lie.inverse(T))
    np.testing.assert_allclose(np.asarray(I.R), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I.t), np.zeros((16, 3)), atol=1e-5)


def test_apply_matches_matrix():
    xi = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (6,))
    T = lie.se3_exp(xi)
    pts = jax.random.normal(jax.random.PRNGKey(5), (10, 3))
    out = np.asarray(lie.apply(T, pts))
    M = np.asarray(T.matrix())
    expected = (M[:3, :3] @ np.asarray(pts).T).T + M[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_adjoint_identity():
    xi = 0.4 * jax.random.normal(jax.random.PRNGKey(6), (6,))
    eps = 0.01 * jax.random.normal(jax.random.PRNGKey(7), (6,))
    T = lie.se3_exp(xi)
    lhs = lie.compose(lie.compose(T, lie.se3_exp(eps)), lie.inverse(T))
    rhs = lie.se3_exp(lie.adjoint(T) @ eps)
    np.testing.assert_allclose(np.asarray(lhs.matrix()), np.asarray(rhs.matrix()), atol=1e-4)


def test_quat_roundtrip():
    phi = np.asarray(_rand_rotvec(jax.random.PRNGKey(8), 64, scale=2.0))
    R = lie.so3_exp(jnp.asarray(phi))
    q = lie.quat_from_rotmat(R)
    R2 = lie.rotmat_from_quat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # scipy agreement (scipy uses x,y,z,w order)
    q_ref = Rotation.from_matrix(np.asarray(R)).as_quat()
    q_ref = np.concatenate([q_ref[:, 3:4], q_ref[:, :3]], axis=1)
    q_ref *= np.where(q_ref[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(np.abs(np.asarray(q)), np.abs(q_ref), atol=1e-5)


def test_interpolate_endpoints():
    A = lie.se3_exp(0.3 * jax.random.normal(jax.random.PRNGKey(9), (6,)))
    B = lie.se3_exp(0.3 * jax.random.normal(jax.random.PRNGKey(10), (6,)))
    for alpha, ref in [(0.0, A), (1.0, B)]:
        M = lie.interpolate(A, B, alpha)
        np.testing.assert_allclose(np.asarray(M.matrix()), np.asarray(ref.matrix()), atol=1e-5)


def test_jit_and_vmap():
    f = jax.jit(lambda xi: lie.se3_log(lie.se3_exp(xi)))
    xi = 0.3 * jax.random.normal(jax.random.PRNGKey(11), (4, 6))
    np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)
    g = jax.vmap(lambda x: lie.se3_exp(x).t)(xi)
    assert g.shape == (4, 3)
