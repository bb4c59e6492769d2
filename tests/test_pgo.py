import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.ops import lie, pgo


def _circle_poses(n, radius=5.0):
    s = jnp.linspace(0, 2 * np.pi, n, endpoint=False)
    t = jnp.stack([radius * jnp.cos(s), radius * jnp.sin(s), jnp.zeros_like(s)], -1)
    R = lie.yaw_to_rotmat(s)
    return lie.SE3(R, t)


def test_edge_residual_zero_for_consistent():
    T = _circle_poses(8)
    Ti = lie.SE3(T.R[0], T.t[0])
    Tj = lie.SE3(T.R[1], T.t[1])
    T_ij = lie.compose(Ti, lie.inverse(Tj))
    r = pgo.edge_residual(Ti, Tj, T_ij)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)


def test_pose_graph_closes_loop():
    n = 16
    T_gt = _circle_poses(n)

    # integrate odometry with bias -> drifted initial poses
    key = jax.random.PRNGKey(0)
    rel_gt = lie.compose(
        lie.SE3(T_gt.R[:-1], T_gt.t[:-1]),
        lie.inverse(lie.SE3(T_gt.R[1:], T_gt.t[1:])),
    )
    bias = jnp.concatenate(
        [jnp.array([0.02, -0.01, 0.0, 0.0, 0.0, 0.01])[None, :]] * (n - 1)
    )
    rel_noisy = lie.compose(lie.se3_exp(bias), rel_gt)

    Rs, ts = [T_gt.R[0]], [T_gt.t[0]]
    for k in range(n - 1):
        # T_cw relation: rel maps j->i (i=k, j=k+1): T_j = rel^-1 * T_i
        T_prev = lie.SE3(Rs[-1], ts[-1])
        T_next = lie.compose(lie.inverse(lie.SE3(rel_noisy.R[k], rel_noisy.t[k])), T_prev)
        Rs.append(T_next.R)
        ts.append(T_next.t)
    T_init = lie.SE3(jnp.stack(Rs), jnp.stack(ts))
    drift0 = float(jnp.linalg.norm(T_init.t[-1] - T_gt.t[-1]))
    assert drift0 > 0.2  # meaningful drift

    # edges: noisy odometry + perfect loop edge (last -> first)
    E = n
    i = jnp.concatenate([jnp.arange(n - 1), jnp.array([0])]).astype(jnp.int32)
    j = jnp.concatenate([jnp.arange(1, n), jnp.array([n - 1])]).astype(jnp.int32)
    T_loop = lie.compose(
        lie.SE3(T_gt.R[0], T_gt.t[0]), lie.inverse(lie.SE3(T_gt.R[-1], T_gt.t[-1]))
    )
    T_ij = lie.SE3(
        jnp.concatenate([rel_noisy.R, T_loop.R[None]]),
        jnp.concatenate([rel_noisy.t, T_loop.t[None]]),
    )
    weight = jnp.concatenate([jnp.ones((n - 1,)), jnp.array([10.0])])
    edges = pgo.PoseGraphEdges(i, j, T_ij, weight, jnp.ones((E,), bool))

    fixed = jnp.zeros((n,), bool).at[0].set(True)
    T_opt, chis = pgo.optimize_pose_graph(
        T_init, jnp.ones((n,), bool), edges, fixed, iters=20
    )
    chis = np.asarray(chis)
    assert chis[-1] < chis[0]
    # loop endpoint error collapses
    drift1 = float(jnp.linalg.norm(T_opt.t[-1] - T_gt.t[-1]))
    assert drift1 < drift0 * 0.35, (drift0, drift1)
    # gauge held
    np.testing.assert_allclose(np.asarray(T_opt.t[0]), np.asarray(T_gt.t[0]), atol=1e-6)


def test_invalid_edges_ignored():
    n = 6
    T_gt = _circle_poses(n)
    odo = pgo.odometry_edges(T_gt, jnp.int32(n), n - 1)
    # add garbage edge marked invalid
    bad = pgo.PoseGraphEdges(
        i=jnp.array([0], jnp.int32), j=jnp.array([3], jnp.int32),
        T_ij=lie.se3_exp(jnp.array([[5.0, 5, 5, 1, 1, 1]])),
        weight=jnp.array([100.0]), valid=jnp.array([False]),
    )
    edges = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), odo, bad)
    fixed = jnp.zeros((n,), bool).at[0].set(True)
    T_opt, _ = pgo.optimize_pose_graph(T_gt, jnp.ones((n,), bool), edges, fixed, iters=5)
    np.testing.assert_allclose(np.asarray(T_opt.t), np.asarray(T_gt.t), atol=1e-4)


def test_odometry_edges_consistent():
    T = _circle_poses(8)
    edges = pgo.odometry_edges(T, jnp.int32(8), 10)
    assert int(edges.valid.sum()) == 7
    r = jax.vmap(pgo.edge_residual)(
        lie.SE3(T.R[edges.i], T.t[edges.i]),
        lie.SE3(T.R[edges.j], T.t[edges.j]),
        edges.T_ij,
    )
    np.testing.assert_allclose(np.asarray(r[edges.valid]), 0.0, atol=1e-5)
