import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models import roadmap as rmx
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.ops import lie

SPEC = gr.GridSpec2D(size=80, resolution=0.25, origin_x=-10.0, origin_y=-10.0)


def _free_occ():
    return jnp.full((SPEC.size, SPEC.size), gr.FREE, jnp.uint8)


def _kf_poses(n=4):
    # keyframes along x at y=0
    t_wc = jnp.stack([jnp.linspace(-5, 5, n), jnp.zeros(n), jnp.ones(n)], axis=-1)
    return lie.inverse(lie.SE3(jnp.broadcast_to(jnp.eye(3), (n, 3, 3)), t_wc))


def test_add_nodes_dedup():
    rm = rmx.empty_roadmap(64)
    kf = _kf_poses()
    cand = jnp.array([[0.0, 0.0], [0.2, 0.0], [3.0, 0.0], [0.1, 0.1]])
    rm = rmx.add_nodes(rm, cand, jnp.ones(4, bool), jnp.zeros(4, bool), kf, jnp.int32(4))
    # 0.2 and 0.1,0.1 are within 0.45 of the first candidate -> deduped
    assert int(rm.n_nodes) == 2
    rm2 = rmx.add_nodes(rm, cand, jnp.ones(4, bool), jnp.zeros(4, bool), kf, jnp.int32(4))
    assert int(rm2.n_nodes) == 2  # idempotent


def test_edges_and_shortest_paths():
    rm = rmx.empty_roadmap(64)
    kf = _kf_poses()
    # chain of nodes 2 m apart: 0..8 along x
    xs = jnp.arange(-4.0, 5.0, 2.0)
    cand = jnp.stack([xs, jnp.zeros_like(xs)], axis=-1)
    rm = rmx.add_nodes(rm, cand, jnp.ones(xs.shape[0], bool), jnp.zeros(xs.shape[0], bool), kf, jnp.int32(4))
    rm = rmx.connect_edges(rm, SPEC, _free_occ(), max_edge_length=2.5)
    dist, parent, src = rmx.shortest_paths(rm, jnp.array([-4.0, 0.0]))
    d = np.asarray(dist[: xs.shape[0]])
    np.testing.assert_allclose(d, np.arange(0, 2 * xs.shape[0], 2.0), atol=0.2)
    # path extraction walks back to the source
    path = rmx.extract_path(rm, parent, int(src), int(xs.shape[0] - 1))
    assert path[0] == int(src) and path[-1] == xs.shape[0] - 1
    assert len(path) == xs.shape[0]


def test_wall_blocks_edges():
    rm = rmx.empty_roadmap(16)
    kf = _kf_poses()
    cand = jnp.array([[-2.0, 0.0], [2.0, 0.0]])
    rm = rmx.add_nodes(rm, cand, jnp.ones(2, bool), jnp.zeros(2, bool), kf, jnp.int32(4))
    occ = np.full((SPEC.size, SPEC.size), gr.FREE, np.uint8)
    occ[:, SPEC.size // 2] = gr.LETHAL   # wall at x=0
    rm = rmx.connect_edges(rm, SPEC, jnp.asarray(occ), max_edge_length=10.0)
    dist, _, _ = rmx.shortest_paths(rm, jnp.array([-2.0, 0.0]))
    assert float(dist[1]) > 1e8  # unreachable through the wall
    # free map connects them
    rm2 = rmx.connect_edges(rm, SPEC, _free_occ(), max_edge_length=10.0)
    dist2, _, _ = rmx.shortest_paths(rm2, jnp.array([-2.0, 0.0]))
    np.testing.assert_allclose(float(dist2[1]), 4.0, atol=0.2)


def test_unknown_fraction_blocks_edges():
    rm = rmx.empty_roadmap(16)
    kf = _kf_poses()
    cand = jnp.array([[-4.0, 0.0], [4.0, 0.0]])
    rm = rmx.add_nodes(rm, cand, jnp.ones(2, bool), jnp.zeros(2, bool), kf, jnp.int32(4))
    occ = np.full((SPEC.size, SPEC.size), gr.UNKNOWN, np.uint8)
    occ[:, : SPEC.size // 2] = gr.FREE   # right half unknown
    rm = rmx.connect_edges(rm, SPEC, jnp.asarray(occ), max_edge_length=10.0,
                           max_unknown_fraction=0.3)
    assert int((rm.adj[0] >= 0).sum()) == 0  # >30% unknown -> no edge


def test_reanchor_moves_nodes():
    rm = rmx.empty_roadmap(16)
    kf = _kf_poses(2)
    cand = jnp.array([[-5.0, 0.5], [5.0, 0.5]])
    rm = rmx.add_nodes(rm, cand, jnp.ones(2, bool), jnp.zeros(2, bool), kf, jnp.int32(2))
    # shift keyframe 1 (near x=+5) by +1 m in world x
    shift = lie.se3_exp(jnp.array([-1.0, 0, 0, 0, 0, 0]))
    kf2 = lie.SE3(
        kf.R.at[1].set(lie.compose(shift, lie.SE3(kf.R[1], kf.t[1])).R),
        kf.t.at[1].set(lie.compose(shift, lie.SE3(kf.R[1], kf.t[1])).t),
    )
    rm2 = rmx.reanchor_nodes(rm, kf2)
    np.testing.assert_allclose(np.asarray(rm2.xy[0]), np.asarray(rm.xy[0]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rm2.xy[1]), np.asarray(rm.xy[1]) + np.array([1.0, 0.0]), atol=1e-5
    )
