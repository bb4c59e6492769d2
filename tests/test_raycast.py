import jax.numpy as jnp
import numpy as np

from fitslam_tpu.ops import grid as gr
from fitslam_tpu.ops import raycast as rc

SPEC = gr.GridSpec2D(size=80, resolution=0.25, origin_x=-10.0, origin_y=-10.0)


def _occ_half_unknown():
    """Free for x < 0, unknown for x >= 0."""
    G = SPEC.size
    occ = np.full((G, G), gr.UNKNOWN, np.uint8)
    occ[:, : G // 2] = gr.FREE
    return jnp.asarray(occ)


def test_arrival_information_prefers_unknown_direction():
    occ = _occ_half_unknown()
    pt = jnp.array([[-0.5, 0.0]])  # just inside free space, unknown to +x
    heading, info = rc.arrival_information(
        SPEC, occ, pt, jnp.ones((1,), bool), depth_m=2.0
    )
    assert float(info[0]) > 10.0
    # best heading toward +x (unknown side)
    h = float(heading[0])
    assert np.cos(h) > 0.7, h


def test_arrival_information_blocked_by_wall():
    G = SPEC.size
    occ = np.full((G, G), gr.FREE, np.uint8)
    occ[:, G // 2 + 2 :] = gr.UNKNOWN
    occ[:, G // 2 : G // 2 + 2] = gr.LETHAL  # wall between free and unknown
    pt = jnp.array([[-0.5, 0.0]])
    _, info = rc.arrival_information(SPEC, jnp.asarray(occ), pt, jnp.ones((1,), bool))
    assert float(info[0]) == 0.0  # wall blocks every ray before unknown


def test_segment_clearance():
    G = SPEC.size
    occ = np.full((G, G), gr.FREE, np.uint8)
    occ[:, G // 2] = gr.LETHAL  # vertical wall at x = 0
    occ_j = jnp.asarray(occ)
    a = jnp.array([[-5.0, 0.0], [-5.0, 0.0]])
    b = jnp.array([[5.0, 0.0], [-1.0, 0.0]])  # first crosses wall, second not
    hit, unk = rc.segment_clearance(SPEC, occ_j, a, b)
    assert bool(hit[0]) and not bool(hit[1])
    assert float(unk[0]) == 0.0


def test_segment_unknown_fraction():
    occ = _occ_half_unknown()
    a = jnp.array([[-5.0, 0.0]])
    b = jnp.array([[5.0, 0.0]])  # half the segment crosses unknown
    hit, unk = rc.segment_clearance(SPEC, occ, a, b)
    assert not bool(hit[0])
    assert 0.3 < float(unk[0]) < 0.7


def test_free_distance_probe():
    G = SPEC.size
    occ = np.full((G, G), gr.FREE, np.uint8)
    occ[:, G // 2 + 8] = gr.LETHAL  # wall 2 m ahead in +x
    dirs = jnp.array([[1.0, 0.0], [-1.0, 0.0]])
    d = rc.free_distance(SPEC, jnp.asarray(occ), jnp.zeros((2,)), dirs, max_dist=2.5)
    assert float(d[0]) < 2.2       # blocked by the wall
    assert float(d[1]) == 2.5      # open behind
