import math

import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models import nav
from fitslam_tpu.ops import grid as gr

SPEC = gr.GridSpec2D(size=80, resolution=0.25, origin_x=-10.0, origin_y=-10.0)


def test_wavefront_straight_path():
    occ = jnp.full((SPEC.size, SPEC.size), gr.FREE, jnp.uint8)
    pot = nav.wavefront_potential(SPEC, occ, jnp.array([5.0, 0.0]), iters=128)
    path, ok = nav.descend_potential(SPEC, pot, jnp.array([-5.0, 0.0]))
    pts = np.asarray(path)[np.asarray(ok)]
    assert len(pts) > 10
    # ends near the goal
    assert np.linalg.norm(pts[-1] - [5.0, 0.0]) < 0.5
    # roughly straight: y excursion small
    assert np.abs(pts[:, 1]).max() < 0.6


def test_wavefront_routes_around_wall():
    occ = np.full((SPEC.size, SPEC.size), gr.FREE, np.uint8)
    c = SPEC.size // 2
    occ[c - 12 : c + 12, c] = gr.LETHAL   # wall at x=0 from y=-3..3
    pot = nav.wavefront_potential(SPEC, jnp.asarray(occ), jnp.array([3.0, 0.0]), iters=256)
    path, ok = nav.descend_potential(SPEC, pot, jnp.array([-3.0, 0.0]))
    pts = np.asarray(path)[np.asarray(ok)]
    assert np.linalg.norm(pts[-1] - [3.0, 0.0]) < 0.5
    # path must detour beyond the wall ends (|y| > 2.9 somewhere)
    assert np.abs(pts[:, 1]).max() > 2.5
    # never crosses a lethal cell
    cells, _ = SPEC.world_to_cell(jnp.asarray(pts))
    cells = np.asarray(cells)
    assert (occ[cells[:, 1], cells[:, 0]] != gr.LETHAL).all()


def test_unreachable_goal():
    occ = np.full((SPEC.size, SPEC.size), gr.FREE, np.uint8)
    c = SPEC.size // 2
    occ[c - 8 : c + 8, c - 8] = gr.LETHAL
    occ[c - 8 : c + 8, c + 8] = gr.LETHAL
    occ[c - 8, c - 8 : c + 9] = gr.LETHAL
    occ[c + 7, c - 8 : c + 9] = gr.LETHAL   # box around goal
    pot = nav.wavefront_potential(SPEC, jnp.asarray(occ), jnp.array([0.0, 0.0]), iters=256)
    # potential outside the box stays BIG
    far_cell, _ = SPEC.world_to_cell(jnp.array([-8.0, -8.0]))
    assert float(pot[int(far_cell[1]), int(far_cell[0])]) > 1e8


def test_pure_pursuit_drives_toward_path():
    pp = nav.PurePursuit(desired_speed=0.5, rotate_to_heading=True)
    path = np.stack([np.linspace(0.5, 5.0, 20), np.zeros(20)], axis=-1)
    # facing the wrong way: rotate in place first
    v, w, done = pp.command([0.0, 0.0], math.pi, path)
    assert not done and v == 0.0 and abs(w) > 0.1
    # facing along the path: drive
    v2, w2, done2 = pp.command([0.0, 0.0], 0.0, path)
    assert not done2 and v2 > 0.3 and abs(w2) < 0.2
    # at the goal
    v3, w3, done3 = pp.command([5.0, 0.0], 0.0, path)
    assert done3 and v3 == 0.0


def test_lethal_wedge_marks_and_persists():
    overlay = jnp.zeros((SPEC.size, SPEC.size), bool)
    overlay = nav.mark_lethal_wedge(SPEC, overlay, jnp.array([0.0, 0.0]),
                                    jnp.float32(0.0))
    ov = np.asarray(overlay)
    # cell 2 m ahead inside wedge, cell behind not
    ahead, _ = SPEC.world_to_cell(jnp.array([2.0, 0.0]))
    behind, _ = SPEC.world_to_cell(jnp.array([-2.0, 0.0]))
    assert ov[int(ahead[1]), int(ahead[0])]
    assert not ov[int(behind[1]), int(behind[0])]
    # persists: second wedge ORs in
    overlay2 = nav.mark_lethal_wedge(SPEC, overlay, jnp.array([0.0, 0.0]),
                                     jnp.float32(math.pi))
    ov2 = np.asarray(overlay2)
    assert ov2[int(ahead[1]), int(ahead[0])] and ov2[int(behind[1]), int(behind[0])]
    occ = nav.apply_overlay(jnp.full((SPEC.size, SPEC.size), gr.FREE, jnp.uint8), overlay2)
    assert int(np.asarray(occ)[int(ahead[1]), int(ahead[0])]) == gr.LETHAL
