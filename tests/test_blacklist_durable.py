"""Durable blacklists: circles evicted from the fixed-capacity device
buffer must be rasterized into the persistent lethal overlay, so an old
blacklisted goal stays excluded for the whole mission.

Reference capability: FullPathOptimizer.cpp:25-83 grows its blacklist
unboundedly; our device buffer is capped at 64 circles for shape
stability, so durability comes from the overlay instead.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models.exploration import ExplorationServer
from fitslam_tpu.models.sim_nav import SimNavInterface
from fitslam_tpu.models import sim_robot as sim
from fitslam_tpu.models import nav as navx
from fitslam_tpu.ops import frontier as fx
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.utils.config import FitSlamConfig

SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)


def _make_server():
    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg,
        exploration_bt=dataclasses.replace(
            cfg.exploration_bt, bootstrap_enabled=False),
        fisher_information=dataclasses.replace(
            cfg.fisher_information, enabled=False),
    )
    occ = jnp.full((SPEC.size, SPEC.size), gr.UNKNOWN, jnp.uint8)
    robot = sim.DiffDriveRobot(x=0.0, y=0.0, yaw=0.0)
    nav = SimNavInterface(cfg, SPEC, robot, lambda: occ, dt=0.1)
    server = ExplorationServer(
        cfg, SPEC, lambda: occ, nav,
        get_robot_pose=lambda: (robot.xy, robot.yaw),
    )
    return server, cfg


def _frontiers_at(points):
    F = 16
    goal = np.full((F, 2), 1e6, np.float32)
    valid = np.zeros((F,), bool)
    for i, p in enumerate(points):
        goal[i] = p
        valid[i] = True
    return fx.Frontiers(
        uid=jnp.zeros((F,), jnp.int32),
        goal_xy=jnp.asarray(goal),
        centroid_xy=jnp.asarray(goal),
        size=jnp.ones((F,), jnp.int32),
        valid=jnp.asarray(valid),
    )


def test_evicted_blacklist_goal_stays_excluded():
    server, cfg = _make_server()
    cap = server.BLACKLIST_CAP
    oldest = np.array([-5.0, -5.0], np.float32)

    # push the oldest circle, then flood the buffer with > cap others far away
    server.blacklist_xy.append(oldest)
    for i in range(cap + 20):
        # spread within the grid so each rasterizes to real cells
        x = -7.0 + 0.12 * i
        server.blacklist_xy.append(np.array([x, 6.5], np.float32))

    fr = _frontiers_at([oldest, np.array([5.0, -5.0], np.float32)])
    mask = np.asarray(server._blacklist_mask(fr))

    # eviction happened: buffer bounded, overlay gained lethal cells
    assert len(server.blacklist_xy) <= cap
    overlay = np.asarray(server.lethal_overlay)
    assert overlay.any(), "evicted circles were not rasterized"

    # the oldest circle is durable: either still in the circle mask or
    # covered by the lethal overlay at its cell
    cell, ok = SPEC.world_to_cell(jnp.asarray(oldest))
    cell = np.asarray(cell)
    assert bool(ok)
    covered = bool(mask[0]) or bool(overlay[cell[1], cell[0]])
    assert covered, "oldest blacklisted goal silently came back"

    # a never-blacklisted goal is unaffected
    cell2, _ = SPEC.world_to_cell(jnp.asarray([5.0, -5.0]))
    cell2 = np.asarray(cell2)
    assert not bool(mask[1])
    assert not bool(overlay[cell2[1], cell2[0]])

    # overlay feeds the tick's occupancy: the region can never be a
    # frontier again (lethal cells disqualify frontier candidacy)
    occ = navx.apply_overlay(
        jnp.full((SPEC.size, SPEC.size), gr.UNKNOWN, jnp.uint8),
        server.lethal_overlay)
    assert np.asarray(occ)[cell[1], cell[0]] == gr.LETHAL or bool(mask[0])


def test_mark_lethal_discs_padding_rows_never_match():
    overlay = jnp.zeros((SPEC.size, SPEC.size), bool)
    buf = np.zeros((8, 3), np.float32)
    buf[:, :2] = 1e9
    buf[0] = [0.0, 0.0, 0.6]
    out = np.asarray(navx.mark_lethal_discs(SPEC, overlay, jnp.asarray(buf)))
    cell, _ = SPEC.world_to_cell(jnp.asarray([0.0, 0.0]))
    cell = np.asarray(cell)
    assert out[cell[1], cell[0]]
    # only a small disc, not the padding blowing up the whole grid
    assert out.sum() < 40
