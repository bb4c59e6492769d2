"""Simulated differential-drive rover + sensor (test/bench fixture).

Replaces the reference's gz-sim vehicle + sensorSimulator module
(SURVEY.md §2.3 E19, §4.5): a kinematic unicycle stepped by (v, omega)
commands, and a range-limited reveal sensor that marks ground-truth
occupancy into an explored map (coverage accounting for light/rapid modes,
active_slam_exploration_params.yaml:51-58).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.utils.jit import vjit
from fitslam_tpu.ops.grid import LETHAL, UNKNOWN, GridSpec2D
from fitslam_tpu.ops import raycast


class DiffDriveRobot:
    """Kinematic unicycle. Positions in world meters; yaw in radians."""

    def __init__(self, x=0.0, y=0.0, yaw=0.0, v_max=0.6, w_max=1.2):
        self.x, self.y, self.yaw = float(x), float(y), float(yaw)
        self.v_max, self.w_max = v_max, w_max
        self.trajectory = [(self.x, self.y, self.yaw)]
        # last executed twist (after clipping) — what a wheel encoder would
        # integrate; the EKF layer's odometry source
        self.last_twist: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def xy(self) -> np.ndarray:
        return np.array([self.x, self.y])

    def step(self, v: float, omega: float, dt: float):
        v = float(np.clip(v, -self.v_max, self.v_max))
        omega = float(np.clip(omega, -self.w_max, self.w_max))
        self.x += v * math.cos(self.yaw) * dt
        self.y += v * math.sin(self.yaw) * dt
        self.yaw = (self.yaw + omega * dt + math.pi) % (2 * math.pi) - math.pi
        self.trajectory.append((self.x, self.y, self.yaw))
        self.last_twist = (v, omega, dt)


@vjit(static_argnames=("spec", "n_rays", "n_steps"))
def reveal_sensor(
    spec: GridSpec2D,
    gt_occ: jax.Array,         # (G, G) ground-truth occupancy {FREE, LETHAL}
    explored: jax.Array,       # (G, G) uint8 current explored map (UNKNOWN where unseen)
    robot_xy: jax.Array,       # (2,)
    range_m: float = 4.0,
    n_rays: int = 128,
    n_steps: int = 24,
) -> jax.Array:
    """Raycast reveal: cells along each ray become known (copied from the
    ground truth) until a wall blocks the ray; the wall cell itself is
    revealed as lethal. Returns the updated explored map."""
    G = spec.size
    theta = jnp.arange(n_rays) * (2.0 * jnp.pi / n_rays)
    dirs = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    ts = (jnp.arange(n_steps) + 1.0) * (range_m / n_steps)
    pos = robot_xy[None, None, :] + dirs[:, None, :] * ts[None, :, None]  # (R, S, 2)
    cell, inb = spec.world_to_cell(pos)
    flat = jnp.where(inb, cell[..., 1] * G + cell[..., 0], G * G)
    gt = jnp.where(inb, gt_occ.reshape(-1)[jnp.minimum(flat, G * G - 1)], jnp.uint8(LETHAL))

    lethal = ((gt != UNKNOWN) & (gt >= LETHAL)).astype(jnp.int32)
    blocked_before = (jnp.cumsum(lethal, axis=-1) - lethal) > 0
    visible = jnp.logical_not(blocked_before) & inb

    upd = jnp.where(visible, gt, jnp.uint8(0))
    seen = jnp.zeros((G * G + 1,), jnp.int32).at[
        jnp.where(visible, flat, G * G).reshape(-1)
    ].max(1, mode="drop")[: G * G].reshape(G, G)
    vals = jnp.zeros((G * G + 1,), jnp.uint8).at[
        jnp.where(visible, flat, G * G).reshape(-1)
    ].max(upd.reshape(-1), mode="drop")[: G * G].reshape(G, G)

    # robot's own cell is always revealed free
    rc, r_ok = spec.world_to_cell(robot_xy)
    out = jnp.where(seen > 0, vals, explored)
    out = out.at[rc[1], rc[0]].set(jnp.uint8(0))
    return out


def make_rooms_world(spec: GridSpec2D, seed: int = 0) -> np.ndarray:
    """Ground-truth occupancy: bordered arena with a few walls + doorways."""
    G = spec.size
    occ = np.zeros((G, G), np.uint8)
    occ[:2, :] = LETHAL
    occ[-2:, :] = LETHAL
    occ[:, :2] = LETHAL
    occ[:, -2:] = LETHAL
    rng = np.random.RandomState(seed)
    # vertical wall with a door
    for frac in (0.35, 0.65):
        col = int(G * frac)
        occ[:, col] = LETHAL
        door = rng.randint(G // 5, G - G // 5)
        occ[max(0, door - 4) : door + 4, col] = 0
    # horizontal wall with a door
    row = int(G * 0.5)
    occ[row, : int(G * 0.35)] = LETHAL
    door = rng.randint(4, int(G * 0.3))
    occ[row, max(0, door - 4) : door + 4] = 0
    return occ
