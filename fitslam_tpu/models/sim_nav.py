"""Simulated navigation stack: the Nav2-equivalent seam closed in-process.

Implements the NavInterface boundary (SURVEY.md §2.4 N1-N4) against the
simulated rover: wavefront potential planning at the configured replan rate,
regulated pure-pursuit control, goal state machine {ACTIVE, DONE, ABORTED}
matching Nav2Interface's states (Nav2Interface.cpp:93-130).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models import nav as navx
from fitslam_tpu.models.exploration import GoalStatus, NavInterface
from fitslam_tpu.models.sim_robot import DiffDriveRobot
from fitslam_tpu.ops.grid import GridSpec2D
from fitslam_tpu.utils.config import FitSlamConfig


class SimNavInterface(NavInterface):
    def __init__(self, cfg: FitSlamConfig, spec: GridSpec2D, robot: DiffDriveRobot,
                 get_occupancy: Callable[[], jax.Array], dt: float = 0.1):
        self.cfg = cfg
        self.spec = spec
        self.robot = robot
        self.get_occupancy = get_occupancy
        self.dt = dt
        self.controller = navx.PurePursuit(
            desired_speed=cfg.nav.desired_speed,
            lookahead=cfg.nav.lookahead_m,
            rotate_to_heading=cfg.nav.rotate_to_heading,
        )
        self._goal: Optional[np.ndarray] = None
        self._goal_heading = 0.0
        self._status = GoalStatus.NONE
        self._path: Optional[np.ndarray] = None
        self._ext_path: Optional[np.ndarray] = None
        self._stuck_steps = 0
        self._replan_countdown = 0

    # -- NavInterface --

    def send_goal(self, goal_xy, heading: float):
        self._goal = np.asarray(goal_xy, np.float64)
        self._goal_heading = float(heading)
        self._status = GoalStatus.ACTIVE
        self._path = None
        self._stuck_steps = 0
        self._replan_countdown = 0

    def cancel(self):
        self._goal = None
        self._path = None
        self._ext_path = None
        self._status = GoalStatus.NONE

    def set_path(self, path_xy: np.ndarray):
        """Receive the exploration-published refined plan (the
        `frontier_roadmap_nav2_plan` topic of the reference). Tracked
        directly when cfg.nav.planner == "roadmap" (E16,
        roadmap_planner_plugin.cpp:1-80)."""
        self._ext_path = np.asarray(path_xy, np.float64)

    def status(self) -> GoalStatus:
        return self._status

    def drive_open_loop(self, v: float, omega: float):
        self.robot.step(v, omega, self.dt)

    # -- control loop (called at controller rate by the simulation) --

    def step(self):
        if self._status != GoalStatus.ACTIVE or self._goal is None:
            return
        occ = self.get_occupancy()
        if (self.cfg.nav.planner == "roadmap" and self._ext_path is not None
                and len(self._ext_path) >= 2):
            # roadmap-planner mode: follow the published exploration plan
            self._path = np.asarray(self._ext_path)
        elif self._path is None or self._replan_countdown <= 0:
            pot = navx.wavefront_potential(
                self.spec, occ, jnp.asarray(self._goal, jnp.float32),
                iters=self.cfg.nav.wavefront_iters,
                allow_unknown=self.cfg.nav.allow_unknown,
            )
            path, ok = navx.descend_potential(
                self.spec, pot, jnp.asarray(self.robot.xy, jnp.float32)
            )
            pts = np.asarray(path)[np.asarray(ok)]
            if len(pts) == 0:
                # maybe we're already basically there
                if np.linalg.norm(self.robot.xy - self._goal) < self.cfg.nav.planner_tolerance_m:
                    self._status = GoalStatus.DONE
                else:
                    self._status = GoalStatus.ABORTED
                return
            self._path = pts
            self._replan_countdown = max(
                1, int(self.cfg.nav.replan_rate_hz and
                       (1.0 / self.cfg.nav.replan_rate_hz) / self.dt)
            )
        self._replan_countdown -= 1
        if self._path is None:
            return  # roadmap mode, no plan published yet

        v, w, reached = self.controller.command(self.robot.xy, self.robot.yaw, self._path)
        if reached or np.linalg.norm(self.robot.xy - self._goal) < self.cfg.nav.planner_tolerance_m:
            # the goal is a POSE: rotate to the commanded arrival heading
            # before reporting success (Nav2 navigate_to_pose semantics;
            # the exploration server's best heading theta* points into the
            # unknown so the camera maps the frontier on arrival)
            if self.cfg.nav.rotate_to_heading:
                dyaw = (self._goal_heading - self.robot.yaw + math.pi) % (2 * math.pi) - math.pi
                if abs(dyaw) > 0.15:
                    w_cap = getattr(self.controller, "max_omega", 1.0)
                    w_cmd = math.copysign(min(w_cap, abs(dyaw) / self.dt), dyaw)
                    self.robot.step(0.0, w_cmd, self.dt)
                    return
            self._status = GoalStatus.DONE
            return
        before = self.robot.xy.copy()
        self.robot.step(v, w, self.dt)
        if np.linalg.norm(self.robot.xy - before) < 1e-4 and abs(w) < 1e-3:
            self._stuck_steps += 1
            if self._stuck_steps > 50:
                self._status = GoalStatus.ABORTED
        else:
            self._stuck_steps = 0
