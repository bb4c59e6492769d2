"""State-estimation layer: EKF sensor fusion + command multiplexer (SURVEY.md §2.4 N5).

Reference capability (robot_navigation2, config only — the nodes come from the
upstream `robot_localization` and `twist_mux` packages):

- `ekf_with_gps.yaml` configures TWO robot_localization EKF instances over the
  standard 15-dim omnidirectional state
  [x y z, roll pitch yaw, vx vy vz, wx wy wz, ax ay az]:
  an odom-frame filter fusing wheel odometry twist (odom0_config picks vx, vy)
  and IMU absolute roll/pitch/yaw orientation plus angular rates (imu0_config),
  and a map-frame filter additionally fusing GPS fixes routed through a
  navsat transform. Per-sensor boolean config masks select fused state dims;
  `*_rejection_threshold` parameters gate updates by Mahalanobis distance;
  `sensor_timeout: 0.1` forces predict-only cycles; `frequency: 30.0`
  (`dev_ws/src/robot_navigation2/config/ekf_with_gps.yaml`).
- `twist_mux.yaml` multiplexes cmd_vel sources by priority with per-topic
  timeout (navigation prio 10, joystick prio 100, timeout 0.5 s;
  `dev_ws/src/robot_navigation2/params/twist_mux.yaml`).

TPU-native design: the filter is a pure function of (state, measurement
batch). A whole window of time-stamped measurements is fused in ONE jitted
`lax.scan` — each step carries a fixed-size 15-dim measurement vector plus a
boolean config mask (exactly robot_localization's `odomN_config` semantics),
so heterogeneous sensors (odom / IMU / GPS) stream through the same kernel
with no data-dependent shapes. The 15x15 linear algebra is tiny; throughput
comes from batching steps per dispatch and from `vmap` across robots
(multi-robot parity with the reference's per-namespace EKF instances).
Masked dims are fused with infinite variance (zero Kalman gain) instead of
branching, keeping the scan body branch-free for XLA.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from functools import partial

# 15x15 covariance products compound over thousands of filter steps: pin
# full-f32 MXU passes (see ops/lie.py precision note)
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
import numpy as np

from fitslam_tpu.utils.jit import vjit

STATE_DIM = 15
# state layout (robot_localization order)
X, Y, Z, ROLL, PITCH, YAW, VX, VY, VZ, WX, WY, WZ, AX, AY, AZ = range(STATE_DIM)

BIG_VAR = 1e12  # variance assigned to unmeasured dims => zero gain
_ANGLE_DIMS = np.zeros(STATE_DIM, np.bool_)
_ANGLE_DIMS[[ROLL, PITCH, YAW]] = True


class EkfState(NamedTuple):
    x: jax.Array  # (15,)
    P: jax.Array  # (15, 15)


class MeasurementBatch(NamedTuple):
    """A fixed-size window of time-ordered sensor measurements.

    z/mask/var follow robot_localization's per-sensor config-mask model
    (ekf_with_gps.yaml odom0_config/imu0_config): mask[i] selects whether
    state dim i is observed by this row. `gate` is the Mahalanobis rejection
    threshold (<=0 disables, matching unset *_rejection_threshold).
    """

    dt: jax.Array    # (T,) seconds since previous row
    z: jax.Array     # (T, 15) measurement in state coordinates
    mask: jax.Array  # (T, 15) bool — which dims this row observes
    var: jax.Array   # (T, 15) per-dim measurement variance
    gate: jax.Array  # (T,) Mahalanobis threshold per row


def initial_state(x0: Optional[jax.Array] = None, p0: float = 1e-9,
                  p0_dynamic: float = 1.0) -> EkfState:
    """Initial filter state. Pose dims start at `p0` (robot_localization's
    1e-9 initial_estimate_covariance); velocity/rate/acceleration dims start
    at `p0_dynamic` so the first Mahalanobis-gated measurement of a dim the
    initial state says nothing about is accepted instead of rejected until
    process noise inflates P."""
    x = jnp.zeros(STATE_DIM) if x0 is None else jnp.asarray(x0, jnp.float32)
    diag = jnp.full((STATE_DIM,), p0).at[VX:].set(p0_dynamic)
    return EkfState(x=x, P=jnp.diag(diag))


def default_process_noise() -> jax.Array:
    """robot_localization's default Q diagonal (ekf_with_gps.yaml
    process_noise_covariance)."""
    q = np.array(
        [0.05, 0.05, 0.06, 0.03, 0.03, 0.06, 0.025, 0.025, 0.04,
         0.01, 0.01, 0.02, 0.01, 0.01, 0.015],
        np.float32,
    )
    return jnp.diag(jnp.asarray(q))


def _wrap_angle(a: jax.Array) -> jax.Array:
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def _transition_jacobian(x: jax.Array, dt: jax.Array) -> jax.Array:
    """Omnidirectional 3D kinematic model F = d f / d x (robot_localization's
    EKF motion model: body-frame velocities rotated into the world by the
    current RPY, constant acceleration on the linear dims)."""
    r, p, y = x[ROLL], x[PITCH], x[YAW]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    # body->world rotation (ZYX convention)
    R = jnp.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )
    F = jnp.eye(STATE_DIM)
    F = F.at[X : Z + 1, VX : VZ + 1].set(R * dt)
    F = F.at[X : Z + 1, AX : AZ + 1].set(R * (0.5 * dt * dt))
    F = F.at[VX : VZ + 1, AX : AZ + 1].set(jnp.eye(3) * dt)
    # Euler-angle rates from body angular velocity (gimbal matrix)
    tp = jnp.where(jnp.abs(cp) < 1e-6, 0.0, sp / cp)
    G = jnp.array(
        [
            [1.0, sr * tp, cr * tp],
            [0.0, cr, -sr],
            [0.0, sr / jnp.where(jnp.abs(cp) < 1e-6, 1e-6, cp),
             cr / jnp.where(jnp.abs(cp) < 1e-6, 1e-6, cp)],
        ]
    )
    F = F.at[ROLL : YAW + 1, WX : WZ + 1].set(G * dt)
    return F


def ekf_predict(state: EkfState, dt: jax.Array, Q: jax.Array) -> EkfState:
    F = _transition_jacobian(state.x, dt)
    x = _mm(F, state.x)
    x = x.at[ROLL : YAW + 1].set(_wrap_angle(x[ROLL : YAW + 1]))
    P = _mm(_mm(F, state.P), F.T) + Q * jnp.maximum(dt, 0.0)
    return EkfState(x=x, P=P)


def ekf_update(
    state: EkfState,
    z: jax.Array,
    mask: jax.Array,
    var: jax.Array,
    gate: jax.Array,
) -> Tuple[EkfState, jax.Array]:
    """Masked full-rank update: H = I, unmeasured dims get BIG_VAR so their
    Kalman gain vanishes — branch-free equivalent of robot_localization's
    config-mask row selection. Returns (state, accepted)."""
    angle = jnp.asarray(_ANGLE_DIMS)
    innov = z - state.x
    innov = jnp.where(angle, _wrap_angle(innov), innov)
    innov = jnp.where(mask, innov, 0.0)
    Rd = jnp.where(mask, jnp.maximum(var, 1e-12), BIG_VAR)
    S = state.P + jnp.diag(Rd)
    # Mahalanobis gate over the measured dims: squared distance vs nsigmas^2,
    # exactly robot_localization's checkMahalanobisThreshold (no dimension
    # scaling; *_rejection_threshold semantics)
    sol = jnp.linalg.solve(S, innov)
    m2 = _mm(innov, sol)
    accepted = jnp.where(gate > 0.0, m2 <= gate * gate, True)
    K = jnp.linalg.solve(S.T, state.P.T).T  # P S^-1
    K = K * jnp.where(accepted, 1.0, 0.0)
    x = state.x + _mm(K, innov)
    x = x.at[ROLL : YAW + 1].set(_wrap_angle(x[ROLL : YAW + 1]))
    I_KH = jnp.eye(STATE_DIM) - K
    # Joseph form for numerical symmetry
    P = _mm(_mm(I_KH, state.P), I_KH.T) + _mm(_mm(K, jnp.diag(Rd)), K.T)
    return EkfState(x=x, P=P), accepted


def _run_ekf(
    state: EkfState,
    batch: MeasurementBatch,
    Q: jax.Array,
) -> Tuple[EkfState, Tuple[jax.Array, jax.Array]]:
    def step(s, row):
        dt, z, mask, var, gate = row
        s = ekf_predict(s, dt, Q)
        s, ok = ekf_update(s, z, mask, var, gate)
        return s, (s.x, ok)

    final, (xs, ok) = jax.lax.scan(
        step, state, (batch.dt, batch.z, batch.mask, batch.var, batch.gate)
    )
    return final, (xs, ok)


#: Fuse a whole measurement window in one fused scan.
#: Returns (final state, (trajectory (T,15), accepted (T,) bool)).
run_ekf = vjit(_run_ekf)

#: Fleet variant: vmap over a leading robot axis of (state, batch); one
#: dispatch fuses every robot's window (multi-robot EKF-per-namespace parity).
run_ekf_fleet = vjit(jax.vmap(_run_ekf, in_axes=(0, 0, None)))


# ---------------------------------------------------------------------------
# Sensor-row builders (host side): odometry / IMU / GPS -> config-masked rows
# ---------------------------------------------------------------------------

ODOM_MASK = np.zeros(STATE_DIM, np.bool_)
ODOM_MASK[[VX, VY]] = True  # odom0_config: fuse vx, vy
IMU_MASK = np.zeros(STATE_DIM, np.bool_)
IMU_MASK[[WX, WY, WZ]] = True  # imu0_config: angular-rate part
IMU_ORI_MASK = np.zeros(STATE_DIM, np.bool_)
IMU_ORI_MASK[[ROLL, PITCH, YAW]] = True  # imu0_config: absolute orientation part
GPS_MASK = np.zeros(STATE_DIM, np.bool_)
GPS_MASK[[X, Y, Z]] = True
POSE_MASK = np.zeros(STATE_DIM, np.bool_)
POSE_MASK[[X, Y, YAW]] = True  # planar absolute pose (SLAM map->base)


def sensor_row(mask: np.ndarray, values: np.ndarray, var: np.ndarray,
               dt: float, gate: float = 0.0):
    """Pack one sensor reading into (dt, z, mask, var, gate) numpy row."""
    z = np.zeros(STATE_DIM, np.float32)
    v = np.full(STATE_DIM, BIG_VAR, np.float32)
    idx = np.nonzero(mask)[0]
    z[idx] = np.asarray(values, np.float32)
    v[idx] = np.asarray(var, np.float32)
    return (np.float32(dt), z, mask.copy(), v, np.float32(gate))


def noop_row():
    """A filler row that is an exact no-op: dt=0 (no prediction), mask all
    false (zero Kalman gain), gate off."""
    return (np.float32(0.0), np.zeros(STATE_DIM, np.float32),
            np.zeros(STATE_DIM, np.bool_),
            np.full(STATE_DIM, BIG_VAR, np.float32), np.float32(0.0))


def pack_rows(rows, capacity: Optional[int] = None) -> MeasurementBatch:
    """Stack rows into a batch, optionally padded with no-op rows to a fixed
    `capacity` so every dispatch reuses one compiled shape (the repo's
    fixed-shape design rule, ARCHITECTURE.md)."""
    if capacity is not None:
        if len(rows) > capacity:
            raise ValueError(f"{len(rows)} rows > window capacity {capacity}")
        rows = list(rows) + [noop_row()] * (capacity - len(rows))
    dt, z, mask, var, gate = (np.stack([r[i] for r in rows]) for i in range(5))
    return MeasurementBatch(
        dt=jnp.asarray(dt), z=jnp.asarray(z), mask=jnp.asarray(mask),
        var=jnp.asarray(var), gate=jnp.asarray(gate),
    )


class NavsatTransform:
    """GPS (lat, lon, alt) -> local metric ENU, datum from the first fix
    (navsat_transform equivalent — the map-frame EKF's GPS input path)."""

    EARTH_R = 6371000.0

    def __init__(self):
        self.datum: Optional[Tuple[float, float, float]] = None

    def to_enu(self, lat: float, lon: float, alt: float = 0.0) -> np.ndarray:
        if self.datum is None:
            self.datum = (lat, lon, alt)
        lat0, lon0, alt0 = self.datum
        x = math.radians(lon - lon0) * self.EARTH_R * math.cos(math.radians(lat0))
        y = math.radians(lat - lat0) * self.EARTH_R
        return np.array([x, y, alt - alt0], np.float32)


class DualEkf:
    """Dual-filter wiring of ekf_with_gps.yaml: an odom-frame filter (odom +
    IMU, continuous) and a map-frame filter (same + GPS, jump-corrected).
    Host-side accumulation; fusion happens in batched `run_ekf` dispatches."""

    def __init__(self, Q: Optional[jax.Array] = None, gps_var: float = 1.0):
        self.Q = default_process_noise() if Q is None else Q
        self.odom_state = initial_state()
        self.map_state = initial_state()
        self.navsat = NavsatTransform()
        self.gps_var = gps_var
        self._odom_rows: list = []
        self._map_rows: list = []

    def add_odom(self, vx: float, vy: float, dt: float, var: float = 0.01):
        row = sensor_row(ODOM_MASK, np.array([vx, vy]), np.full(2, var), dt)
        self._odom_rows.append(row)
        self._map_rows.append(row)

    def add_imu(self, wx: float, wy: float, wz: float, dt: float,
                roll: Optional[float] = None, pitch: float = 0.0,
                yaw: float = 0.0, var: float = 0.005,
                ori_var: float = 0.01, gate: float = 0.8):
        """One IMU reading: angular rates, and — when `roll` is given —
        absolute roll/pitch/yaw orientation, matching imu0_config which fuses
        orientation in both filters (ekf_with_gps.yaml). Without the
        orientation row yaw would be pure dead-reckoning from integrated
        rates and drift unbounded.

        The Mahalanobis `gate` applies ONLY to the absolute-orientation row.
        The rate row is the filter's primary (and only) angular-rate source:
        gating it against a converged rate covariance rejects every genuine
        step change in omega (a rotate-to-heading command jumps +/-0.9 rad/s
        at once), and since a rejected update never shrinks the innovation
        the gyro then stays rejected for hundreds of steps while yaw runs on
        zero rate — exactly when dead-reckoning matters most. Primary sensors
        are fused ungated (unset *_rejection_threshold semantics in
        robot_localization)."""
        row = sensor_row(IMU_MASK, np.array([wx, wy, wz]), np.full(3, var),
                         dt, 0.0)
        self._odom_rows.append(row)
        self._map_rows.append(row)
        if roll is not None:
            ori = sensor_row(IMU_ORI_MASK, np.array([roll, pitch, yaw]),
                             np.full(3, ori_var), 0.0, gate)
            self._odom_rows.append(ori)
            self._map_rows.append(ori)

    def add_gps(self, lat: float, lon: float, alt: float, dt: float):
        enu = self.navsat.to_enu(lat, lon, alt)
        row = sensor_row(GPS_MASK, enu, np.full(3, self.gps_var), dt)
        self._map_rows.append(row)  # GPS only reaches the map-frame filter

    def add_pose(self, x: float, y: float, yaw: float, dt: float = 0.0,
                 var: float = 0.02, gate: float = 3.0):
        """Planar absolute pose (the SLAM engine's map->base estimate) fused
        into the MAP-frame filter only — the same role GPS plays in
        ekf_with_gps.yaml: a jump-correcting absolute reference the odom
        filter never sees, so the odom-frame estimate stays continuous. The
        Mahalanobis gate rejects loop-closure-sized jumps from corrupting the
        filter in one step (the *_rejection_threshold semantics)."""
        row = sensor_row(POSE_MASK, np.array([x, y, yaw]),
                         np.full(3, var), dt, gate)
        self._map_rows.append(row)

    #: fixed flush window so every run_ekf dispatch has one compiled shape
    WINDOW_CAP = 64

    def _flush_one(self, state: EkfState, rows: list) -> EkfState:
        cap = self.WINDOW_CAP
        for i in range(0, len(rows), cap):
            state, _ = run_ekf(state, pack_rows(rows[i:i + cap], cap), self.Q)
        return state

    def flush(self) -> Tuple[np.ndarray, np.ndarray]:
        """Fuse all buffered rows; returns (odom_pose, map_pose) as
        [x, y, z, roll, pitch, yaw]. Rows are padded to WINDOW_CAP-sized
        chunks (no-op filler) so flush always dispatches compiled shapes."""
        if self._odom_rows:
            self.odom_state = self._flush_one(self.odom_state, self._odom_rows)
            self._odom_rows.clear()
        if self._map_rows:
            self.map_state = self._flush_one(self.map_state, self._map_rows)
            self._map_rows.clear()
        o = np.asarray(self.odom_state.x[:6])
        m = np.asarray(self.map_state.x[:6])
        return o, m


# ---------------------------------------------------------------------------
# Twist multiplexer (twist_mux.yaml)
# ---------------------------------------------------------------------------


@dataclass
class _TwistSource:
    priority: int
    timeout: float
    last_cmd: Tuple[float, float] = (0.0, 0.0)
    last_time: float = -math.inf


class TwistMux:
    """Priority command multiplexer: highest-priority non-stale source wins
    (twist_mux.yaml: navigation prio 10 / joystick prio 100, timeout 0.5 s)."""

    def __init__(self, sources: Optional[Dict[str, Tuple[int, float]]] = None):
        sources = sources or {"navigation": (10, 0.5), "joystick": (100, 0.5)}
        self._src = {
            name: _TwistSource(priority=p, timeout=t)
            for name, (p, t) in sources.items()
        }

    def push(self, source: str, v: float, omega: float,
             now: Optional[float] = None):
        s = self._src[source]
        s.last_cmd = (v, omega)
        s.last_time = time.monotonic() if now is None else now

    def output(self, now: Optional[float] = None) -> Tuple[float, float]:
        t = time.monotonic() if now is None else now
        live = [s for s in self._src.values() if t - s.last_time <= s.timeout]
        if not live:
            return (0.0, 0.0)
        return max(live, key=lambda s: s.priority).last_cmd
