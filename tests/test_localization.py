"""EKF fusion + twist mux (SURVEY.md §2.4 N5: ekf_with_gps.yaml, twist_mux.yaml)."""

import math

import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models import localization as loc


def _drive_circle(T=200, dt=0.05, v=0.5, w=0.4):
    """Ground-truth planar circle + noisy odom/imu rows."""
    rng = np.random.default_rng(0)
    rows, gt = [], []
    x = y = yaw = 0.0
    for _ in range(T):
        x += v * math.cos(yaw) * dt
        y += v * math.sin(yaw) * dt
        yaw = (yaw + w * dt + math.pi) % (2 * math.pi) - math.pi
        gt.append((x, y, yaw))
        rows.append(loc.sensor_row(
            loc.ODOM_MASK, np.array([v + rng.normal(0, 0.01), 0.0]),
            np.array([1e-3, 1e-3]), dt))
        rows.append(loc.sensor_row(
            loc.IMU_MASK, np.array([0.0, 0.0, w + rng.normal(0, 0.01)]),
            np.full(3, 1e-3), 0.0))
    return rows, np.array(gt)


def test_ekf_tracks_circle():
    rows, gt = _drive_circle()
    state = loc.initial_state()
    final, (xs, ok) = loc.run_ekf(state, loc.pack_rows(rows),
                                  loc.default_process_noise())
    est = np.asarray(final.x)
    assert abs(est[loc.X] - gt[-1, 0]) < 0.25
    assert abs(est[loc.Y] - gt[-1, 1]) < 0.25
    dyaw = (est[loc.YAW] - gt[-1, 2] + math.pi) % (2 * math.pi) - math.pi
    assert abs(dyaw) < 0.1
    assert bool(np.asarray(ok).all())


def test_mahalanobis_gate_rejects_outlier():
    state = loc.initial_state()
    Q = loc.default_process_noise()
    # settle the filter on vx=0.5 readings, then inject a wild outlier
    rows = [loc.sensor_row(loc.ODOM_MASK, np.array([0.5, 0.0]),
                           np.array([1e-4, 1e-4]), 0.05) for _ in range(20)]
    rows.append(loc.sensor_row(loc.ODOM_MASK, np.array([50.0, 0.0]),
                               np.array([1e-4, 1e-4]), 0.05, gate=3.0))
    final, (xs, ok) = loc.run_ekf(state, loc.pack_rows(rows), Q)
    ok = np.asarray(ok)
    assert ok[:-1].all() and not ok[-1]
    assert abs(float(final.x[loc.VX]) - 0.5) < 0.1


def test_fleet_vmap_matches_single():
    rows, _ = _drive_circle(T=50)
    batch = loc.pack_rows(rows)
    Q = loc.default_process_noise()
    s0 = loc.initial_state()
    single, _ = loc.run_ekf(s0, batch, Q)
    fleet_states = loc.EkfState(
        x=jnp.stack([s0.x, s0.x]), P=jnp.stack([s0.P, s0.P]))
    fleet_batch = loc.MeasurementBatch(
        *(jnp.stack([f, f]) for f in batch))
    fleet, _ = loc.run_ekf_fleet(fleet_states, fleet_batch, Q)
    np.testing.assert_allclose(np.asarray(fleet.x[0]), np.asarray(single.x),
                               rtol=1e-5, atol=1e-5)


def test_dual_ekf_gps_corrects_map_frame():
    dual = loc.DualEkf(gps_var=0.01)
    # odom says standing still; GPS says we are drifting east
    for k in range(10):
        dual.add_odom(0.0, 0.0, dt=0.1)
        dual.add_gps(lat=0.0, lon=k * 1e-5, alt=0.0, dt=0.0)
    odom_pose, map_pose = dual.flush()
    assert abs(odom_pose[0]) < 0.05           # odom frame: no GPS, stays put
    assert map_pose[0] > 0.3                  # map frame follows the fixes
    # navsat datum: first fix is the origin
    enu = dual.navsat.to_enu(0.0, 9e-5, 0.0)
    assert abs(enu[0] - math.radians(9e-5) * loc.NavsatTransform.EARTH_R) < 1e-3


def test_imu_orientation_bounds_yaw_drift():
    """imu0_config fuses absolute roll/pitch/yaw (ekf_with_gps.yaml), so yaw
    must track the IMU orientation instead of dead-reckoning biased rates."""
    true_yaw = 0.9
    # biased gyro says we are spinning; absolute orientation says we are not
    biased_rate = 0.5

    dual_ori = loc.DualEkf()
    dual_rate_only = loc.DualEkf()
    for _ in range(60):
        dual_ori.add_imu(0.0, 0.0, biased_rate, dt=0.05,
                         roll=0.0, pitch=0.0, yaw=true_yaw, gate=0.0)
        dual_rate_only.add_imu(0.0, 0.0, biased_rate, dt=0.05, gate=0.0)
    o_ori, _ = dual_ori.flush()
    o_rate, _ = dual_rate_only.flush()
    # with orientation rows, yaw locks to the measurement
    assert abs(o_ori[5] - true_yaw) < 0.1
    # without them, integrated biased rates walk away
    assert abs(o_rate[5] - true_yaw) > 0.4


def test_flush_pads_to_fixed_shape():
    """DualEkf.flush dispatches fixed-capacity windows: padding rows are
    exact no-ops and uneven buffers don't change the result."""
    rows = [loc.sensor_row(loc.ODOM_MASK, np.array([0.5, 0.0]),
                           np.array([1e-3, 1e-3]), 0.05) for _ in range(7)]
    s0 = loc.initial_state()
    Q = loc.default_process_noise()
    plain, _ = loc.run_ekf(s0, loc.pack_rows(rows), Q)
    padded, _ = loc.run_ekf(s0, loc.pack_rows(rows, capacity=64), Q)
    np.testing.assert_allclose(np.asarray(padded.x), np.asarray(plain.x),
                               rtol=1e-6, atol=1e-6)


def test_twist_mux_priority_and_timeout():
    mux = loc.TwistMux()
    mux.push("navigation", 0.5, 0.1, now=0.0)
    assert mux.output(now=0.1) == (0.5, 0.1)
    mux.push("joystick", 0.0, 0.9, now=0.2)   # higher priority wins
    assert mux.output(now=0.3) == (0.0, 0.9)
    mux.push("navigation", 0.5, 0.1, now=0.6)
    assert mux.output(now=0.8) == (0.5, 0.1)  # joystick stale -> nav again
    assert mux.output(now=5.0) == (0.0, 0.0)  # all stale -> zero command
