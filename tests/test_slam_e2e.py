"""End-to-end stereo SLAM on a rendered synthetic corridor.

The synthetic-world analog of the reference's indoor-corridor sequence
(BASELINE.json configs[0]): dense rendered stereo frames -> ORB -> tracking
-> keyframes -> local BA, checked by ATE against ground truth.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitslam_tpu.data import synthetic
from fitslam_tpu.models.slam import StereoSlam
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.utils import evaluation as ev
from fitslam_tpu.utils.config import FitSlamConfig

W, H = 320, 240


def _small_cfg() -> FitSlamConfig:
    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(
            cfg.camera, width=W, height=H, fx=200.0, fy=200.0, cx=W / 2, cy=H / 2,
            baseline=0.2,
        ),
        orb=dataclasses.replace(cfg.orb, num_features=384, num_levels=2, fast_threshold=12.0),
        tracking=dataclasses.replace(
            cfg.tracking, min_inliers=12, keyframe_min_interval=2,
            keyframe_translation=0.3,
        ),
        mapping=dataclasses.replace(
            cfg.mapping, max_keyframes=32, max_landmarks=2048, max_observations=8192,
            local_window=4, ba_iters=4,
        ),
    )
    return cfg


@pytest.fixture(scope="module")
def corridor_run():
    cfg = _small_cfg()
    K = Intrinsics.from_config(cfg.camera)
    key = jax.random.PRNGKey(42)
    world = synthetic.corridor_world(key, num=1200, length=25.0, width=5.0)
    n_frames = 24
    T_gt = synthetic.straight_trajectory(n_frames, length=4.0, height=1.2, start_x=0.5)

    slam = StereoSlam(cfg)
    for i in range(n_frames):
        left, right = synthetic.render_stereo(
            K, world, lie.SE3(T_gt.R[i], T_gt.t[i]), width=W, height=H, max_depth=18.0
        )
        info = slam.process_frame(left, right)
    gt = [np.asarray(lie.SE3(T_gt.R[i], T_gt.t[i]).matrix()) for i in range(n_frames)]
    return slam, gt


def test_tracking_not_lost(corridor_run):
    slam, gt = corridor_run
    assert slam.frame_id == len(gt)
    assert int(slam.map.n_kf) >= 3
    assert int(slam.map.n_lm) > 100


def test_ate_within_bound(corridor_run):
    slam, gt = corridor_run
    ate = ev.ate_rmse(slam.trajectory, gt)
    # 4 m of travel on a synthetic blob world; sub-10cm is healthy here
    assert ate < 0.10, f"ATE {ate:.3f} m"


def test_no_alignment_drift_direction(corridor_run):
    """Unaligned endpoint error should also stay bounded (catches scale/axis
    convention bugs that Umeyama alignment would mask)."""
    slam, gt = corridor_run
    # SLAM frame is anchored at the first camera; move estimates into world
    anchored = [gt[0] @ T for T in slam.trajectory]
    ate_raw = ev.ate_rmse(anchored, gt, align=False)
    assert ate_raw < 0.3, f"unaligned ATE {ate_raw:.3f} m"


def test_landmark_service(corridor_run):
    slam, gt = corridor_run
    # query in the SLAM frame (anchored at the first camera)
    T_wc = lie.SE3.from_matrix(jnp.asarray(np.linalg.inv(gt[0]) @ gt[-1], dtype=np.float32))
    p_c, ok = slam.get_landmarks_in_view(T_wc, max_distance=14.0)
    assert int(ok.sum()) > 30
    z = np.asarray(p_c[np.asarray(ok), 2])
    assert (z > 0).all() and (np.linalg.norm(np.asarray(p_c[np.asarray(ok)]), axis=1) < 14.0).all()


def test_lost_tracking_does_not_run_away():
    """When tracking is lost, the pose takes ONE constant-velocity step and
    then holds: the motion-model pose must not feed back into the velocity
    (that compounds exponentially — kilometers of drift within 50 lost
    frames, as seen on the rotation-stressed loop benchmark)."""
    import jax.numpy as jnp

    from fitslam_tpu.models import slam_map as smod
    from fitslam_tpu.models import tracking as trk
    from fitslam_tpu.ops import lie
    from fitslam_tpu.ops.geometry import Intrinsics
    from fitslam_tpu.ops.orb import FrameFeatures

    K = Intrinsics(fx=jnp.float32(200.0), fy=jnp.float32(200.0),
                   cx=jnp.float32(160.0), cy=jnp.float32(120.0),
                   baseline=jnp.float32(0.2))
    m = smod.empty_map(8, 256, 1024)  # empty map -> zero matches ever
    n = 64
    feats = FrameFeatures(
        xy=jnp.zeros((n, 2)), response=jnp.zeros((n,)),
        angle=jnp.zeros((n,)), level=jnp.zeros((n,), jnp.int32),
        desc=jnp.ones((n, 256), jnp.bfloat16),
        valid=jnp.zeros((n,), bool),
    )
    frame = trk.StereoFrame(feats, jnp.zeros((n,)))
    vel = jnp.zeros((6,)).at[0].set(0.5)  # was moving 0.5 m/frame
    state = trk.mark_keyframe(trk.init_track_state(), jnp.int32(50))
    state = state._replace(velocity=vel)
    t_start = np.asarray(state.T_cw.t)

    poses = []
    for _ in range(6):
        state, lm_match, n_inl = trk.track_frame(K, m, state, frame,
                                                 min_inliers=10)
        poses.append(np.asarray(state.T_cw.t))
        assert int(n_inl) == 0
    # one predicted step, then frozen
    d_total = np.linalg.norm(poses[-1] - t_start)
    assert d_total < 0.5 + 1e-5, f"pose ran away {d_total} m while lost"
    np.testing.assert_allclose(poses[-1], poses[1], atol=1e-6)
    assert int(state.lost_frames) == 6


def test_landmark_recycling_prevents_starvation():
    """With a deliberately tiny landmark capacity, a long corridor fills the
    map; recycling evicts stale landmarks so tracking keeps latching onto
    NEW terrain. With recycling off, tracking starves once the map is full."""
    def run(recycle: bool):
        cfg = _small_cfg()
        cfg = dataclasses.replace(
            cfg,
            mapping=dataclasses.replace(
                cfg.mapping, max_keyframes=32, max_landmarks=768,
                max_observations=4096, local_window=3, ba_iters=2,
                recycle_at_fraction=0.9 if recycle else 0.0,
                recycle_target_fraction=0.6,
            ),
        )
        K = Intrinsics.from_config(cfg.camera)
        world = synthetic.corridor_world(jax.random.PRNGKey(1), num=2400,
                                         length=40.0, width=5.0)
        n_frames = 40
        T_gt = synthetic.straight_trajectory(n_frames, length=14.0,
                                             height=1.2, start_x=0.5)
        slam = StereoSlam(cfg)
        inliers = []
        for i in range(n_frames):
            l, r = synthetic.render_stereo(
                K, world, lie.SE3(T_gt.R[i], T_gt.t[i]),
                width=W, height=H, max_depth=12.0)
            info = slam.process_frame(l, r)
            inliers.append(info["n_inliers"])
        return slam, inliers

    slam_on, inl_on = run(recycle=True)
    # capacity respected and recycling actually fired
    assert int(slam_on.map.n_lm) <= 768
    # tracking healthy at the END of the run (new terrain still mappable)
    assert np.mean(inl_on[-6:]) > 30, inl_on[-6:]

    slam_off, inl_off = run(recycle=False)
    # without recycling the tail starves (strictly worse than with it)
    assert np.mean(inl_off[-6:]) < np.mean(inl_on[-6:])


def test_corrected_trajectory_follows_keyframe_updates():
    """Past frame poses re-anchor through their reference keyframe's CURRENT
    pose: moving a keyframe (as PGO/GBA would) moves its frames with it."""
    import jax.numpy as jnp

    from fitslam_tpu.ops import lie as lieop

    cfg = _small_cfg()
    slam = StereoSlam(cfg)
    # reference KF at the time: identity; frame 1.0 m ahead of it
    T_kf_then = lieop.SE3.identity()
    T_frame_wc = np.asarray(lieop.SE3(jnp.eye(3), jnp.array([1.0, 0, 0])).matrix())
    slam.trajectory = [T_frame_wc]
    slam._traj_ref = [(0, T_kf_then)]  # stores T_cw of the kf at the time
    # PGO moved KF0 by +2 m in y (kf_T_cw = inverse of its world pose)
    T_kf_now_wc = lieop.SE3(jnp.eye(3), jnp.array([0.0, 2.0, 0.0]))
    slam.map = slam.map._replace(
        kf_T_cw=jax.tree.map(
            lambda a, b: a.at[0].set(b),
            slam.map.kf_T_cw, lieop.inverse(T_kf_now_wc)),
        kf_valid=slam.map.kf_valid.at[0].set(True),
        n_kf=jnp.int32(1),
    )
    out = slam.corrected_trajectory()
    np.testing.assert_allclose(out[0][:3, 3], [1.0, 2.0, 0.0], atol=1e-6)
