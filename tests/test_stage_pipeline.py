"""Cross-chip frontend|backend stage pipeline vs the sequential path.

The pipeline (parallel/dist_stages.py::stage_pipelined_slam) places the
image frontend on device 0 and the map backend on device 1 of a 2-wide
`stage` mesh and software-pipelines the frame stream with a ppermute
handoff. It must produce the SAME trajectory and keyframe pattern as the
plain sequential single-device path — the parallelism is free.

Reference capability: the process-level SLAM pipeline of
root_dir/launch_active_slam.sh:22-27 (SURVEY.md §2.5 row 1).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitslam_tpu.data import synthetic
from fitslam_tpu.models import slam_map as sm
from fitslam_tpu.models import tracking as tr
from fitslam_tpu.models.slam_step import slam_backend_step
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.parallel import dist_stages as ds
from fitslam_tpu.parallel import mesh as mesh_mod
from fitslam_tpu.utils.config import FitSlamConfig

W, H = 320, 240
NF, NL = 256, 2
T_FRAMES = 6

BACKEND_KW = dict(
    search_radius=24.0, match_max_hamming=64, min_inliers=10,
    width=W, height=H, pose_iters=4, kf_min_interval=2,
    kf_translation=0.3, kf_rotation=0.2, kf_min_tracked_ratio=0.25,
    scale_factor=1.4142135, ba_window=4, ba_max_obs=1024,
    ba_iters=2, cull_min_obs=1,
)


@pytest.fixture(scope="module")
def setup():
    cfg = FitSlamConfig()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(
            cfg.camera, width=W, height=H, fx=0.625 * W, fy=0.625 * W,
            cx=W / 2, cy=H / 2, baseline=0.2,
        ),
    )
    K = Intrinsics.from_config(cfg.camera)
    key = jax.random.PRNGKey(0)
    world = synthetic.corridor_world(key, num=2000, length=20.0, width=5.0)
    T_gt = synthetic.straight_trajectory(
        T_FRAMES + 1, length=(T_FRAMES + 1) * 0.15, height=1.2, start_x=0.5)

    imgs = []
    for i in range(T_FRAMES + 1):
        l, r = synthetic.render_stereo(
            K, world, lie.SE3(T_gt.R[i], T_gt.t[i]), width=W, height=H)
        imgs.append(jnp.stack([l, r]))

    # bootstrap map: first frame inserted as keyframe 0
    frame0 = tr.process_stereo(
        K, imgs[0][0], imgs[0][1], num_features=NF, num_levels=NL,
        scale_factor=1.4142135, fast_threshold=12.0)
    m = sm.empty_map(8, 2048, 4096)
    m = sm.insert_keyframe(
        m, K, lie.SE3.identity(), frame0.feats, frame0.depth,
        -jnp.ones((NF,), jnp.int32), jnp.int32(0), jnp.zeros((256,)))
    st = tr.mark_keyframe(tr.init_track_state(), jnp.int32(0))
    frames_lr = jnp.stack(imgs[1:])   # frames 1..T through the pipeline
    return K, m, st, frames_lr


def _sequential(K, m, st, frames_lr):
    outs_log = []
    for t in range(frames_lr.shape[0]):
        m, st, outs = slam_backend_step(
            K, m, st,
            tr.process_stereo(
                K, frames_lr[t, 0], frames_lr[t, 1], num_features=NF,
                num_levels=NL, scale_factor=1.4142135, fast_threshold=12.0),
            jnp.int32(t), **BACKEND_KW)
        outs_log.append(outs)
    return m, st, outs_log


def test_pipeline_matches_sequential(setup):
    K, m, st, frames_lr = setup
    mesh = mesh_mod.make_mesh(2, axis_names=("stage",))

    m_seq, st_seq, outs_seq = _sequential(K, m, st, frames_lr)
    m_pipe, st_pipe, outs_pipe = ds.stage_pipelined_slam(
        mesh, K, m, st, frames_lr,
        num_features=NF, num_levels=NL, scale_factor=1.4142135,
        fast_threshold=12.0, backend_kwargs=BACKEND_KW)

    poses_seq = np.stack([np.asarray(o.pose_wc) for o in outs_seq])
    poses_pipe = np.asarray(outs_pipe.pose_wc)
    assert poses_pipe.shape == poses_seq.shape
    np.testing.assert_allclose(poses_pipe, poses_seq, atol=1e-4)

    kf_seq = [bool(o.was_keyframe) for o in outs_seq]
    kf_pipe = [bool(v) for v in np.asarray(outs_pipe.was_keyframe)]
    assert kf_pipe == kf_seq
    assert int(m_pipe.n_kf) == int(m_seq.n_kf)

    inl_seq = np.array([int(o.n_inliers) for o in outs_seq])
    inl_pipe = np.asarray(outs_pipe.n_inliers)
    np.testing.assert_array_equal(inl_pipe, inl_seq)

    # tracker state converged to the same place
    np.testing.assert_allclose(
        np.asarray(st_pipe.T_cw.t), np.asarray(st_seq.T_cw.t), atol=1e-4)


def test_pipeline_tracks_the_trajectory(setup):
    """Sanity beyond equivalence: the pipeline's poses actually follow the
    forward corridor motion (~0.15 m/frame along camera z)."""
    K, m, st, frames_lr = setup
    mesh = mesh_mod.make_mesh(2, axis_names=("stage",))
    _, _, outs = ds.stage_pipelined_slam(
        mesh, K, m, st, frames_lr,
        num_features=NF, num_levels=NL, scale_factor=1.4142135,
        fast_threshold=12.0, backend_kwargs=BACKEND_KW)
    # SLAM's world frame is the first camera frame: forward motion is +z
    z = np.asarray(outs.pose_wc)[:, 2, 3]
    assert z[-1] > z[0] + 0.45
    assert np.all(np.asarray(outs.n_inliers) >= 10)
