"""Frame tracking: stereo frontend + motion-model pose tracking.

Reference capability: ORB-SLAM3's Tracking thread (submodule; SURVEY.md §2.1
S1) — ORB extraction, stereo matching, constant-velocity motion model,
projection-guided landmark association, motion-only BA, keyframe decision.
Here each stage is one jitted fixed-shape kernel and the per-frame "thread"
is a pure function `(state, frame) -> (state, outputs)`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit

from fitslam_tpu.ops import ba, lie, matching, orb
from fitslam_tpu.ops.geometry import Intrinsics, backproject, depth_from_disparity
from fitslam_tpu.models.slam_map import SlamMap, landmarks_in_view


class StereoFrame(NamedTuple):
    """Processed stereo frame: left features + per-feature depth."""

    feats: orb.FrameFeatures
    depth: jax.Array  # (N,) float32; 0 where no stereo match


class TrackState(NamedTuple):
    T_cw: lie.SE3            # current camera-from-world
    velocity: jax.Array      # (6,) tangent increment per frame
    T_cw_last_kf: lie.SE3
    frames_since_kf: jax.Array   # () int32
    kf_ref_inliers: jax.Array    # () int32 — inliers when last KF was made
    initialized: jax.Array       # () bool
    lost_frames: jax.Array       # () int32 consecutive frames below min_inliers
    map_id: jax.Array            # () int32 active Atlas map


def init_track_state() -> TrackState:
    return TrackState(
        T_cw=lie.SE3.identity(),
        velocity=jnp.zeros((6,)),
        T_cw_last_kf=lie.SE3.identity(),
        frames_since_kf=jnp.int32(0),
        kf_ref_inliers=jnp.int32(0),
        initialized=jnp.bool_(False),
        lost_frames=jnp.int32(0),
        map_id=jnp.int32(0),
    )


@vjit(static_argnames=("num_features", "num_levels", "scale_factor", "fast_threshold"))
def process_stereo(
    K: Intrinsics,
    img_left: jax.Array,
    img_right: jax.Array,
    num_features: int = 1024,
    num_levels: int = 4,
    scale_factor: float = 1.4142135,
    fast_threshold: float = 20.0,
) -> StereoFrame:
    """Extract ORB on both images and stereo-match for per-feature depth."""
    fl = orb.extract_orb(img_left, num_features, num_levels, scale_factor, fast_threshold)
    fr = orb.extract_orb(img_right, num_features, num_levels, scale_factor, fast_threshold)
    dist = matching.hamming_matrix(fl.desc, fr.desc, fl.valid, fr.valid)
    max_disp = K.bf / 0.3  # depth >= 0.3 m
    m, disparity = matching.match_stereo(
        dist, fl.xy, fr.xy, fl.level, fr.level, max_disparity=max_disp
    )
    # sub-pixel disparity via patch correlation (ComputeStereoMatches'
    # SAD+parabola refinement): the integer feature grid quantizes disparity
    # and the residual bias is SYSTEMATIC — ~1.5% scale drift on the ring
    # bench (see ops/matching.refine_disparity_subpixel). The refinement
    # doubles as a MISMATCH DETECTOR: when the content-based disparity
    # disagrees with the descriptor-matched feature pair's disparity by
    # > 1.5 px, the pair is two different physical points — those wrong
    # matches form a depth-biased tail (mean depth error -1% with unbiased
    # median, measured r05) that drags the pose solve's translation scale
    # down ~2% per frame. Such features keep tracking as mono (depth 0).
    x_r = fr.xy[m.idx_b, 0]
    d_ref, ref_ok = matching.refine_disparity_subpixel(
        img_left, img_right, fl.xy, x_r, m.valid)
    consistent = ref_ok & (jnp.abs(d_ref - disparity) <= 1.5)
    disparity = jnp.where(consistent, d_ref, 0.0)
    return StereoFrame(fl, depth_from_disparity(K, disparity))


@vjit(static_argnames=("num_features", "num_levels", "scale_factor", "fast_threshold"))
def process_rgbd(
    K: Intrinsics,
    img: jax.Array,
    depth_img: jax.Array,
    num_features: int = 1024,
    num_levels: int = 4,
    scale_factor: float = 1.4142135,
    fast_threshold: float = 20.0,
    max_depth: float = 14.0,
) -> StereoFrame:
    """RGB-D frontend (reference: orb_slam3 rgbd mode, rgbd.launch.py —
    SURVEY.md §2.1 S2): ORB on the intensity image, per-feature depth read
    from the registered depth image. Produces the same StereoFrame the
    stereo path does, so the whole backend is modality-agnostic."""
    fl = orb.extract_orb(img, num_features, num_levels, scale_factor, fast_threshold)
    H, W = depth_img.shape
    iu = jnp.clip(jnp.round(fl.xy[:, 0]).astype(jnp.int32), 0, W - 1)
    iv = jnp.clip(jnp.round(fl.xy[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_img[iv, iu]
    d = jnp.where((d > 0.1) & (d < max_depth) & fl.valid, d, 0.0)
    return StereoFrame(fl, d)


@vjit(static_argnames=("width", "height", "pose_iters", "refine_pass",
                       "sigma_scale"))
def track_frame(
    K: Intrinsics,
    m: SlamMap,
    state: TrackState,
    frame: StereoFrame,
    search_radius: float = 24.0,
    wide_radius: float = 96.0,
    match_max_hamming: int = 64,
    match_ratio: float = 0.8,
    min_inliers: int = 15,
    width: int = 640,
    height: int = 480,
    pose_iters: int = 8,
    refine_pass: bool = True,
    sigma_scale: float = 1.4142135,
) -> Tuple[TrackState, jax.Array, jax.Array]:
    """One tracking step.

    Returns (new_state, lm_match (N,) int32 landmark index per feature
    (-1 = unmatched), inlier count). The relocalization fallback (wide-window
    re-match at the same predicted pose) runs branchlessly and is selected
    when the narrow window fails — the jit analog of the reference's
    track-lost recovery ladder.
    """
    feats = frame.feats
    T_pred = lie.compose(lie.se3_exp(state.velocity), state.T_cw)

    # descriptor distances are pose-independent: compute once, share across
    # all pose hypotheses below
    dist = matching.hamming_matrix(feats.desc, m.lm_desc, feats.valid, m.lm_valid)

    u_r = jnp.where(
        frame.depth > 1e-3,
        feats.xy[:, 0] - K.bf / jnp.maximum(frame.depth, 1e-3),
        -1.0,
    )
    uvr = jnp.concatenate([feats.xy, u_r[:, None]], axis=-1)
    # per-level measurement variance (px^2): a keypoint detected at pyramid
    # level l carries ~scale^l pixel uncertainty at level-0 coordinates —
    # the same weighting the map BA uses (slam_map.py insert_keyframe);
    # uniform weights measurably bias the motion-only solve toward the
    # coarse-level points (ORB-SLAM3 weights identically, S1)
    sigma2 = (sigma_scale ** feats.level.astype(jnp.float32)) ** 2

    # only the ACTIVE Atlas map's landmarks participate in tracking
    # (ORB-SLAM3 S1: other maps are reachable via relocalization/merge only)
    lm_map_ok = m.kf_map_id[m.lm_anchor_kf] == state.map_id

    def project_uv(T_base):
        p_c, vis = landmarks_in_view(
            m, K, lie.inverse(T_base), jnp.float32(40.0), width, height
        )
        vis = vis & lm_map_ok
        z_safe = jnp.where(p_c[..., 2] > 1e-3, p_c[..., 2], 1.0)
        lm_uv = jnp.stack(
            [K.fx * p_c[..., 0] / z_safe + K.cx, K.fy * p_c[..., 1] / z_safe + K.cy],
            axis=-1,
        )
        return jnp.where(vis[:, None], lm_uv, -1e6)

    def match_at(lm_uv, radius):
        return matching.match_windowed(
            dist, feats.xy, lm_uv, radius, max_distance=match_max_hamming,
            ratio=match_ratio,
        )

    def solve(T_base, mt):
        T_new, inl, chi2 = ba.solve_pose(
            K, T_base, m.lm_pos[mt.idx_b], uvr, sigma2, mt.valid, iters=pose_iters
        )
        return T_new, inl

    # rotation-hypothesis sweep: a camera pan between frames shifts every
    # feature by ~fx*dyaw px; when that exceeds the association window the
    # motion-model prediction alone cannot re-latch (and wide windows are
    # ambiguous under repetitive texture). Score a batch of pan offsets
    # around the prediction by the CHEAP candidate count (in-window pairs
    # under the Hamming gate — one fused mask-reduce per hypothesis,
    # 0.12 ms for all 11 vs 0.80 ms for full matches), then run the full
    # ratio-test match only at the winning offset — zero-offset first so
    # it wins ties.
    spacing = 0.8 * search_radius / K.fx
    offsets = spacing * jnp.array(
        [0.0, -1.0, 1.0, -2.0, 2.0, -3.0, 3.0, -4.0, 4.0, -5.0, 5.0]
    )

    def hyp_uv(off):
        T_h = lie.compose(lie.se3_exp(jnp.zeros((6,)).at[4].set(off)), T_pred)
        return T_h, project_uv(T_h)

    T_hs, lm_uvs = jax.lax.map(hyp_uv, offsets)
    good = dist <= match_max_hamming          # (Na, Nb), computed once
    r2 = search_radius * search_radius

    def count(lm_uv):
        d2 = ((feats.xy[:, None, 0] - lm_uv[None, :, 0]) ** 2
              + (feats.xy[:, None, 1] - lm_uv[None, :, 1]) ** 2)
        return jnp.sum((d2 <= r2) & good)

    counts = jax.lax.map(count, lm_uvs)
    best = jnp.argmax(counts)
    T_best = jax.tree.map(lambda a: a[best], T_hs)
    mt_n = match_at(lm_uvs[best], search_radius)
    T_n, inl_n = solve(T_best, mt_n)

    # wide-window fallback at the raw prediction (translation-dominant error)
    mt_w = match_at(project_uv(T_pred), wide_radius)
    T_w, inl_w = solve(T_pred, mt_w)
    narrow_ok = jnp.sum(inl_n) >= min_inliers
    mt, T_new, inl = jax.tree.map(
        lambda a, b: jnp.where(narrow_ok, a, b), (mt_n, T_n, inl_n), (mt_w, T_w, inl_w)
    )

    # second association pass at the SOLVED pose (ORB-SLAM3's TrackLocalMap
    # after TrackWithMotionModel, S1): re-project the map through the refined
    # pose, re-match with a tight window, re-solve. Recovers associations the
    # prediction-window pass missed and tightens the per-frame pose — the
    # cheap accuracy that lets the keyframe cadence drop without ATE loss
    # (one extra packed-min match ~21 us + one GN solve per frame).
    if refine_pass:
        mt_r = match_at(project_uv(T_new), 0.5 * search_radius)
        T_r, inl_r = solve(T_new, mt_r)
        refine_ok = jnp.sum(inl_r) >= jnp.sum(inl)
        mt, T_new, inl = jax.tree.map(
            lambda a, b: jnp.where(refine_ok, a, b),
            (mt_r, T_r, inl_r), (mt, T_new, inl),
        )

    n_inl = jnp.sum(inl).astype(jnp.int32)
    tracked_ok = n_inl >= min_inliers
    # if tracking failed entirely, fall back to pure motion-model pose
    T_out = jax.tree.map(lambda a, b: jnp.where(tracked_ok, a, b), T_new, T_pred)

    # velocity updates only from VERIFIED motion. On a lost frame the
    # motion-model pose must not feed back into the velocity: that compounds
    # the constant-velocity extrapolation exponentially (pose runs away
    # kilometers within ~50 lost frames) and poisons the prediction of every
    # relocalization/reinit attempt. ORB-SLAM3 freezes at the last good pose
    # while lost; we take one predicted step, then hold.
    vel = jnp.where(
        tracked_ok,
        lie.se3_log(lie.compose(T_out, lie.inverse(state.T_cw))),
        jnp.zeros((6,)),
    )
    lm_match = jnp.where(mt.valid & inl, mt.idx_b, -1)

    new_state = state._replace(
        T_cw=T_out,
        velocity=vel,
        frames_since_kf=state.frames_since_kf + 1,
        lost_frames=jnp.where(tracked_ok, jnp.int32(0), state.lost_frames + 1),
    )
    return new_state, lm_match, n_inl


@vjit(static_argnames=("min_interval", "translation_thresh", "rotation_thresh",
                       "min_tracked_ratio"))
def need_keyframe(
    state: TrackState,
    n_inliers: jax.Array,
    min_interval: int,
    translation_thresh: float,
    rotation_thresh: float,
    min_tracked_ratio: float,
) -> jax.Array:
    """Keyframe decision (scalar bool on device; host pulls it).

    jitted: eager op-by-op execution costs ~8 ms/op through the axon relay
    — this 15-op helper measured 240 ms/frame eager vs 0.1 ms jitted."""
    d = lie.se3_log(lie.compose(state.T_cw, lie.inverse(state.T_cw_last_kf)))
    trans = jnp.linalg.norm(d[:3])
    rot = jnp.linalg.norm(d[3:])
    weak = n_inliers.astype(jnp.float32) < min_tracked_ratio * jnp.maximum(
        state.kf_ref_inliers.astype(jnp.float32), 1.0
    )
    moved = (trans > translation_thresh) | (rot > rotation_thresh)
    return (state.frames_since_kf >= min_interval) & (moved | weak)


@vjit
def mark_keyframe(state: TrackState, n_inliers: jax.Array) -> TrackState:
    return state._replace(
        T_cw_last_kf=state.T_cw,
        frames_since_kf=jnp.int32(0),
        kf_ref_inliers=n_inliers.astype(jnp.int32),
        initialized=jnp.bool_(True),
        lost_frames=jnp.int32(0),
    )


@vjit
def pose_matrix_wc(state: TrackState) -> jax.Array:
    """Current world-from-camera 4x4 (trajectory logging, one fused kernel)."""
    return lie.inverse(state.T_cw).matrix()


@vjit
def rebase_to_kf(state: TrackState, kf_R: jax.Array, kf_t: jax.Array,
                 kf_idx: jax.Array) -> TrackState:
    """Sync the tracker to a (BA-refined) keyframe pose."""
    T = lie.SE3(kf_R[kf_idx], kf_t[kf_idx])
    return state._replace(T_cw=T, T_cw_last_kf=T)
