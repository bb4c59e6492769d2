"""The fused SLAM backend step: tracking + conditional keyframe pipeline.

Architecture note (measured on this TPU environment, see utils/jit.py for
the sibling constraint):
- Buffers that feed back into the SAME executable are free; buffers crossing
  executables pay an import cost — so the heavy map state must live inside
  ONE executable across frames. This step is that executable: landmark
  association, motion-only pose solve, keyframe decision, and (under
  `lax.cond`) keyframe insertion + windowed local BA + landmark culling.
- Fusing the image frontend INTO this module tips the backend compiler into
  a systematically bad regime (50-100 ms binaries vs 0.1 ms for the split
  modules, reproducible across recompiles), so `process_stereo` stays its
  own executable; its ~1 MB frame output imports cheaply.
- No jitted function may capture a concrete device array: closure-captured
  device buffers measured ~0.4 ms of overhead per executed iteration
  (trace-time numpy constants are fine — see ops/orb.py, utils/jit.py).

The reference's analog of this split is its tracking vs local-mapping
threads over shared memory (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit
from fitslam_tpu.models import slam_map as sm
from fitslam_tpu.models import tracking as tr
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.ops.place import signature_from_descriptors


class StepOutputs(NamedTuple):
    n_inliers: jax.Array      # () int32
    was_keyframe: jax.Array   # () bool
    kf_idx: jax.Array         # () int32 (-1 unless was_keyframe)
    pose_wc: jax.Array        # (4, 4) world-from-camera
    # reference-keyframe anchor AT THE TIME of this frame: lets the async
    # path rewrite past poses through loop-closure/GBA-corrected keyframes
    # (slam.corrected_trajectory) without any per-frame host sync
    ref_kf: jax.Array         # () int32
    ref_T_cw_R: jax.Array     # (3, 3) reference KF camera-from-world then
    ref_T_cw_t: jax.Array     # (3,)
    # loop-candidate retrieval ON DEVICE at keyframe insertion (the DBoW2
    # database query of ORB-SLAM3's LoopClosing thread): the batched poll
    # reads these in its one packed readback, so the no-loop common case
    # costs ZERO extra device round-trips (r04 paid one detect_loop readback
    # per keyframe through the tunnel)
    loop_cand: jax.Array      # () int32 best candidate KF (-1 = none)
    loop_score: jax.Array     # () float32 centered-cosine score


def _backend_body(
    K: Intrinsics,
    m: sm.SlamMap,
    state: tr.TrackState,
    frame: tr.StereoFrame,
    frame_id,
    *,
    search_radius, match_max_hamming, min_inliers, width, height, pose_iters,
    kf_min_interval, kf_translation, kf_rotation, kf_min_tracked_ratio,
    scale_factor, ba_window, ba_max_obs, ba_iters, cull_min_obs,
    wide_radius=96.0, reinit_after_lost=6, match_ratio=0.8, ba_covis=True,
    recycle_at_fraction=0.92, recycle_target_fraction=0.7, track_refine=True,
    loop_min_gap=0, max_spawn_depth=1e9,
) -> Tuple[sm.SlamMap, tr.TrackState, StepOutputs]:
    num_features = frame.feats.capacity

    def tracked_path(args):
        m, state = args
        state2, lm_match, n_inl = tr.track_frame(
            K, m, state, frame,
            search_radius=search_radius, wide_radius=wide_radius,
            match_max_hamming=match_max_hamming, match_ratio=match_ratio,
            min_inliers=min_inliers, width=width, height=height,
            pose_iters=pose_iters, refine_pass=track_refine,
            sigma_scale=scale_factor,
        )
        need = tr.need_keyframe(
            state2, n_inl, kf_min_interval, kf_translation, kf_rotation,
            kf_min_tracked_ratio,
        )
        return state2, lm_match, n_inl, need

    def init_path(args):
        m, state = args
        lm_match = -jnp.ones((num_features,), jnp.int32)
        return state, lm_match, jnp.int32(0), jnp.bool_(True)

    state2, lm_match, n_inl, need = jax.lax.cond(
        state.initialized, tracked_path, init_path, (m, state)
    )

    K_cap = m.kf_valid.shape[0]
    # never mint a keyframe from a lost tracker (its pose is a motion-model
    # guess and would corrupt the map) — unless loss has persisted long
    # enough that a re-initialization keyframe is the only way back
    healthy = (n_inl >= min_inliers) | jnp.logical_not(state.initialized)
    reinit = state2.lost_frames >= reinit_after_lost
    can_insert = need & (m.n_kf < K_cap) & (healthy | reinit)

    def do_insert(args):
        m, state2 = args
        sig = signature_from_descriptors(frame.feats.desc, frame.feats.valid)
        # a reinit keyframe starts a NEW Atlas map (ORB-SLAM3 multi-map,
        # SURVEY.md §2.1 S1): its pose is a motion-model guess disconnected
        # from the old map; relocalization/loop closure merges maps later
        new_map_id = state2.map_id + reinit.astype(jnp.int32)
        m2 = sm.insert_keyframe(
            m, K, state2.T_cw, frame.feats, frame.depth, lm_match,
            frame_id, sig, scale_factor=scale_factor, map_id=new_map_id,
            max_spawn_depth=max_spawn_depth,
        )
        m3 = sm.local_ba(m2, K, window=ba_window, max_obs_local=ba_max_obs,
                         iters=ba_iters, covis=ba_covis)
        m4 = sm.cull_landmarks(m3, min_obs=cull_min_obs)
        # landmark slot recycling ON DEVICE: when the fixed-capacity landmark
        # array fills, new terrain becomes unmappable and tracking starves
        # (measured on the corridor bench: inliers collapse 400 -> 0 over the
        # last third of the run once n_lm hits capacity, blowing up ATE).
        # The host-side recycling of the sync path never runs in the
        # zero-readback async mode, so the compaction must live inside this
        # executable, under lax.cond so the scatter only costs on overflow.
        if recycle_at_fraction > 0:
            L_cap = m4.lm_valid.shape[0]
            m4 = jax.lax.cond(
                m4.n_lm > int(recycle_at_fraction * L_cap),
                lambda mm: sm.compact_map(
                    mm, target_fraction=recycle_target_fraction),
                lambda mm: mm,
                m4,
            )
        kf_idx = m2.n_kf - 1
        state3 = tr.rebase_to_kf(state2, m4.kf_T_cw.R, m4.kf_T_cw.t, kf_idx)
        state3 = tr.mark_keyframe(state3, n_inl)
        state3 = state3._replace(map_id=new_map_id)
        # loop-candidate retrieval against the just-updated keyframe database
        # (one (K, D) matvec; results ride the poll's packed readback)
        if loop_min_gap > 0:
            from fitslam_tpu.models.loop_closing import detect_loop

            cand = detect_loop(m4, sig, kf_idx, min_gap=loop_min_gap)
            l_cand, l_score = cand.kf_idx, cand.score
        else:
            l_cand, l_score = jnp.int32(-1), jnp.float32(-jnp.inf)
        return m4, state3, kf_idx, l_cand, l_score

    def no_insert(args):
        m, state2 = args
        return (m, state2, jnp.int32(-1), jnp.int32(-1),
                jnp.float32(-jnp.inf))

    m_out, state_out, kf_idx, loop_cand, loop_score = jax.lax.cond(
        can_insert, do_insert, no_insert, (m, state2)
    )
    ref = jnp.maximum(m_out.n_kf - 1, 0)
    outs = StepOutputs(
        n_inliers=n_inl,
        was_keyframe=can_insert,
        kf_idx=kf_idx,
        pose_wc=lie.inverse(state_out.T_cw).matrix(),
        ref_kf=ref,
        ref_T_cw_R=m_out.kf_T_cw.R[ref],
        ref_T_cw_t=m_out.kf_T_cw.t[ref],
        loop_cand=loop_cand,
        loop_score=loop_score,
    )
    return m_out, state_out, outs


slam_backend_step = vjit(
    _backend_body,
    static_argnames=(
        "search_radius", "match_max_hamming", "min_inliers", "width",
        "height", "pose_iters", "kf_min_interval", "kf_translation",
        "kf_rotation", "kf_min_tracked_ratio", "scale_factor",
        "ba_window", "ba_max_obs", "ba_iters", "cull_min_obs",
        "wide_radius", "reinit_after_lost", "match_ratio", "ba_covis",
        "recycle_at_fraction", "recycle_target_fraction", "track_refine",
        "loop_min_gap", "max_spawn_depth",
    ),
)
