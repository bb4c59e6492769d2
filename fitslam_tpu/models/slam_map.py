"""Fixed-capacity SLAM map state (the ORB-SLAM3 Atlas/Map analog).

The reference's map is pointer-linked C++ objects (KeyFrames, MapPoints,
observations) mutated by three threads (SURVEY.md §2.1 S1, §2.5). Here the
map is a single immutable pytree of fixed-capacity arrays with validity
masks and scalar counters; every mutation is a pure jitted function
returning a new map. This is what makes local BA, loop closure, and the
landmarks-in-view service (SURVEY.md §1 L2→up `GetLandmarksInView`) plain
batched kernels.

Landmarks store both a world position and their position in the anchor
keyframe's camera frame — the same loop-closure-consistency device the
reference uses for its roadmap (FrontierRoadmap.cpp:118-127): after pose-graph
optimization, world positions are recomputed from the (updated) anchor poses
by one batched transform.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit

from fitslam_tpu.ops import lie
from fitslam_tpu.ops.ba import Observations
from fitslam_tpu.ops.geometry import Intrinsics, backproject
from fitslam_tpu.ops.orb import FrameFeatures


class SlamMap(NamedTuple):
    # --- keyframes (capacity K) ---
    kf_T_cw: lie.SE3          # (K,) camera-from-world
    kf_valid: jax.Array       # (K,) bool
    kf_frame_id: jax.Array    # (K,) int32 source frame index
    kf_signature: jax.Array   # (K, D) float32 place-recognition signature
    kf_map_id: jax.Array      # (K,) int32 Atlas map membership (S1 multi-map)
    # --- landmarks (capacity L) ---
    lm_pos: jax.Array         # (L, 3) world
    lm_desc: jax.Array        # (L, 256) ±1 bfloat16 representative descriptor
    lm_valid: jax.Array       # (L,) bool
    lm_nobs: jax.Array        # (L,) int32
    lm_anchor_kf: jax.Array   # (L,) int32
    lm_pos_anchor: jax.Array  # (L, 3) position in anchor-KF camera frame
    # --- observations (capacity O) ---
    obs_kf: jax.Array         # (O,) int32
    obs_lm: jax.Array         # (O,) int32
    obs_uvr: jax.Array        # (O, 3)
    obs_sigma2: jax.Array     # (O,)
    obs_valid: jax.Array      # (O,) bool
    # --- counters ---
    n_kf: jax.Array           # () int32
    n_lm: jax.Array           # () int32
    n_obs: jax.Array          # () int32

    @property
    def capacity(self) -> Tuple[int, int, int]:
        return (
            self.kf_valid.shape[0],
            self.lm_valid.shape[0],
            self.obs_valid.shape[0],
        )


def empty_map(max_keyframes: int, max_landmarks: int, max_observations: int,
              signature_dim: int = 256) -> SlamMap:
    K, L, O = max_keyframes, max_landmarks, max_observations
    return SlamMap(
        kf_T_cw=lie.SE3.identity((K,)),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.zeros((K,), jnp.int32),
        kf_signature=jnp.zeros((K, signature_dim), jnp.float32),
        kf_map_id=jnp.zeros((K,), jnp.int32),
        lm_pos=jnp.zeros((L, 3), jnp.float32),
        lm_desc=jnp.zeros((L, 256), jnp.bfloat16),
        lm_valid=jnp.zeros((L,), bool),
        lm_nobs=jnp.zeros((L,), jnp.int32),
        lm_anchor_kf=jnp.zeros((L,), jnp.int32),
        lm_pos_anchor=jnp.zeros((L, 3), jnp.float32),
        obs_kf=jnp.zeros((O,), jnp.int32),
        obs_lm=jnp.zeros((O,), jnp.int32),
        obs_uvr=jnp.zeros((O, 3), jnp.float32),
        obs_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.zeros((O,), bool),
        n_kf=jnp.int32(0),
        n_lm=jnp.int32(0),
        n_obs=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Keyframe insertion
# ---------------------------------------------------------------------------


@vjit(static_argnames=("scale_factor",))
def insert_keyframe(
    m: SlamMap,
    K: Intrinsics,
    T_cw: lie.SE3,
    feats: FrameFeatures,
    depth: jax.Array,          # (N,) stereo depth per feature (0 = none)
    lm_match: jax.Array,       # (N,) int32 landmark idx matched in tracking, -1 = none
    frame_id: jax.Array,
    signature: jax.Array,      # (D,) place-recognition signature
    scale_factor: float = 1.4142135,
    map_id=0,                  # Atlas map this keyframe belongs to
    max_spawn_depth: float = 1e9,   # ThDepth: stereo-vs-mono obs threshold
) -> SlamMap:
    """Append a keyframe: record observations of matched landmarks, spawn new
    landmarks from unmatched features that carry stereo depth.

    Fully fixed-shape: up to N observation slots for matches plus up to N for
    spawns are claimed with prefix sums; overflow beyond capacity is dropped
    (mode='drop'), mirroring the reference's bounded local map.
    """
    N = feats.xy.shape[0]
    kf_idx = m.n_kf
    K_cap, L_cap, O_cap = m.capacity

    sigma2 = (scale_factor ** feats.level.astype(jnp.float32)) ** 2

    # -- keyframe record --
    m = m._replace(
        kf_T_cw=lie.SE3(
            m.kf_T_cw.R.at[kf_idx].set(T_cw.R), m.kf_T_cw.t.at[kf_idx].set(T_cw.t)
        ),
        kf_valid=m.kf_valid.at[kf_idx].set(True),
        kf_frame_id=m.kf_frame_id.at[kf_idx].set(frame_id.astype(jnp.int32)),
        kf_signature=m.kf_signature.at[kf_idx].set(signature),
        kf_map_id=m.kf_map_id.at[kf_idx].set(jnp.asarray(map_id, jnp.int32)),
    )

    # stereo-vs-mono observation split (ORB-SLAM3 ThDepth): only CLOSE
    # features contribute a disparity row. Far stereo depth error grows as
    # z^2/bf and is the scale-bias channel a ring trajectory can never
    # correct (BENCH_NOTES r05): far observations become MONO (bearing
    # only), so far landmarks' depth comes from multi-view parallax in BA
    # instead of single-view disparity.
    u_r = jnp.where(
        (depth > 1e-3) & (depth < max_spawn_depth),
        feats.xy[:, 0] - K.bf / jnp.maximum(depth, 1e-3), -1.0,
    )
    uvr = jnp.concatenate([feats.xy, u_r[:, None]], axis=-1)  # u_r < 0 = mono

    # -- observations of already-mapped landmarks --
    matched = feats.valid & (lm_match >= 0)
    slot_m = m.n_obs + jnp.cumsum(matched.astype(jnp.int32)) - 1
    slot_m = jnp.where(matched, slot_m, O_cap)  # dropped if not matched
    m = m._replace(
        obs_kf=m.obs_kf.at[slot_m].set(kf_idx, mode="drop"),
        obs_lm=m.obs_lm.at[slot_m].set(jnp.maximum(lm_match, 0), mode="drop"),
        obs_uvr=m.obs_uvr.at[slot_m].set(uvr, mode="drop"),
        obs_sigma2=m.obs_sigma2.at[slot_m].set(sigma2, mode="drop"),
        obs_valid=m.obs_valid.at[slot_m].set(True, mode="drop"),
        lm_nobs=m.lm_nobs.at[jnp.where(matched, lm_match, L_cap)].add(1, mode="drop"),
    )
    n_obs_after_m = jnp.minimum(m.n_obs + jnp.sum(matched.astype(jnp.int32)), O_cap)

    # -- spawn new landmarks from unmatched stereo features --
    # ALL depths spawn (far landmarks keep tracking stable — removing them
    # entirely doubled ring drift, BENCH_NOTES r05); a far spawn's stereo
    # depth only INITIALIZES its position, because its observations are
    # mono (above) and local BA refines the depth from parallax.
    spawn = feats.valid & (lm_match < 0) & (depth > 1e-3)
    lm_slot = m.n_lm + jnp.cumsum(spawn.astype(jnp.int32)) - 1
    in_cap = lm_slot < L_cap
    spawn = spawn & in_cap
    lm_slot_w = jnp.where(spawn, lm_slot, L_cap)

    T_wc = lie.inverse(T_cw)
    p_c = backproject(K, feats.xy, depth)
    p_w = lie.apply(T_wc, p_c)

    m = m._replace(
        lm_pos=m.lm_pos.at[lm_slot_w].set(p_w, mode="drop"),
        lm_desc=m.lm_desc.at[lm_slot_w].set(feats.desc, mode="drop"),
        lm_valid=m.lm_valid.at[lm_slot_w].set(True, mode="drop"),
        lm_nobs=m.lm_nobs.at[lm_slot_w].set(1, mode="drop"),
        lm_anchor_kf=m.lm_anchor_kf.at[lm_slot_w].set(kf_idx, mode="drop"),
        lm_pos_anchor=m.lm_pos_anchor.at[lm_slot_w].set(p_c, mode="drop"),
    )

    # observations for the spawned landmarks
    slot_s = n_obs_after_m + jnp.cumsum(spawn.astype(jnp.int32)) - 1
    slot_s = jnp.where(spawn, slot_s, O_cap)
    m = m._replace(
        obs_kf=m.obs_kf.at[slot_s].set(kf_idx, mode="drop"),
        obs_lm=m.obs_lm.at[slot_s].set(jnp.where(spawn, lm_slot, 0), mode="drop"),
        obs_uvr=m.obs_uvr.at[slot_s].set(uvr, mode="drop"),
        obs_sigma2=m.obs_sigma2.at[slot_s].set(sigma2, mode="drop"),
        obs_valid=m.obs_valid.at[slot_s].set(True, mode="drop"),
    )

    n_spawn = jnp.sum(spawn.astype(jnp.int32))
    return m._replace(
        n_kf=jnp.minimum(m.n_kf + 1, K_cap),
        n_lm=jnp.minimum(m.n_lm + n_spawn, L_cap),
        n_obs=jnp.minimum(n_obs_after_m + n_spawn, O_cap),
    )


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------


@vjit
def landmarks_in_view(
    m: SlamMap,
    K: Intrinsics,
    T_wc: lie.SE3,
    max_distance: float,
    width: int = 640,
    height: int = 480,
) -> Tuple[jax.Array, jax.Array]:
    """The `orb_slam3/get_landmarks_in_view` service as a batched kernel
    (reference call site: FisherInfoManager.cpp:60-78).

    Returns (p_c (L, 3) camera-frame positions, mask (L,) bool).
    """
    T_cw = lie.inverse(T_wc)
    p_c = lie.apply(T_cw, m.lm_pos)
    z = p_c[..., 2]
    u = K.fx * p_c[..., 0] / jnp.where(z > 1e-3, z, 1.0) + K.cx
    v = K.fy * p_c[..., 1] / jnp.where(z > 1e-3, z, 1.0) + K.cy
    dist = jnp.linalg.norm(p_c, axis=-1)
    ok = (
        m.lm_valid
        & (z > 1e-3)
        & (dist < max_distance)
        & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    )
    return p_c, ok


@vjit
def reanchor_landmarks(m: SlamMap) -> SlamMap:
    """Recompute world landmark positions from anchor keyframes' (possibly
    loop-corrected) poses — the map-consistency propagation of SURVEY.md §3.4
    as one batched transform."""
    T_anchor_cw = lie.SE3(m.kf_T_cw.R[m.lm_anchor_kf], m.kf_T_cw.t[m.lm_anchor_kf])
    T_anchor_wc = lie.inverse(T_anchor_cw)
    # rowwise: (L,) SE3 batch applied to (L, 3)
    p_w = (jnp.matmul(T_anchor_wc.R, m.lm_pos_anchor[..., :, None],
                      precision=jax.lax.Precision.HIGHEST))[..., 0] + T_anchor_wc.t
    return m._replace(lm_pos=jnp.where(m.lm_valid[:, None], p_w, m.lm_pos))


@vjit(static_argnames=("target_fraction",))
def compact_map(m: SlamMap, target_fraction: float = 0.75) -> SlamMap:
    """Recycle landmark + observation slots: keep the most-recently-observed
    landmarks, compact them (and their observations) to the front, and reset
    the allocation counters so insertion can continue.

    The reference never needs this — ORB-SLAM3's map grows with RAM — but
    fixed-capacity device state does: when the landmark array fills, new
    terrain becomes unmappable and tracking starves (the round-2 loop
    benchmark hit exactly this). Recency is the eviction key (ORB-SLAM3's
    long-term map pruning analog): a landmark's last observing keyframe is
    one segment_max over the observation table. Down-sizes to
    `target_fraction` of capacity so compaction amortizes. All downstream
    index references (obs_lm) are remapped in the same kernel."""
    L = m.lm_valid.shape[0]
    O = m.obs_valid.shape[0]

    # last keyframe that observed each landmark
    last_kf = jax.ops.segment_max(
        jnp.where(m.obs_valid, m.obs_kf, -1),
        jnp.where(m.obs_valid, m.obs_lm, L),
        num_segments=L + 1,
    )[:L]
    last_kf = jnp.where(m.lm_valid, jnp.maximum(last_kf, m.lm_anchor_kf), -1)

    # Two-tier keep policy (r04):
    #
    # (a) PROTECTED: up to Q landmarks per anchor keyframe survive
    #     regardless of age. Pure recency eviction silently deleted the
    #     oldest region of the map — on the 204-frame ring bench every
    #     landmark observed by keyframes 0-4 was recycled away, so loop
    #     verification against the start of the loop had NOTHING to match
    #     and zero loops ever closed. A protected per-KF core keeps every
    #     keyframe relocalizable/verifiable for the whole mission
    #     (ORB-SLAM3's long-term map keeps all non-redundant points; this
    #     is the fixed-capacity version of that guarantee).
    # (b) RECENCY: the remaining budget goes to the newest unprotected
    #     landmarks, exactly as before. Keys are tied per keyframe, so the
    #     slot index breaks ties deterministically and the threshold frees
    #     exactly down to `target`.
    K_cap = m.kf_valid.shape[0]
    target = int(L * target_fraction)
    Q = max(8, target // K_cap)
    idx_arange = jnp.arange(L, dtype=jnp.int32)
    anchor = jnp.where(m.lm_valid, m.lm_anchor_kf, K_cap).astype(jnp.int32)
    akey = anchor * L + idx_arange
    order_a = jnp.argsort(akey)
    pos_of = jnp.zeros((L,), jnp.int32).at[order_a].set(idx_arange)
    first_pos = jax.ops.segment_min(pos_of, anchor, num_segments=K_cap + 1)
    rank_in_kf = pos_of - first_pos[jnp.minimum(anchor, K_cap)]
    protected = m.lm_valid & (rank_in_kf < Q)
    n_prot = jnp.sum(protected.astype(jnp.int32))

    score = jnp.where(m.lm_valid & jnp.logical_not(protected),
                      last_kf * L + idx_arange.astype(last_kf.dtype), -1)
    order = jnp.sort(score)                    # ascending, ineligible (-1) first
    remaining = jnp.clip(target - n_prot, 0, L - 1)
    cutoff = jnp.where(remaining > 0, order[L - remaining],
                       jnp.asarray(2 * L * L, order.dtype))
    keep = protected | (m.lm_valid & jnp.logical_not(protected) & (score >= cutoff))

    # compact landmarks: old slot -> new slot (stable order)
    new_idx = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dst = jnp.where(keep, new_idx, L)          # L = dropped bucket

    def move(a):
        buf = jnp.zeros((L + 1,) + a.shape[1:], a.dtype)
        return buf.at[dst].set(a, mode="drop")[:L]

    n_keep = jnp.sum(keep.astype(jnp.int32))
    lm_valid = jnp.arange(L) < n_keep

    # remap + compact observations of kept landmarks
    old2new = jnp.where(keep, new_idx, L)
    obs_keep = m.obs_valid & keep[jnp.minimum(m.obs_lm, L - 1)]
    obs_new_lm = old2new[jnp.minimum(m.obs_lm, L - 1)]
    obs_idx = jnp.cumsum(obs_keep.astype(jnp.int32)) - 1
    obs_dst = jnp.where(obs_keep, obs_idx, O)

    def move_obs(a):
        buf = jnp.zeros((O + 1,) + a.shape[1:], a.dtype)
        return buf.at[obs_dst].set(a, mode="drop")[:O]

    n_obs_keep = jnp.sum(obs_keep.astype(jnp.int32))
    obs_valid_new = jnp.arange(O) < n_obs_keep
    return m._replace(
        lm_pos=move(m.lm_pos),
        lm_desc=move(m.lm_desc),
        lm_valid=lm_valid,
        lm_nobs=move(m.lm_nobs),
        lm_anchor_kf=move(m.lm_anchor_kf),
        lm_pos_anchor=move(m.lm_pos_anchor),
        obs_kf=move_obs(m.obs_kf),
        obs_lm=move_obs(obs_new_lm),
        obs_uvr=move_obs(m.obs_uvr),
        obs_sigma2=jnp.where(obs_valid_new, move_obs(m.obs_sigma2), 1.0),
        obs_valid=obs_valid_new,
        n_lm=n_keep,
        n_obs=n_obs_keep,
    )


@vjit
def cull_landmarks(m: SlamMap, min_obs: int = 2, grace_kf: int = 2) -> SlamMap:
    """Invalidate under-observed landmarks once their anchor KF is old enough
    (reference capability: ORB-SLAM3 MapPoint culling in local mapping)."""
    old_enough = (m.n_kf - m.lm_anchor_kf) > grace_kf
    bad = m.lm_valid & old_enough & (m.lm_nobs < min_obs)
    lm_valid = m.lm_valid & jnp.logical_not(bad)
    obs_valid = m.obs_valid & lm_valid[m.obs_lm]
    return m._replace(lm_valid=lm_valid, obs_valid=obs_valid)


def gather_window_problem(
    m: SlamMap,
    window: int,
    max_obs_local: int,
):
    """Select observations of the last `window` keyframes into a fixed-size
    local BA problem. Returns (BAProblem-ready pieces, local window start).

    Landmarks anchored outside the window are held fixed — they are the
    anchor to the past that replaces ORB-SLAM3's fixed covisible keyframes.
    """
    from fitslam_tpu.ops.ba import BAProblem

    start = jnp.maximum(m.n_kf - window, 0)
    in_win = m.obs_valid & (m.obs_kf >= start)
    idx = jnp.nonzero(in_win, size=max_obs_local, fill_value=m.obs_valid.shape[0] - 1)[0]
    sel_valid = in_win[idx]

    local_kf = jnp.clip(m.obs_kf[idx] - start, 0, window - 1)
    obs = Observations(
        kf=local_kf.astype(jnp.int32),
        lm=m.obs_lm[idx],
        uvr=m.obs_uvr[idx],
        sigma2=m.obs_sigma2[idx],
        valid=sel_valid,
    )
    # window poses (gather `window` consecutive slots)
    w_idx = start + jnp.arange(window)
    w_idx = jnp.minimum(w_idx, m.kf_valid.shape[0] - 1)
    T_win = lie.SE3(m.kf_T_cw.R[w_idx], m.kf_T_cw.t[w_idx])
    kf_exists = (w_idx < m.n_kf) & m.kf_valid[w_idx]
    # gauge: oldest window KF fixed; also fix any empty slots
    fixed_kf = jnp.logical_not(kf_exists) | (jnp.arange(window) == 0)
    anchored_outside = m.lm_anchor_kf < start
    fixed_lm = jnp.logical_not(m.lm_valid) | anchored_outside

    prob = BAProblem(
        T_cw=T_win, points=m.lm_pos, obs=obs, fixed_kf=fixed_kf, fixed_lm=fixed_lm
    )
    return prob, start, w_idx


def landmarks_seen_by_kf(m: SlamMap, kf_idx) -> jax.Array:
    """(L,) bool — landmarks with a valid observation from keyframe kf_idx."""
    L = m.lm_valid.shape[0]
    hit = m.obs_valid & (m.obs_kf == kf_idx)
    mask = jnp.zeros((L,), bool).at[jnp.where(hit, m.obs_lm, L)].set(True, mode="drop")
    return mask & m.lm_valid


def gather_covis_problem(
    m: SlamMap,
    window: int,
    max_obs_local: int,
):
    """Covisibility-window local BA problem: select the `window` keyframes
    sharing the MOST landmarks with the newest keyframe (ORB-SLAM3's
    covisible local window; SURVEY.md §2.1 S1) instead of the temporally
    last ones — on a revisit, the co-observing keyframes are old, not recent.

    Covisibility counts are one segment-sum over the observation table.
    Returns (BAProblem, w_idx (window,) selected KF slots, kf_exists)."""
    from fitslam_tpu.ops.ba import BAProblem

    K_cap = m.kf_valid.shape[0]
    c = jnp.maximum(m.n_kf - 1, 0)
    lm_c = landmarks_seen_by_kf(m, c)
    shared = m.obs_valid & lm_c[m.obs_lm]
    counts = jax.ops.segment_sum(
        shared.astype(jnp.int32), m.obs_kf, num_segments=K_cap
    )
    exists = m.kf_valid & (jnp.arange(K_cap) < m.n_kf)
    counts = jnp.where(exists, counts, -1)
    counts = counts.at[c].set(jnp.int32(2**30))  # current KF always selected
    _, w_idx = jax.lax.top_k(counts, window)
    w_idx = jnp.sort(w_idx).astype(jnp.int32)    # oldest selected = gauge
    kf_exists = exists[w_idx]

    inv = jnp.full((K_cap,), -1, jnp.int32).at[w_idx].set(
        jnp.where(kf_exists, jnp.arange(window, dtype=jnp.int32), -1)
    )
    in_win = m.obs_valid & (inv[m.obs_kf] >= 0)
    idx = jnp.nonzero(in_win, size=max_obs_local,
                      fill_value=m.obs_valid.shape[0] - 1)[0]
    sel_valid = in_win[idx]
    obs_lm_old = m.obs_lm[idx]

    # Compact the TOUCHED landmarks into a dense local index space of size
    # L_loc = max_obs_local // 2: every L-shaped tensor of the solve (Hll,
    # the (K, L, 6, 3) coupling Y, and its Schur einsums) shrinks by
    # L_cap / L_loc. A covis window of `window` keyframes can reference at
    # most window * num_features distinct landmarks (~3k in practice);
    # overflow slots degrade gracefully (their observations are dropped
    # from this solve only).
    L_cap = m.lm_pos.shape[0]
    L_loc = max_obs_local // 2
    touched = jnp.zeros((L_cap + 1,), bool).at[
        jnp.where(sel_valid, obs_lm_old, L_cap)
    ].set(True)[:L_cap]
    new_idx = jnp.cumsum(touched.astype(jnp.int32)) - 1
    slot_ok = touched & (new_idx < L_loc)
    old2new = jnp.where(slot_ok, new_idx, L_loc)
    sel_old = jnp.nonzero(slot_ok, size=L_loc, fill_value=L_cap - 1)[0]
    slot_valid = jnp.arange(L_loc) < jnp.sum(slot_ok.astype(jnp.int32))
    lm_new = old2new[obs_lm_old]
    obs = Observations(
        kf=jnp.clip(inv[m.obs_kf[idx]], 0, window - 1),
        lm=jnp.minimum(lm_new, L_loc - 1),
        uvr=m.obs_uvr[idx],
        sigma2=m.obs_sigma2[idx],
        valid=sel_valid & (lm_new < L_loc),
    )
    T_win = lie.SE3(m.kf_T_cw.R[w_idx], m.kf_T_cw.t[w_idx])
    fixed_kf = jnp.logical_not(kf_exists) | (jnp.arange(window) == 0)
    # landmarks anchored outside the covisible set stay fixed (the anchor to
    # the rest of the map, mirroring ORB-SLAM3's fixed-KF fringe)
    anchor_in = inv[m.lm_anchor_kf] >= 0
    fixed_lm_full = jnp.logical_not(m.lm_valid) | jnp.logical_not(anchor_in)
    fixed_lm = jnp.logical_not(slot_valid) | fixed_lm_full[sel_old]
    prob = BAProblem(
        T_cw=T_win, points=m.lm_pos[sel_old], obs=obs,
        fixed_kf=fixed_kf, fixed_lm=fixed_lm,
    )
    return prob, w_idx, kf_exists, sel_old, (slot_valid & ~fixed_lm)


@vjit(static_argnames=("iters",))
def global_ba(m: SlamMap, K: Intrinsics, iters: int = 8):
    """Global bundle adjustment over the FULL map — every valid keyframe
    (except KF 0, the gauge) and every valid landmark, against the whole
    observation table.

    Reference capability: ORB-SLAM3's LoopClosing thread runs global BA after
    essential-graph optimization (submodule, SURVEY.md §2.1 S1, §3.4; build
    evidence root_dir/build_packages.sh:5). Here it is the same Schur-
    complement kernel as local BA with nothing windowed out.

    Returns (map, BAStats)."""
    from fitslam_tpu.ops import ba as ba_mod

    K_cap = m.kf_valid.shape[0]
    obs = Observations(
        kf=m.obs_kf, lm=m.obs_lm, uvr=m.obs_uvr,
        sigma2=m.obs_sigma2, valid=m.obs_valid,
    )
    fixed_kf = jnp.logical_not(m.kf_valid) | (jnp.arange(K_cap) == 0)
    fixed_lm = jnp.logical_not(m.lm_valid)
    prob = ba_mod.BAProblem(
        T_cw=m.kf_T_cw, points=m.lm_pos, obs=obs,
        fixed_kf=fixed_kf, fixed_lm=fixed_lm,
    )
    out, stats = ba_mod.bundle_adjust(K, prob, iters=iters, damping=1e-3)

    keep = m.kf_valid[:, None]
    m = m._replace(
        kf_T_cw=lie.SE3(
            jnp.where(keep[..., None], out.T_cw.R, m.kf_T_cw.R),
            jnp.where(keep, out.T_cw.t, m.kf_T_cw.t),
        ),
        lm_pos=jnp.where(m.lm_valid[:, None], out.points, m.lm_pos),
    )
    # refresh anchor-frame landmark positions: every anchor may have moved
    anchor_T = lie.SE3(m.kf_T_cw.R[m.lm_anchor_kf], m.kf_T_cw.t[m.lm_anchor_kf])
    p_anchor = (jnp.matmul(anchor_T.R, m.lm_pos[..., :, None],
                           precision=jax.lax.Precision.HIGHEST))[..., 0] + anchor_T.t
    m = m._replace(
        lm_pos_anchor=jnp.where(m.lm_valid[:, None], p_anchor, m.lm_pos_anchor)
    )
    return m, stats


def global_ba_dist(m: SlamMap, K: Intrinsics, mesh, iters: int = 8):
    """Global BA with the LANDMARK-SHARDED distributed solver on a >1-device
    mesh: landmarks, their Hll blocks, and the (K, Lb, 6, 3) coupling tensor
    live sharded; only pose-side reductions psum over ICI (parallel/dist_ba,
    BASELINE.json north star, VERDICT r04 next-step #9 — the live loop-closing
    GBA path, not just benches/dryrun). Observations are re-routed to their
    landmark's owner shard on host (GBA is a rare, loop-closure-time event).

    Returns (map, chi2 history). Pose/landmark writeback mirrors global_ba."""
    from fitslam_tpu.ops import ba as ba_mod
    from fitslam_tpu.parallel import dist_ba

    K_cap = m.kf_valid.shape[0]
    obs = Observations(
        kf=m.obs_kf, lm=m.obs_lm, uvr=m.obs_uvr,
        sigma2=m.obs_sigma2, valid=m.obs_valid,
    )
    fixed_kf = jnp.logical_not(m.kf_valid) | (jnp.arange(K_cap) == 0)
    fixed_lm = jnp.logical_not(m.lm_valid)
    prob = ba_mod.BAProblem(
        T_cw=m.kf_T_cw, points=m.lm_pos, obs=obs,
        fixed_kf=fixed_kf, fixed_lm=fixed_lm,
    )
    n_dev = mesh.devices.size
    packed = dist_ba.shard_problem_by_landmark(prob, n_dev)
    out, chis = dist_ba.landmark_sharded_bundle_adjust(
        mesh, K, packed, iters=iters, damping=1e-3)

    keep = m.kf_valid[:, None]
    m = m._replace(
        kf_T_cw=lie.SE3(
            jnp.where(keep[..., None], out.T_cw.R, m.kf_T_cw.R),
            jnp.where(keep, out.T_cw.t, m.kf_T_cw.t),
        ),
        lm_pos=jnp.where(m.lm_valid[:, None], out.points, m.lm_pos),
    )
    anchor_T = lie.SE3(m.kf_T_cw.R[m.lm_anchor_kf], m.kf_T_cw.t[m.lm_anchor_kf])
    p_anchor = (jnp.matmul(anchor_T.R, m.lm_pos[..., :, None],
                           precision=jax.lax.Precision.HIGHEST))[..., 0] + anchor_T.t
    m = m._replace(
        lm_pos_anchor=jnp.where(m.lm_valid[:, None], p_anchor, m.lm_pos_anchor)
    )
    return m, chis


@vjit(static_argnames=("window", "max_obs_local", "iters", "covis"))
def local_ba(
    m: SlamMap,
    K: Intrinsics,
    window: int = 8,
    max_obs_local: int = 8192,
    iters: int = 5,
    covis: bool = True,
) -> SlamMap:
    """Local bundle adjustment over a keyframe window.

    `covis=True` (default) selects the window by covisibility — the keyframes
    sharing the most landmarks with the newest one, matching ORB-SLAM3's
    LocalMapping::LocalBA over the covisibility graph; on a revisit these are
    the OLD co-observing keyframes, not the most recent. `covis=False` keeps
    the temporal last-`window` selection.

    Reference capability: ORB-SLAM3 LocalMapping::LocalBA (submodule; the
    'sharded Schur' north star of BASELINE.json maps this over devices).
    """
    from fitslam_tpu.ops import ba as ba_mod

    if covis:
        prob, w_idx, kf_exists, lm_sel_old, lm_writeback = gather_covis_problem(
            m, window, max_obs_local)
    else:
        prob, start, w_idx = gather_window_problem(m, window, max_obs_local)
        kf_exists = (w_idx < m.n_kf) & m.kf_valid[w_idx]
        lm_sel_old = None
    out, _ = ba_mod.bundle_adjust(K, prob, iters=iters, damping=1e-3)

    # scatter optimized window poses back (only slots that actually exist)
    exists = kf_exists[:, None]
    R = m.kf_T_cw.R.at[w_idx].set(jnp.where(exists[..., None], out.T_cw.R, m.kf_T_cw.R[w_idx]))
    t = m.kf_T_cw.t.at[w_idx].set(jnp.where(exists, out.T_cw.t, m.kf_T_cw.t[w_idx]))
    if lm_sel_old is not None:
        # compacted local landmark space: scatter the moved points back
        pts = m.lm_pos.at[lm_sel_old].set(
            jnp.where(lm_writeback[:, None], out.points, m.lm_pos[lm_sel_old]))
    else:
        pts = jnp.where(m.lm_valid[:, None], out.points, m.lm_pos)
    m = m._replace(kf_T_cw=lie.SE3(R, t), lm_pos=pts)

    # refresh anchor-frame positions for landmarks anchored inside the window
    # (their anchors just moved)
    K_cap = m.kf_valid.shape[0]
    inv = jnp.full((K_cap,), -1, jnp.int32).at[w_idx].set(
        jnp.where(kf_exists, jnp.arange(window, dtype=jnp.int32), -1)
    )
    anchor_in = inv[m.lm_anchor_kf] >= 0
    anchor_T = lie.SE3(m.kf_T_cw.R[m.lm_anchor_kf], m.kf_T_cw.t[m.lm_anchor_kf])
    p_anchor = (jnp.matmul(anchor_T.R, m.lm_pos[..., :, None],
                           precision=jax.lax.Precision.HIGHEST))[..., 0] + anchor_T.t
    m = m._replace(
        lm_pos_anchor=jnp.where((m.lm_valid & anchor_in)[:, None], p_anchor, m.lm_pos_anchor)
    )
    return m
