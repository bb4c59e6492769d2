"""Loop detection, geometric verification, and map correction.

Reference capability: ORB-SLAM3's LoopClosing thread (DBoW2 candidate
retrieval, Sim3/SE3 geometric verification, essential-graph optimization,
landmark re-projection; submodule, SURVEY.md §2.1 S1, §3.4). TPU-native
recipe:

- candidate retrieval = signature matvec (ops/place) with a temporal gap,
- verification = Hamming match of the current keyframe's descriptors against
  the candidate's landmarks + motion-only GN solve (ops/ba.solve_pose),
- correction = dense pose-graph GN (ops/pgo) over odometry + loop edges,
  then one batched re-anchoring of all landmarks (models/slam_map), the same
  keyframe-frame storage trick the reference uses for its roadmap
  (FrontierRoadmap.cpp:118-127).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit
import numpy as np

from fitslam_tpu.ops import ba, lie, matching, pgo
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.models import slam_map as sm
from fitslam_tpu.models.tracking import StereoFrame


class LoopCandidate(NamedTuple):
    kf_idx: jax.Array    # () int32
    score: jax.Array     # () float32


@vjit
def detect_loop(m: sm.SlamMap, signature: jax.Array, current_kf: jax.Array,
                min_gap: int = 20) -> LoopCandidate:
    """Best loop candidate by signature similarity with temporal gap.

    Signatures are centered on the MAP's mean signature before the cosine —
    the dense-BoW analog of DBoW2's inverse-document-frequency weighting.
    Per-signature centering (done at build time) removes the uniform
    component, but every frame of one environment also shares that world's
    texture prior: on a texture-homogeneous world, raw cosines measured
    0.966-0.974 for UNRELATED pairs vs 0.974-1.0 for true revisits — a
    margin that drowns once the map holds enough keyframes (the 200-frame
    ring bench closed 0 loops). Subtracting the map mean scores each pair
    by what distinguishes them from this world's average view
    (ops/place.centered_cosine_scores)."""
    from fitslam_tpu.ops.place import centered_cosine_scores

    K_cap = m.kf_valid.shape[0]
    scores = centered_cosine_scores(signature, m.kf_signature, m.kf_valid)
    ok = m.kf_valid & (jnp.arange(K_cap) < current_kf - min_gap)
    scores = jnp.where(ok, scores, -jnp.inf)
    best = jnp.argmax(scores)
    return LoopCandidate(best.astype(jnp.int32), scores[best])


@vjit
def landmarks_seen_by(m: sm.SlamMap, kf_idx: jax.Array) -> jax.Array:
    """(L,) bool — landmarks with a valid observation from keyframe kf_idx."""
    L = m.lm_valid.shape[0]
    hit = m.obs_valid & (m.obs_kf == kf_idx)
    mask = jnp.zeros((L,), bool).at[jnp.where(hit, m.obs_lm, L)].set(True, mode="drop")
    return mask & m.lm_valid


@vjit
def verify_loop(
    K: Intrinsics,
    m: sm.SlamMap,
    frame: StereoFrame,
    cand_kf: jax.Array,
    max_hamming: int = 64,
) -> Tuple[lie.SE3, jax.Array]:
    """Match the current frame against the candidate's landmarks and solve the
    camera pose those landmarks imply. Returns (T_cw_loop, inlier count)."""
    lm_mask = landmarks_seen_by(m, cand_kf)
    # fused Pallas matcher on TPU (no (N, L) distance matrix in HBM,
    # ops/pallas_matching.py); identical XLA selection elsewhere
    from fitslam_tpu.ops.pallas_matching import match_ratio_fused

    mt = match_ratio_fused(frame.feats.desc, frame.feats.valid,
                           m.lm_desc, lm_mask,
                           max_distance=max_hamming, ratio=0.85, mutual=True)

    u_r = jnp.where(
        frame.depth > 1e-3,
        frame.feats.xy[:, 0] - K.bf / jnp.maximum(frame.depth, 1e-3),
        -1.0,
    )
    uvr = jnp.concatenate([frame.feats.xy, u_r[:, None]], axis=-1)
    T0 = lie.SE3(m.kf_T_cw.R[cand_kf], m.kf_T_cw.t[cand_kf])
    T_loop, inl, _ = ba.solve_pose(
        K, T0, m.lm_pos[mt.idx_b], uvr,
        jnp.ones((frame.feats.capacity,)), mt.valid, iters=10,
    )
    return T_loop, jnp.sum(inl).astype(jnp.int32)


@vjit(static_argnames=("cap",))
def fuse_loop_landmarks(
    K: Intrinsics,
    m: sm.SlamMap,
    kf_i: jax.Array,          # () int32 old loop keyframe
    kf_j: jax.Array,          # () int32 new keyframe (loop tail)
    cap: int = 2048,
    max_dist: float = 0.25,
    max_hamming: float = 72.0,
) -> sm.SlamMap:
    """Merge duplicate landmarks across a just-closed loop (the ORB-SLAM3
    LoopClosing SearchAndFuse stage, SURVEY.md §2.1 S1).

    The revisit spawned NEW landmarks for terrain the loop keyframe already
    mapped (pre-correction drift kept projection matching from associating
    them). After PGO + re-anchoring the duplicates are spatially coincident:
    take landmarks anchored near kf_j (side B) and near kf_i (side A), match
    B -> A by 3D proximity + descriptor Hamming distance (one (cap, cap)
    matmul pair on the MXU), rewrite B's observations onto A, and invalidate
    B. GBA then sees one point per physical feature, and subsequent tracking
    through the overlap re-uses the old map instead of the forked copy."""
    L = m.lm_valid.shape[0]
    near_a = m.lm_valid & (jnp.abs(m.lm_anchor_kf - kf_i) <= 2)
    near_b = m.lm_valid & (m.lm_anchor_kf >= kf_j - 1) & (m.lm_anchor_kf <= kf_j)
    idx_a = jnp.nonzero(near_a, size=cap, fill_value=L - 1)[0]
    ok_a = near_a[idx_a]
    idx_b = jnp.nonzero(near_b, size=cap, fill_value=L - 1)[0]
    ok_b = near_b[idx_b]
    pa, pb = m.lm_pos[idx_a], m.lm_pos[idx_b]
    d2 = jnp.sum((pb[:, None, :] - pa[None, :, :]) ** 2, axis=-1)  # (B, A)
    sim = jnp.matmul(m.lm_desc[idx_b].astype(jnp.float32),
                     m.lm_desc[idx_a].astype(jnp.float32).T)
    ham = (m.lm_desc.shape[1] - sim) * 0.5
    good = (ok_b[:, None] & ok_a[None, :]
            & (d2 < max_dist * max_dist) & (ham <= max_hamming))
    d2m = jnp.where(good, d2, jnp.inf)
    best = jnp.argmin(d2m, axis=1)
    has = jnp.isfinite(jnp.min(d2m, axis=1))
    target = idx_a[best]                      # (B,) absorbing landmark slot
    old2new = jnp.arange(L, dtype=jnp.int32).at[
        jnp.where(has, idx_b, L)
    ].set(jnp.where(has, target, 0).astype(jnp.int32), mode="drop")
    drop = jnp.zeros((L,), bool).at[jnp.where(has, idx_b, L)].set(
        True, mode="drop")
    nobs_add = jnp.where(has, m.lm_nobs[idx_b], 0)
    return m._replace(
        obs_lm=old2new[m.obs_lm],
        lm_valid=m.lm_valid & jnp.logical_not(drop),
        lm_nobs=m.lm_nobs.at[jnp.where(has, target, L)].add(
            nobs_add, mode="drop"),
    )


@vjit
def scale_search(
    K: Intrinsics,
    m: sm.SlamMap,
    scales: jax.Array,       # (S,) candidate global scales (include 1.0)
) -> Tuple[sm.SlamMap, jax.Array, jax.Array]:
    """Global map-scale line search + re-triangulation (r05).

    The one drift mode an SE(3) loop closure cannot repair is uniform map
    scale: a ring whose per-step translations are biased short closes into
    a smaller ring whose loop edge, PGO, and (from the drifted basin) GBA
    all score near-optimal (BENCH_NOTES r05: ring seed 3 corrected-Sim3
    ATE 0.023 vs SE3 0.121 — the residual error was a pure -1.38% shrink). But
    scale IS observable in a stereo system: every stereo observation row
    (u - u_r = bf/z) pins absolute depth, so the ground-truth-scale basin
    scores measurably lower chi2 on the same observations (21% lower,
    tools/diag_gba_ceiling.py). This is the Sim(3)-loop-closure analog of
    Strasdat's scale-drift-aware monocular closure / ORB-SLAM's Sim3
    essential graph, collapsed to the uniform-scale mode as one batched
    line search: for each candidate s, rescale all camera centers about
    the gauge keyframe's center, RE-TRIANGULATE every landmark from its
    observations under the scaled poses (ops/ba.retriangulate_points — the
    stereo rows then fight or agree with the scaled parallax), and score
    the robust chi2; keep the argmin. s=1.0 must be in the grid so the
    search can never regress. GBA afterwards polishes the non-uniform
    remainder from inside the right basin.

    Returns (map with best-scale poses and re-triangulated landmarks,
    best scale, (S,) chi2 per candidate)."""
    obs = ba.Observations(kf=m.obs_kf, lm=m.obs_lm, uvr=m.obs_uvr,
                          sigma2=m.obs_sigma2, valid=m.obs_valid)
    # gauge camera center (keyframe 0): kept exactly fixed by the rescale
    R0, t0 = m.kf_T_cw.R[0], m.kf_T_cw.t[0]
    c0 = -(jnp.swapaxes(R0, -1, -2) @ t0[..., None])[..., 0]
    centers = -jnp.einsum("kij,kj->ki", jnp.swapaxes(m.kf_T_cw.R, -1, -2),
                          m.kf_T_cw.t)

    def at_scale(s):
        c_s = c0 + s * (centers - c0)
        t_s = -jnp.einsum("kij,kj->ki", m.kf_T_cw.R, c_s)
        T_s = lie.SE3(m.kf_T_cw.R, t_s)
        pts = ba.retriangulate_points(K, T_s, m.lm_pos, obs, m.lm_valid)
        chi2 = ba.chi2_residuals(K, T_s, pts, obs)
        return T_s, pts, chi2

    T_all, pts_all, chi_all = jax.lax.map(at_scale, scales)
    best = jnp.argmin(chi_all)
    m2 = m._replace(
        kf_T_cw=lie.SE3(m.kf_T_cw.R, T_all.t[best]),
        lm_pos=pts_all[best],
    )
    return m2, scales[best], chi_all


class LoopCloser:
    """Host-side accumulator of loop edges + correction trigger."""

    def __init__(self, cfg, K: Intrinsics):
        self.cfg = cfg
        self.K = K
        # (i, j, T_ij 4x4, weight): weight grows with verification inliers —
        # a 40-inlier edge is far less certain than a 240-inlier one, and a
        # mis-estimated weak edge STAYS in this table pulling on every later
        # PGO (seed-3 r05: one 39-inlier edge with 0.82 m error deformed the
        # map beyond what two later near-perfect edges could repair)
        self.loop_edges: List[Tuple[int, int, np.ndarray, float]] = []
        self.last_loop_kf = -(10**9)
        # >1-device mesh => GBA runs landmark-sharded over it (the live
        # distributed path of BASELINE.json configs[4]; set by the runner)
        self.mesh = None
        # temporal consistency state (ORB-SLAM3 mnCovisibilityConsistencyTh):
        # the same candidate region must recur on consecutive keyframes
        self._consist_cand = -(10**9)
        self._consist_count = 0
        self._last_gba_kf = -(10**9)   # GBA rate limit (gba_min_interval_kf)

    def on_keyframe(self, slam, kf_idx: int, cand_idx: Optional[int] = None,
                    score: Optional[float] = None) -> Optional[dict]:
        """Called after each keyframe insertion. Returns correction info when
        a loop was closed, else None.

        `cand_idx`/`score` carry the candidate retrieval ALREADY computed on
        device inside the backend step (StepOutputs.loop_cand/loop_score,
        read back in the poll's packed pull) — the common no-loop keyframe
        then costs zero device round-trips here. When absent (legacy
        callers), retrieval runs on demand."""
        cfg = self.cfg.loop
        if not cfg.enabled or kf_idx < cfg.min_gap_keyframes:
            return None
        # post-closure cooldown (ORB-SLAM3 mnLastLoopKFid+10): optional hard
        # gate on re-detection. Default 0 — the cheaper policy below keeps
        # accumulating (better) loop edges with PGO-only corrections and
        # rate-limits only the expensive GBA stage
        if kf_idx < self.last_loop_kf + cfg.cooldown_keyframes:
            return None
        m = slam.map
        if cand_idx is None or score is None:
            sig = m.kf_signature[kf_idx]
            cand = detect_loop(m, sig, jnp.int32(kf_idx),
                               cfg.min_gap_keyframes)
            cand_idx, score = int(cand.kf_idx), float(cand.score)
        if cand_idx < 0 or score < cfg.min_score:
            self._consist_count = 0
            return None
        # temporal-consistency gate: the candidate region must recur on
        # consecutive keyframes before verification may accept it
        # (ORB-SLAM3 DetectLoop consistency check)
        if abs(cand_idx - self._consist_cand) <= cfg.consistency_radius_kf:
            self._consist_count += 1
        else:
            self._consist_count = 1
        self._consist_cand = cand_idx
        if self._consist_count < cfg.consistency_threshold:
            return None
        # geometric verification against the candidate's landmarks
        frame = slam.last_frame
        if frame is None:
            return None
        cand_kf = jnp.int32(cand_idx)
        T_loop, n_inl = verify_loop(self.K, m, frame, cand_kf)
        i = cand_idx
        j = kf_idx
        # ONE packed pull for every host decision this correction needs:
        # inlier count + the Atlas map ids of both loop ends
        v = np.asarray(jnp.stack([
            n_inl.astype(jnp.float32),
            m.kf_map_id[i].astype(jnp.float32),
            m.kf_map_id[j].astype(jnp.float32),
        ]))
        if int(v[0]) < cfg.min_matches:
            return None
        n_inl_h, map_i, map_j = int(v[0]), int(v[1]), int(v[2])
        T_i = lie.SE3(m.kf_T_cw.R[i], m.kf_T_cw.t[i])
        # keyframe j's pose BEFORE correction: the tracker update at the end
        # composes the correction delta relative to it
        T_j_old = lie.SE3(m.kf_T_cw.R[j], m.kf_T_cw.t[j])
        T_ij = lie.compose(T_i, lie.inverse(T_loop))
        # confidence-proportional information scale (capped): ~2 at the
        # 40-inlier acceptance floor, saturating at 10 for dense revisits
        edge_w = float(min(10.0, n_inl_h / 20.0))
        self.loop_edges.append((i, j, np.asarray(T_ij.matrix()), edge_w))
        self.last_loop_kf = kf_idx
        self._consist_count = 0
        self._consist_cand = -(10**9)

        # --- pose-graph correction ---
        K_cap = m.kf_valid.shape[0]
        max_odo = K_cap - 1
        # odometry measurements from the RAW (pre-correction) estimates:
        # these are the springs that relax to absorb the closure residual
        odo = pgo.odometry_edges(m.kf_T_cw, m.n_kf, max_odo)
        # Pre-correct the loop TAIL group (keyframe j and its recent
        # neighbors) by composing the verified loop delta — ORB-SLAM3
        # CorrectLoop's CorrectedSim3 group. The tail's keyframes
        # re-associated the loop head's landmarks while still drifted, so
        # cross-loop covisibility pairs measured from raw estimates would
        # CONTRADICT the loop edge and pin the drifted shape (r05:
        # near-perfect loop edges moved kfATE by <7%); measuring them
        # through the corrected tail makes them reinforce the closure.
        idx = jnp.arange(K_cap)
        tail = m.kf_valid & (idx > j - cfg.correct_tail_kf) & (idx <= j)
        delta = lie.compose(lie.inverse(T_j_old), T_loop)  # j_old -> loop
        T_tail = lie.compose(m.kf_T_cw, delta)
        T_corr = lie.SE3(
            jnp.where(tail[:, None, None], T_tail.R, m.kf_T_cw.R),
            jnp.where(tail[:, None], T_tail.t, m.kf_T_cw.t),
        )
        # essential-graph edges (covisibility above threshold): without them
        # PGO spreads the loop error evenly along the odometry chain; with
        # them the correction concentrates where no shared observations pin
        # the relative poses (VERDICT r04 next-step #1)
        covis = pgo.covisibility_edges(
            m.kf_T_cw, m.kf_valid, m.obs_kf, m.obs_lm, m.obs_valid,
            n_landmarks=m.lm_valid.shape[0],
            max_edges=cfg.covis_max_edges, min_shared=cfg.covis_min_shared,
            kf_T_cw_corr=T_corr, tail=tail,
            loop_gap=cfg.min_gap_keyframes,
        )
        # fixed-capacity loop-edge table: one compiled PGO shape regardless
        # of how many loops have closed (newest kept when over capacity)
        E_cap = cfg.max_loop_edges
        recent = self.loop_edges[-E_cap:]
        E_loop = len(recent)
        li = np.zeros((E_cap,), np.int32)
        lj = np.zeros((E_cap,), np.int32)
        lT = np.tile(np.eye(4, dtype=np.float32), (E_cap, 1, 1))
        lw = np.ones((E_cap,), np.float32)
        li[:E_loop] = [e[0] for e in recent]
        lj[:E_loop] = [e[1] for e in recent]
        lT[:E_loop] = np.stack([e[2] for e in recent])
        lw[:E_loop] = [e[3] for e in recent]
        loop_edges = pgo.PoseGraphEdges(
            i=jnp.asarray(li), j=jnp.asarray(lj),
            T_ij=lie.SE3.from_matrix(jnp.asarray(lT)),
            weight=jnp.asarray(lw),
            valid=jnp.arange(E_cap) < E_loop,
        )
        edges = jax.tree.map(
            lambda a, b, c: jnp.concatenate([a, b, c], axis=0),
            odo, covis, loop_edges,
        )
        fixed = jnp.zeros((K_cap,), bool).at[0].set(True)
        # initialize GN at the tail-corrected poses: the measurement set is
        # consistent around that point, so convergence is one clean descent
        # instead of fighting the closure discontinuity
        T_new, chis = pgo.optimize_pose_graph(
            T_corr, m.kf_valid, edges, fixed, iters=cfg.pgo_iters
        )
        # keep only valid slots
        keep = m.kf_valid[:, None]
        m = m._replace(
            kf_T_cw=lie.SE3(
                jnp.where(keep[..., None], T_new.R, m.kf_T_cw.R),
                jnp.where(keep, T_new.t, m.kf_T_cw.t),
            )
        )
        m = sm.reanchor_landmarks(m)
        # Atlas merge: a loop between keyframes of different maps welds the
        # newer map into the older (ORB-SLAM3 map merging, S1). Map ids came
        # back in the packed verify pull — no extra readback.
        merged = None
        if map_i != map_j:
            lo, hi = min(map_i, map_j), max(map_i, map_j)
            m = m._replace(
                kf_map_id=jnp.where(m.kf_map_id == hi, lo, m.kf_map_id)
            )
            slam.state = slam.state._replace(map_id=jnp.int32(lo))
            merged = (hi, lo)
        # --- landmark fusion (ORB-SLAM3 SearchAndFuse): the revisit spawned
        # duplicate landmarks for terrain the loop keyframe already mapped;
        # merge them so later tracking and GBA see ONE point per feature
        if cfg.fuse_landmarks:
            m = fuse_loop_landmarks(self.K, m, jnp.int32(i), jnp.int32(j))
        # --- landmark re-triangulation from the corrected poses: GBA is a
        # local method and the pre-correction map is a genuine local minimum
        # (poses and landmarks complicit in the drifted geometry — measured
        # 21% higher chi2 than the ground-truth basin on the same
        # observations, tools/diag_gba_ceiling.py). The rigid re-anchor
        # above preserves that geometry; re-deriving landmark positions
        # from measurements under the corrected poses breaks it, and GBA
        # then descends into the deeper basin (ops/ba.retriangulate_points)
        # GBA rate limit decided up front: the retriangulation / scale
        # search exist to put GBA in a better basin, so they run (and pay)
        # only when GBA itself will run
        run_gba = (cfg.run_global_ba
                   and kf_idx >= self._last_gba_kf + cfg.gba_min_interval_kf)
        scale_est = None
        if run_gba and cfg.scale_search_halfrange > 0:
            # uniform-scale line search (Sim3-closure analog, see
            # scale_search): includes the re-triangulation step at the
            # winning scale, and s=1.0 is always a candidate so the
            # correction can only lower chi2
            h = cfg.scale_search_halfrange
            n = cfg.scale_search_points | 1         # odd => 1.0 in the grid
            scales = jnp.linspace(1.0 - h, 1.0 + h, n)
            m, s_best, _ = scale_search(self.K, m, scales)
            scale_est = s_best          # device scalar; finalize() reads it
        elif run_gba and cfg.retriangulate:
            obs = ba.Observations(kf=m.obs_kf, lm=m.obs_lm, uvr=m.obs_uvr,
                                  sigma2=m.obs_sigma2, valid=m.obs_valid)
            m = m._replace(lm_pos=ba.retriangulate_points(
                self.K, m.kf_T_cw, m.lm_pos, obs, m.lm_valid))
        # --- global BA: re-optimize every pose AND landmark against all
        # observations from the pose-graph-corrected initialization (the
        # reference's GBA stage of the loop-closing thread, SURVEY.md §3.4).
        # DISPATCHED, never synced: the chi2 history stays a device array in
        # the event record (materialized lazily at finalize) so the camera
        # loop keeps dispatching while the device grinds through GBA — the
        # async analog of ORB-SLAM3's background-GBA thread.
        # GBA rate limit: back-to-back closures (ring bench: kf 98/100/102)
        # each repaid the full GBA for marginal gain; edges accumulate and
        # PGO corrects on every closure, GBA runs at most once per
        # gba_min_interval_kf keyframes (the later refine_map/GBA sees all
        # edges' PGO state anyway)
        gba_chi2 = None
        if run_gba:
            self._last_gba_kf = kf_idx
            if self.mesh is not None and self.mesh.devices.size > 1:
                m, gba_chis = sm.global_ba_dist(m, self.K, self.mesh,
                                                iters=cfg.gba_iters)
                gba_chi2 = gba_chis[-1]
            else:
                m, gba_stats = sm.global_ba(m, self.K, iters=cfg.gba_iters)
                gba_chi2 = gba_stats.chi2[-1]
        slam.map = m
        # propagate the correction to the tracker by COMPOSING the delta:
        # the current frame may be several frames past keyframe j (async
        # polling lags the camera by the poll interval), so a hard rebase to
        # j's pose would discard that motion. Preserve the camera-relative
        # pose to j: C_new = C_old ∘ T_j_old⁻¹ ∘ T_j_new (equals the old
        # hard rebase exactly when the current frame IS keyframe j, the
        # sync-path case where C_old == T_j_old).
        T_j_new = lie.SE3(m.kf_T_cw.R[j], m.kf_T_cw.t[j])
        T_cur = lie.compose(
            lie.compose(slam.state.T_cw, lie.inverse(T_j_old)), T_j_new)
        slam.state = slam.state._replace(T_cw=T_cur, T_cw_last_kf=T_cur)
        # pgo_chi2/gba_chi2 stay DEVICE scalars (read them with float() when
        # inspecting): a readback here would stall the camera loop on the
        # whole PGO+GBA chain (r04's 27.9 fps loop bench was this sync)
        return {
            "loop_from": j,
            "loop_to": i,
            "score": score,
            "inliers": n_inl_h,
            "pgo_chi2": chis[-1],
            "gba_chi2": gba_chi2,
            "scale_correction": scale_est,
            "merged_maps": merged,
        }
