"""The stereo/RGB-D SLAM engine: host orchestration of the jitted stages.

This is the API layer replacing orb_slam3_ros2_wrapper (SURVEY.md §2.1 S2):
it owns the map + tracking state, runs the per-frame pipeline, exposes the
`get_landmarks_in_view` / `get_map_data` service surface as methods, and
publishes keyframe events to downstream consumers (traversability fusion,
roadmap) via plain callbacks. All numerics stay on device; only scalar
decisions (keyframe? lost?) sync to host — the jit analog of the reference's
tracking / local-mapping thread split.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics
from fitslam_tpu.ops.place import signature_from_descriptors
from fitslam_tpu.models import slam_map as sm
from fitslam_tpu.models import tracking as tr
from fitslam_tpu.utils.config import FitSlamConfig
from fitslam_tpu.utils.profiling import EventLogger, MODULE


class StereoSlam:
    """Stereo SLAM system with fixed-capacity device state."""

    def __init__(self, cfg: FitSlamConfig, event_logger: Optional[EventLogger] = None):
        self.cfg = cfg
        self.K = Intrinsics.from_config(cfg.camera)
        mp = cfg.mapping
        self.map = sm.empty_map(
            mp.max_keyframes, mp.max_landmarks, mp.max_observations,
            signature_dim=cfg.loop.vocab_dim,
        )
        self.state = tr.init_track_state()
        self.frame_id = 0
        self.trajectory: List[np.ndarray] = []   # T_wc 4x4 per frame
        # (ref_kf_idx, T_wc_of_ref_kf_at_the_time 4x4) per frame — the
        # anchors corrected_trajectory() re-composes through
        self._traj_ref: List = []
        self.keyframe_events: List[Callable] = []
        self.log = event_logger or EventLogger(time_tier=MODULE)
        self._initialized = False
        self.last_frame: Optional[tr.StereoFrame] = None
        self.outs_log: List = []   # device-side per-frame outputs (async mode)
        self._frame_ring: Dict[int, tr.StereoFrame] = {}  # frames since last poll
        self._polled_until = 0
        self._outs_base = 0   # frame id corresponding to outs_log[0]
        self._outs_fids: List[int] = []  # frame id per outs_log entry
        # pipelined poll (poll_keyframe_events(flush=False)): the last
        # window's flag vector, copying to host while the camera loop runs
        self._poll_pending = None
        # frame id of the keyframe currently being delivered to
        # keyframe_events callbacks (lets consumers look up per-frame
        # side data — e.g. the frame's point cloud — by frame id)
        self.last_keyframe_frame_id = -1
        self.loop_closer = None
        self.loop_events: List[Dict] = []
        if cfg.loop.enabled:
            from fitslam_tpu.models.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(cfg, self.K)

    # ------------------------------------------------------------------
    # Frame pipeline
    # ------------------------------------------------------------------

    def process_frame(self, img_left, img_right) -> Dict:
        """Track one stereo frame: the image frontend runs as its own
        executable, then the fused backend step (models/slam_step.py) keeps
        the map state inside one executable across frames."""
        cfg = self.cfg
        with self.log.scope("frontend", MODULE):
            frame = tr.process_stereo(
                self.K, img_left, img_right,
                num_features=cfg.orb.num_features,
                num_levels=cfg.orb.num_levels,
                scale_factor=cfg.orb.scale_factor,
                fast_threshold=cfg.orb.fast_threshold,
            )
        return self.process_prepared(frame)

    def process_rgbd_frame(self, img, depth_img) -> Dict:
        """Track one RGB-D frame (reference rgbd mode, SURVEY.md §2.1 S2):
        same backend as stereo, depth read from the registered depth image."""
        cfg = self.cfg
        with self.log.scope("frontend", MODULE):
            frame = tr.process_rgbd(
                self.K, img, depth_img,
                num_features=cfg.orb.num_features,
                num_levels=cfg.orb.num_levels,
                scale_factor=cfg.orb.scale_factor,
                fast_threshold=cfg.orb.fast_threshold,
                max_depth=cfg.camera.depth_max,
            )
        return self.process_prepared(frame)

    def process_frame_async(self, img_left, img_right):
        """Zero-readback frame step: no device->host transfer happens, so
        host dispatch pipelines ahead of device compute instead of
        serializing on per-frame scalars. Per-frame outputs stay on device
        in `self.outs_log`; call `finalize()` after the run to materialize
        trajectory/stats. Timing this path requires a TRUE barrier
        (utils.profiling.device_sync) — block_until_ready returns at
        dispatch-accept on this backend (BENCH_NOTES.md). Loop closing /
        keyframe events run through `poll_keyframe_events()` — one batched
        readback every N frames, the async analog of ORB-SLAM3's loop
        thread — not per frame."""
        cfg = self.cfg
        frame = tr.process_stereo(
            self.K, img_left, img_right,
            num_features=cfg.orb.num_features,
            num_levels=cfg.orb.num_levels,
            scale_factor=cfg.orb.scale_factor,
            fast_threshold=cfg.orb.fast_threshold,
        )
        return self.process_prepared_async(frame)

    def process_rgbd_frame_async(self, img, depth_img):
        """RGB-D variant of the zero-readback step."""
        cfg = self.cfg
        frame = tr.process_rgbd(
            self.K, img, depth_img,
            num_features=cfg.orb.num_features,
            num_levels=cfg.orb.num_levels,
            scale_factor=cfg.orb.scale_factor,
            fast_threshold=cfg.orb.fast_threshold,
            max_depth=cfg.camera.depth_max,
        )
        return self.process_prepared_async(frame)

    def process_prepared_async(self, frame: tr.StereoFrame):
        from fitslam_tpu.models.slam_step import slam_backend_step

        cfg = self.cfg
        self.map, self.state, outs = slam_backend_step(
            self.K, self.map, self.state, frame, jnp.int32(self.frame_id),
            search_radius=cfg.tracking.search_radius_px,
            match_max_hamming=cfg.tracking.match_max_hamming,
            min_inliers=cfg.tracking.min_inliers,
            width=cfg.camera.width, height=cfg.camera.height,
            pose_iters=cfg.tracking.pose_gn_iters,
            kf_min_interval=cfg.tracking.keyframe_min_interval,
            kf_translation=cfg.tracking.keyframe_translation,
            kf_rotation=cfg.tracking.keyframe_rotation,
            kf_min_tracked_ratio=cfg.tracking.keyframe_min_tracked_ratio,
            scale_factor=cfg.orb.scale_factor,
            ba_window=cfg.mapping.local_window,
            ba_max_obs=min(8192, cfg.mapping.max_observations),
            ba_iters=cfg.mapping.ba_iters,
            cull_min_obs=cfg.mapping.cull_min_observations,
            wide_radius=cfg.tracking.wide_radius_px,
            reinit_after_lost=cfg.tracking.reinit_after_lost,
            match_ratio=cfg.tracking.match_ratio,
            ba_covis=cfg.mapping.covisibility_window,
            recycle_at_fraction=cfg.mapping.recycle_at_fraction,
            recycle_target_fraction=cfg.mapping.recycle_target_fraction,
            loop_min_gap=(cfg.loop.min_gap_keyframes if cfg.loop.enabled
                          else 0),
            # stereo: ORB-SLAM3 ThDepth close-point spawn policy; RGB-D
            # depth is sensor-direct (no z^2/bf error growth) -> full range
            max_spawn_depth=(cfg.camera.depth_max if cfg.camera.rgbd else
                             cfg.mapping.close_depth_factor
                             * cfg.camera.baseline),
        )
        if not self.outs_log:
            self._outs_base = self.frame_id   # frame id of outs_log[0]
        self.outs_log.append(outs)
        # frame id recorded PER ENTRY: interleaving sync process_frame calls
        # (which advance frame_id without touching outs_log) must not shift
        # the poll-time mapping from outs_log index to frame id
        self._outs_fids.append(self.frame_id)
        if self.loop_closer is not None or self.keyframe_events:
            self._frame_ring[self.frame_id] = frame
        self._initialized = True
        self.frame_id += 1
        return outs

    def poll_keyframe_events(self, flush: bool = True):
        """Batched keyframe-event poll for the async path: ONE packed
        device->host readback of (was_keyframe, kf_idx) for every frame
        since the last poll, then keyframe callbacks + loop closing fire
        for each new keyframe (against its retained frame). This is the
        async analog of ORB-SLAM3's local-mapping/loop-closing threads
        draining the keyframe queue: detection lags the camera by up to
        the poll interval, and a correction applies from the next
        dispatched frame onward. Returns the list of events seen.

        flush=False is the PIPELINED mode for hot camera loops: the new
        window's flag vector starts an async device->host copy NOW and is
        processed at the NEXT poll, so the camera loop never blocks on a
        readback. A blocking poll costs far more than the readback itself
        on this backend: it drains the whole dispatch pipeline and the
        refill pays per-kernel tunnel latency — measured 52 polls x ~48 ms
        of bubble = 2.5 s on the 4.9 s ring bench (diag_loop_perf). Event
        delivery lags by one extra poll interval (same contract as a 2x
        poll period); pass flush=True (default) to drain everything now."""
        events = []
        pending = self._poll_pending
        self._poll_pending = None
        # launch the newest window's readback FIRST so it copies while the
        # previous window's events are processed
        start = self._polled_until
        window = self.outs_log[start:]
        new_pending = None
        if window:
            stacked = jnp.stack(
                [jnp.stack([o.was_keyframe.astype(jnp.float32),
                            o.kf_idx.astype(jnp.float32),
                            o.loop_cand.astype(jnp.float32),
                            o.loop_score])
                 for o in window])
            try:
                stacked.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass  # backend without async copy: np.asarray below blocks
            new_pending = (start, len(window), stacked)
            self._polled_until = start + len(window)
        if pending is not None:
            events += self._process_poll_window(*pending)
        if flush:
            if new_pending is not None:
                events += self._process_poll_window(*new_pending)
        else:
            self._poll_pending = new_pending
        return events

    def _process_poll_window(self, start, count, stacked):
        """Fire callbacks/loop closing for one polled flag window."""
        flags = np.asarray(stacked)
        events = []
        for k in range(count):
            fid = self._outs_fids[start + k]
            if flags[k, 0] < 1:
                self._frame_ring.pop(fid, None)
                continue
            kf_idx = int(flags[k, 1])
            frame = self._frame_ring.pop(fid, None)
            if frame is not None:
                self.last_frame = frame
            self.last_keyframe_frame_id = fid
            for cb in self.keyframe_events:
                cb(self, kf_idx)
            loop_info = None
            if self.loop_closer is not None:
                with self.log.scope("loop_closing", MODULE):
                    loop_info = self.loop_closer.on_keyframe(
                        self, kf_idx,
                        cand_idx=int(flags[k, 2]), score=float(flags[k, 3]))
                if loop_info:
                    self.loop_events.append(loop_info)
            events.append({"frame_id": fid, "kf_idx": kf_idx,
                           "loop": loop_info})
        return events

    def finalize(self):
        """Materialize per-frame outputs accumulated by process_frame_async
        in ONE batched device->host readback (a per-leaf pull costs a full
        tunnel RTT each, BENCH_NOTES.md)."""
        import numpy as _np

        if self._poll_pending is not None:
            # deliver pipelined events before the outs log resets (their
            # window indexes into _outs_fids)
            self._process_poll_window(*self._poll_pending)
            self._poll_pending = None
        if not self.outs_log:
            return {"n_inliers": [], "keyframes": []}
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *self.outs_log)
        flat = _np.asarray(jnp.concatenate([
            stacked.pose_wc.reshape(len(self.outs_log), 16),
            stacked.n_inliers[:, None].astype(jnp.float32),
            stacked.was_keyframe[:, None].astype(jnp.float32),
            stacked.kf_idx[:, None].astype(jnp.float32),
            stacked.ref_kf[:, None].astype(jnp.float32),
            stacked.ref_T_cw_R.reshape(len(self.outs_log), 9),
            stacked.ref_T_cw_t,
        ], axis=1))
        for row in flat:
            self.trajectory.append(row[:16].reshape(4, 4).astype(_np.float64))
            self._traj_ref.append((
                int(row[19]),
                lie.SE3(row[20:29].reshape(3, 3), row[29:32]),
            ))
        stats = {
            "n_inliers": [int(v) for v in flat[:, 16]],
            "keyframes": [int(row[18]) for row in flat if row[17] > 0.5],
        }
        # materialize any device scalars deferred by the loop closer (chi2
        # histories are kept on device during the run so corrections never
        # stall the camera loop)
        for ev in self.loop_events:
            for k, v in ev.items():
                if isinstance(v, jax.Array):
                    ev[k] = float(v)
        self.outs_log = []
        self._outs_fids = []
        self._polled_until = 0
        return stats

    def process_prepared(self, frame: tr.StereoFrame) -> Dict:
        """Backend step on an already-extracted frame."""
        from fitslam_tpu.models.slam_step import slam_backend_step

        cfg = self.cfg
        with self.log.scope("backend_step", MODULE):
            self.map, self.state, outs = slam_backend_step(
                self.K, self.map, self.state, frame, jnp.int32(self.frame_id),
                search_radius=cfg.tracking.search_radius_px,
                match_max_hamming=cfg.tracking.match_max_hamming,
                min_inliers=cfg.tracking.min_inliers,
                width=cfg.camera.width, height=cfg.camera.height,
                pose_iters=cfg.tracking.pose_gn_iters,
                kf_min_interval=cfg.tracking.keyframe_min_interval,
                kf_translation=cfg.tracking.keyframe_translation,
                kf_rotation=cfg.tracking.keyframe_rotation,
                kf_min_tracked_ratio=cfg.tracking.keyframe_min_tracked_ratio,
                scale_factor=cfg.orb.scale_factor,
                ba_window=cfg.mapping.local_window,
                ba_max_obs=min(8192, cfg.mapping.max_observations),
                ba_iters=cfg.mapping.ba_iters,
                cull_min_obs=cfg.mapping.cull_min_observations,
                wide_radius=cfg.tracking.wide_radius_px,
                reinit_after_lost=cfg.tracking.reinit_after_lost,
                match_ratio=cfg.tracking.match_ratio,
                ba_covis=cfg.mapping.covisibility_window,
                recycle_at_fraction=cfg.mapping.recycle_at_fraction,
                recycle_target_fraction=cfg.mapping.recycle_target_fraction,
                loop_min_gap=(cfg.loop.min_gap_keyframes if cfg.loop.enabled
                              else 0),
                max_spawn_depth=(cfg.camera.depth_max if cfg.camera.rgbd
                                 else cfg.mapping.close_depth_factor
                                 * cfg.camera.baseline),
            )
            # ONE packed pull for the frame's control-flow scalars AND the
            # pose matrix (each device->host pull costs a full tunnel RTT,
            # BENCH_NOTES.md)
            _v = np.asarray(jnp.concatenate([
                jnp.stack([
                    outs.n_inliers.astype(jnp.float32),
                    outs.was_keyframe.astype(jnp.float32),
                    outs.kf_idx.astype(jnp.float32),
                    self.state.lost_frames.astype(jnp.float32),
                    outs.loop_cand.astype(jnp.float32),
                    outs.loop_score,
                ]),
                outs.pose_wc.reshape(-1),
            ]))
            n_inl = int(_v[0])
            was_kf = bool(_v[1] > 0.5)
            kf_idx_h = int(_v[2])
            lost_frames_h = int(_v[3])
            loop_cand_h, loop_score_h = int(_v[4]), float(_v[5])
            pose_wc_np = _v[6:22].reshape(4, 4).astype(np.float64)
        # (landmark slot recycling happens ON DEVICE inside the backend step
        # now - see slam_step: the async path never ran the old host-side
        # version, starving tracking once the landmark array filled)

        info: Dict = {
            "frame_id": self.frame_id,
            "keyframe": was_kf,
            "n_inliers": n_inl,
            "lost": self._initialized and n_inl < cfg.tracking.min_inliers,
            "pose_wc": pose_wc_np,
        }
        self.last_frame = frame
        if (
            info["lost"]
            and cfg.tracking.reloc_enabled
            and lost_frames_h >= cfg.tracking.reloc_after_lost
        ):
            if self._try_relocalize(frame):
                info["relocalized"] = True
        if was_kf:
            self._initialized = True
            kf_idx = kf_idx_h
            self.last_keyframe_frame_id = self.frame_id
            for cb in self.keyframe_events:
                cb(self, kf_idx)
            if self.loop_closer is not None:
                with self.log.scope("loop_closing", MODULE):
                    loop_info = self.loop_closer.on_keyframe(
                        self, kf_idx, cand_idx=loop_cand_h,
                        score=loop_score_h)
                if loop_info:
                    info["loop"] = loop_info
                    self.loop_events.append(loop_info)
        self.trajectory.append(pose_wc_np)
        # reference-keyframe anchor for retroactive trajectory correction
        # (ORB-SLAM3 rewrites past poses through their reference KF after
        # loop closure / GBA; corrected_trajectory() does the same here)
        ref_kf = max(int(self.map.n_kf) - 1, 0)
        # keep the anchor ON DEVICE: no per-frame D2H in the hot loop; the
        # tiny gather materializes lazily in corrected_trajectory()
        self._traj_ref.append((ref_kf, lie.SE3(
            self.map.kf_T_cw.R[ref_kf], self.map.kf_T_cw.t[ref_kf])))
        self.frame_id += 1
        return info

    def refine_map(self, cycles: int = 4, gba_iters: int = 15,
                   stereo_weight: float = 1.0):
        """Deferred full-map refinement: `cycles` rounds of landmark
        re-triangulation (ops/ba.retriangulate_points) + global BA.

        The ORB-SLAM3 analog is the full-BA pass its loop-closing thread
        runs in the background (and the offline final GBA standard in SLAM
        evaluation): heavy map polish that must NOT ride the camera loop.
        Here it exists because a drifted map is a genuine LOCAL minimum of
        the reprojection objective — poses and landmarks complicit — while
        the true-scale basin scores ~20% lower chi2 (pinned by the stereo
        absolute-depth rows; BENCH_NOTES r05). Each cycle re-derives
        landmarks from measurements under the current poses (breaking the
        complicity) and lets GBA descend; iterating walks the scale valley
        that a single GBA run crawls through (measured: kfATE 0.134 ->
        0.078 over 6 cycles vs 0.108 for one 30-iteration GBA).

        Call it at mission end (before evaluation), at idle time, or after
        the last expected loop closure. Uses the landmark-sharded
        distributed GBA when the loop closer has a >1-device mesh. The
        tracker is re-based by delta composition, so calling mid-mission
        is safe (same machinery as loop corrections). Returns the last
        cycle's GBA chi2 (device scalar)."""
        from fitslam_tpu.ops import ba
        from fitslam_tpu.ops import lie as _lie

        m = self.map
        j = max(int(m.n_kf) - 1, 0)
        T_j_old = _lie.SE3(m.kf_T_cw.R[j], m.kf_T_cw.t[j])
        mesh = getattr(self.loop_closer, "mesh", None)
        chi2 = None
        for _ in range(cycles):
            obs = ba.Observations(kf=m.obs_kf, lm=m.obs_lm, uvr=m.obs_uvr,
                                  sigma2=m.obs_sigma2, valid=m.obs_valid)
            m = m._replace(lm_pos=ba.retriangulate_points(
                self.K, m.kf_T_cw, m.lm_pos, obs, m.lm_valid,
                stereo_weight=stereo_weight))
            if mesh is not None and mesh.devices.size > 1:
                m, chis = sm.global_ba_dist(m, self.K, mesh, iters=gba_iters)
                chi2 = chis[-1]
            else:
                m, stats = sm.global_ba(m, self.K, iters=gba_iters)
                chi2 = stats.chi2[-1]
        self.map = m
        # propagate to the tracker exactly like a loop correction: preserve
        # the camera-relative pose to the last keyframe
        T_j_new = _lie.SE3(m.kf_T_cw.R[j], m.kf_T_cw.t[j])
        T_cur = _lie.compose(
            _lie.compose(self.state.T_cw, _lie.inverse(T_j_old)), T_j_new)
        self.state = self.state._replace(T_cw=T_cur, T_cw_last_kf=T_cur)
        return chi2

    def corrected_trajectory(self):
        """Trajectory with every frame re-anchored through its reference
        keyframe's CURRENT pose — past poses follow loop-closure/GBA
        corrections instead of keeping their at-the-time drift (the TUM-style
        full-trajectory rewrite ORB-SLAM3 performs before evaluation)."""
        if len(self._traj_ref) != len(self.trajectory):
            return list(self.trajectory)  # async path: no per-frame anchors
        kf_T_wc_now = np.asarray(lie.inverse(self.map.kf_T_cw).matrix())
        out = []
        for T_then, (k, T_cw_kf_then) in zip(self.trajectory, self._traj_ref):
            kf_T_cw_then = np.asarray(T_cw_kf_then.matrix())
            rel = kf_T_cw_then @ T_then          # frame pose in kf frame
            out.append(kf_T_wc_now[k] @ rel)
        return out

    # ------------------------------------------------------------------
    # Relocalization (ORB-SLAM3 place-recognition re-entry, S1)
    # ------------------------------------------------------------------

    def _try_relocalize(self, frame: tr.StereoFrame) -> bool:
        """Query keyframe place signatures with the lost frame, geometrically
        verify against the best candidate's landmarks, and re-lock the
        tracker there. Crossing into another Atlas map switches the active
        map id (the reference's map-reuse path)."""
        from fitslam_tpu.models.loop_closing import detect_loop, verify_loop

        cfg = self.cfg.tracking
        m = self.map
        sig = signature_from_descriptors(frame.feats.desc, frame.feats.valid)
        # no temporal gap: every valid keyframe is a relocalization target
        cand = detect_loop(m, sig, jnp.int32(m.kf_valid.shape[0] + 1),
                           min_gap=-m.kf_valid.shape[0])
        if float(cand.score) < cfg.reloc_min_score:
            return False
        T_loop, n_inl = verify_loop(self.K, m, frame, cand.kf_idx)
        if int(n_inl) < cfg.reloc_min_inliers:
            return False
        self.state = self.state._replace(
            T_cw=T_loop,
            T_cw_last_kf=T_loop,
            velocity=jnp.zeros((6,)),
            lost_frames=jnp.int32(0),
            map_id=m.kf_map_id[cand.kf_idx],
        )
        return True

    # ------------------------------------------------------------------
    # Service surface (reference: slam_msgs services, SURVEY.md §1 L2→up)
    # ------------------------------------------------------------------

    def get_landmarks_in_view(self, T_wc: lie.SE3, max_distance: float = 14.0):
        """`orb_slam3/get_landmarks_in_view` equivalent: camera-frame landmark
        positions + mask (FisherInfoManager.cpp:60-78 call contract)."""
        return sm.landmarks_in_view(
            self.map, self.K, T_wc, jnp.float32(max_distance),
            self.cfg.camera.width, self.cfg.camera.height,
        )

    def get_map_data(self):
        """`orb_slam3_get_map_data` equivalent: keyframe graph + landmarks."""
        n_kf = int(self.map.n_kf)
        return {
            "kf_poses_T_cw": jax.tree.map(lambda a: a[:n_kf], self.map.kf_T_cw),
            "kf_frame_ids": self.map.kf_frame_id[:n_kf],
            "landmarks": self.map.lm_pos,
            "landmarks_valid": self.map.lm_valid,
        }

    @property
    def current_pose_wc(self) -> lie.SE3:
        return lie.inverse(self.state.T_cw)
