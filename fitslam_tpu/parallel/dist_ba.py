"""Distributed bundle adjustment: observation-sharded Schur complement.

The marquee distributed component (SURVEY.md §2.5 last row; BASELINE.json
north star): the BA observation set is sharded over the mesh's data axis,
each device linearizes its shard and reduces partial block Hessians
(per-keyframe 6x6, per-landmark 3x3, camera-landmark coupling) with `psum`
over ICI; the small reduced (6K, 6K) solve is replicated. Expressed with
`shard_map` so the collective placement is explicit and inspectable.

Poses and landmarks are replicated (they are small relative to observations);
this is the BA analog of data parallelism with gradient all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fitslam_tpu.ops import ba as ba_mod
from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics


def _local_blocks(K: Intrinsics, T_cw: lie.SE3, points, fixed_lm, obs: ba_mod.Observations,
                  axis: str):
    """Linearize the local observation shard and psum block reductions."""
    K_n = T_cw.t.shape[0]
    L_n = points.shape[0]
    prob = ba_mod.BAProblem(
        T_cw=T_cw, points=points, obs=obs,
        fixed_kf=jnp.zeros((K_n,), bool), fixed_lm=fixed_lm,
    )
    res, J_pose, J_point, w, ok, chi2 = ba_mod.linearize(K, prob)
    w = jnp.where(ok, w, 0.0)

    Jp_w = J_pose * w[:, None, None]
    Jl_w = J_point * w[:, None, None]
    # scatter operands flattened to (O, flat): multi-dim trailing shapes hit
    # a 6x slower scatter lowering on this TPU backend (see ops/ba.py)
    O_n = obs.kf.shape[0]
    Hpp = jax.ops.segment_sum(
        jnp.einsum("oij,oik->ojk", Jp_w, J_pose).reshape(O_n, 36),
        obs.kf, num_segments=K_n).reshape(K_n, 6, 6)
    Hll = jax.ops.segment_sum(
        jnp.einsum("oij,oik->ojk", Jl_w, J_point).reshape(O_n, 9),
        obs.lm, num_segments=L_n).reshape(L_n, 3, 3)
    bp = -jax.ops.segment_sum(jnp.einsum("oij,oi->oj", Jp_w, res), obs.kf, num_segments=K_n)
    bl = -jax.ops.segment_sum(jnp.einsum("oij,oi->oj", Jl_w, res), obs.lm, num_segments=L_n)
    Hpl_o = jnp.einsum("oij,oik->ojk", Jp_w, J_point)
    flat_idx = obs.kf * L_n + obs.lm
    Y = jax.ops.segment_sum(Hpl_o.reshape(O_n, 18), flat_idx,
                            num_segments=K_n * L_n).reshape(K_n, L_n, 6, 3)

    chi2_tot = jnp.sum(jnp.where(ok, jnp.minimum(chi2, 7.815 * 4), 0.0))
    out = (Hpp, Hll, bp, bl, Y, chi2_tot)
    return jax.tree.map(lambda x: jax.lax.psum(x, axis), out)


def _reduced_step(prob_global, blocks, damping):
    """Identical replicated solve given globally-reduced blocks (mirrors
    ops.ba._schur_solve, operating on precomputed reductions)."""
    Hpp, Hll, bp, bl, Y, _ = blocks
    K_n = prob_global.T_cw.t.shape[0]

    eye3 = jnp.eye(3, dtype=Hll.dtype)
    diag_l = jnp.einsum("lii->l", Hll)[:, None, None] / 3.0
    Hll_d = Hll + (0.05 * diag_l + damping + 1e-6) * eye3
    empty_lm = jnp.abs(Hll).sum(axis=(-2, -1)) < 1e-10
    Hll_d = jnp.where(empty_lm[:, None, None], eye3, Hll_d)
    Hll_inv = ba_mod.inv3x3(Hll_d)
    Hll_inv = jnp.where(empty_lm[:, None, None], jnp.zeros_like(eye3), Hll_inv)
    lm_free = jnp.logical_not(prob_global.fixed_lm)
    Hll_inv = Hll_inv * lm_free[:, None, None]

    YHinv = jnp.einsum("klij,ljm->klim", Y, Hll_inv)
    S = -jnp.einsum("alim,bljm->abij", YHinv, Y)
    S = S.at[jnp.arange(K_n), jnp.arange(K_n)].add(Hpp)
    b_schur = bp - jnp.einsum("klim,lm->ki", YHinv, bl)

    free = jnp.logical_not(prob_global.fixed_kf).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, :, None, None]
    S = S.at[jnp.arange(K_n), jnp.arange(K_n)].add(
        jnp.eye(6) * jnp.where(prob_global.fixed_kf, 1.0, 0.0)[:, None, None]
    )
    b_schur = b_schur * free[:, None]
    S = S.at[jnp.arange(K_n), jnp.arange(K_n)].add(jnp.eye(6) * damping)

    S_mat = S.transpose(0, 2, 1, 3).reshape(K_n * 6, K_n * 6)
    dp = jnp.linalg.solve(S_mat, b_schur.reshape(K_n * 6)).reshape(K_n, 6)

    Yt_dp = jnp.einsum("klim,ki->lm", Y, dp)
    dl = jnp.einsum("lij,lj->li", Hll_inv, bl - Yt_dp)
    dl = dl * lm_free[:, None]
    dp = dp * jnp.logical_not(prob_global.fixed_kf)[:, None]

    dp_n = jnp.linalg.norm(dp, axis=-1, keepdims=True)
    dp = dp * jnp.minimum(1.0, 0.5 / jnp.maximum(dp_n, 1e-12))
    dl_n = jnp.linalg.norm(dl, axis=-1, keepdims=True)
    dl = dl * jnp.minimum(1.0, 1.0 / jnp.maximum(dl_n, 1e-12))
    return dp, dl


def distributed_bundle_adjust(
    mesh: Mesh,
    K: Intrinsics,
    prob: ba_mod.BAProblem,
    iters: int = 6,
    damping: float = 1e-3,
    axis: str = "data",
) -> Tuple[ba_mod.BAProblem, jax.Array]:
    """Observation-sharded BA. Observation arrays must be divisible by the
    mesh axis size (pad with invalid slots). Returns (problem, chi2 history).
    """
    n_dev = mesh.shape[axis]
    O = prob.obs.valid.shape[0]
    assert O % n_dev == 0, f"obs capacity {O} not divisible by mesh axis {n_dev}"

    obs_spec = ba_mod.Observations(
        kf=P(axis), lm=P(axis), uvr=P(axis), sigma2=P(axis), valid=P(axis)
    )
    rep = jax.tree.map(lambda _: P(), (prob.T_cw, prob.points, prob.fixed_kf, prob.fixed_lm))

    out_rep = jax.tree.map(lambda _: P(), (prob.T_cw, prob.points))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rep, obs_spec),
        out_specs=(out_rep, P()),
        check_vma=False,
    )
    def run(rep_args, obs_shard):
        T_cw0, points0, fixed_kf, fixed_lm = rep_args

        def body(carry, _):
            T_cw, points, chi_prev = carry
            blocks = _local_blocks(K, T_cw, points, fixed_lm, obs_shard, axis)
            g_prob = ba_mod.BAProblem(T_cw, points, obs_shard, fixed_kf, fixed_lm)
            dp, dl = _reduced_step(g_prob, blocks, damping)
            T_new = lie.compose(lie.se3_exp(dp), T_cw)
            pts_new = points + dl
            # candidate chi2: residual-only pass, psum of ONE scalar — not a
            # second full linearize+block-assembly (r04 ran two full passes
            # per GN iteration, VERDICT weak #4a)
            c_new = jax.lax.psum(
                ba_mod.chi2_residuals(K, T_new, pts_new, obs_shard), axis)
            c_old = blocks[-1]
            accept = jnp.isfinite(c_new) & (c_new < c_old)
            T_out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), T_new, T_cw)
            p_out = jnp.where(accept, pts_new, points)
            return (T_out, p_out, jnp.where(accept, c_new, c_old)), c_old

        (T_fin, pts_fin, _), chis = jax.lax.scan(
            body, (T_cw0, points0, jnp.float32(jnp.inf)), None, length=iters
        )
        return (T_fin, pts_fin), chis

    (T_fin, pts_fin), chis = run(
        (prob.T_cw, prob.points, prob.fixed_kf, prob.fixed_lm), prob.obs
    )
    return prob._replace(T_cw=T_fin, points=pts_fin), chis


# ---------------------------------------------------------------------------
# Landmark-block-sharded BA (map-block sharding, BASELINE.json north star)
# ---------------------------------------------------------------------------


def shard_problem_by_landmark(prob: ba_mod.BAProblem, n_dev: int) -> ba_mod.BAProblem:
    """Host-side repack: route every observation to the shard that owns its
    landmark (shard d owns landmarks [d*L/n, (d+1)*L/n)), padding each shard
    to a common size so the observation table stays fixed-shape. Padding rows
    point at the shard's first landmark with valid=False (exact no-ops).

    The landmark capacity must be divisible by n_dev."""
    import numpy as np

    L = prob.points.shape[0]
    assert L % n_dev == 0, f"landmark capacity {L} not divisible by {n_dev}"
    Lb = L // n_dev
    kf = np.asarray(prob.obs.kf)
    lm = np.asarray(prob.obs.lm)
    uvr = np.asarray(prob.obs.uvr)
    s2 = np.asarray(prob.obs.sigma2)
    ok = np.asarray(prob.obs.valid)

    shard_of = lm // Lb
    counts = np.bincount(shard_of[ok], minlength=n_dev)
    cap = int(max(1, counts.max()))
    cap = -(-cap // 8) * 8  # round up so shapes stay friendly

    O_new = n_dev * cap
    kf_n = np.zeros((n_dev, cap), np.int32)
    lm_n = np.tile((np.arange(n_dev) * Lb)[:, None], (1, cap)).astype(np.int32)
    uvr_n = np.zeros((n_dev, cap, 3), np.float32)
    s2_n = np.ones((n_dev, cap), np.float32)
    ok_n = np.zeros((n_dev, cap), bool)
    for d in range(n_dev):
        sel = np.nonzero(ok & (shard_of == d))[0]
        k = len(sel)
        kf_n[d, :k] = kf[sel]
        lm_n[d, :k] = lm[sel]
        uvr_n[d, :k] = uvr[sel]
        s2_n[d, :k] = s2[sel]
        ok_n[d, :k] = True
    obs = ba_mod.Observations(
        kf=jnp.asarray(kf_n.reshape(O_new)),
        lm=jnp.asarray(lm_n.reshape(O_new)),
        uvr=jnp.asarray(uvr_n.reshape(O_new, 3)),
        sigma2=jnp.asarray(s2_n.reshape(O_new)),
        valid=jnp.asarray(ok_n.reshape(O_new)),
    )
    return prob._replace(obs=obs)


def landmark_sharded_bundle_adjust(
    mesh: Mesh,
    K: Intrinsics,
    prob: ba_mod.BAProblem,
    iters: int = 6,
    damping: float = 1e-3,
    axis: str = "data",
) -> Tuple[ba_mod.BAProblem, jax.Array]:
    """Map-block-sharded BA: landmarks (and their observations, Hll blocks,
    bl, and the dense camera-landmark coupling tensor Y) are SHARDED over the
    mesh; only the (K, 6) / (K, K, 6, 6) pose-side reductions cross devices
    (one psum each per iteration). Per-device memory for Y is 1/n_dev of the
    observation-sharded variant's replicated (K, L, 6, 3) tensor — this is
    what makes global BA at map capacity fit a pod slice ("keyframes and map
    blocks sharded", BASELINE.json north star).

    The observation table must be pre-routed with shard_problem_by_landmark
    (every obs on the shard owning its landmark, shards equally sized).

    Returns (problem, chi2 history)."""
    n_dev = mesh.shape[axis]
    L = prob.points.shape[0]
    O = prob.obs.valid.shape[0]
    assert L % n_dev == 0, f"landmark capacity {L} not divisible by {n_dev}"
    assert O % n_dev == 0, f"obs capacity {O} not divisible by {n_dev}"
    Lb = L // n_dev

    obs_spec = ba_mod.Observations(
        kf=P(axis), lm=P(axis), uvr=P(axis), sigma2=P(axis), valid=P(axis)
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=((P(), P(axis), P(), P(axis)), obs_spec),
        out_specs=((P(), P(axis)), P()),
        check_vma=False,
    )
    def run(rep_args, obs_shard):
        T_cw0, points_blk, fixed_kf, fixed_lm_blk = rep_args
        d = jax.lax.axis_index(axis)
        # localize landmark indices into this shard's block
        lm_local = obs_shard.lm - d * Lb
        obs_local = obs_shard._replace(lm=jnp.clip(lm_local, 0, Lb - 1))
        K_n = T_cw0.t.shape[0]

        def blocks_of(T_cw, points):
            prob_l = ba_mod.BAProblem(
                T_cw=T_cw, points=points, obs=obs_local,
                fixed_kf=fixed_kf, fixed_lm=fixed_lm_blk,
            )
            res, J_pose, J_point, w, ok, chi2 = ba_mod.linearize(K, prob_l)
            w = jnp.where(ok, w, 0.0)
            Jp_w = J_pose * w[:, None, None]
            Jl_w = J_point * w[:, None, None]
            O_n = obs_local.kf.shape[0]
            # scatter operands flattened to (O, flat) — see ops/ba.py note
            # pose-side reductions cross landmark shards -> psum
            Hpp = jax.lax.psum(
                jax.ops.segment_sum(
                    jnp.einsum("oij,oik->ojk", Jp_w, J_pose).reshape(O_n, 36),
                    obs_local.kf, num_segments=K_n), axis).reshape(K_n, 6, 6)
            bp = -jax.lax.psum(
                jax.ops.segment_sum(jnp.einsum("oij,oi->oj", Jp_w, res),
                                    obs_local.kf, num_segments=K_n), axis)
            # landmark-side blocks stay local: every obs of a landmark lives
            # on its owner shard, so no cross-device reduction is needed
            Hll = jax.ops.segment_sum(
                jnp.einsum("oij,oik->ojk", Jl_w, J_point).reshape(O_n, 9),
                obs_local.lm, num_segments=Lb).reshape(Lb, 3, 3)
            bl = -jax.ops.segment_sum(
                jnp.einsum("oij,oi->oj", Jl_w, res), obs_local.lm,
                num_segments=Lb)
            flat = obs_local.kf * Lb + obs_local.lm
            Y = jax.ops.segment_sum(
                jnp.einsum("oij,oik->ojk", Jp_w, J_point).reshape(O_n, 18),
                flat, num_segments=K_n * Lb).reshape(K_n, Lb, 6, 3)
            chi_tot = jax.lax.psum(
                jnp.sum(jnp.where(ok, jnp.minimum(chi2, 7.815 * 4), 0.0)), axis)
            return Hpp, Hll, bp, bl, Y, chi_tot

        def step(T_cw, points, blocks):
            Hpp, Hll, bp, bl, Y, _ = blocks
            eye3 = jnp.eye(3, dtype=Hll.dtype)
            diag_l = jnp.einsum("lii->l", Hll)[:, None, None] / 3.0
            Hll_d = Hll + (0.05 * diag_l + damping + 1e-6) * eye3
            empty_lm = jnp.abs(Hll).sum(axis=(-2, -1)) < 1e-10
            Hll_d = jnp.where(empty_lm[:, None, None], eye3, Hll_d)
            Hll_inv = ba_mod.inv3x3(Hll_d)
            Hll_inv = jnp.where(empty_lm[:, None, None], jnp.zeros_like(eye3), Hll_inv)
            lm_free = jnp.logical_not(fixed_lm_blk)
            Hll_inv = Hll_inv * lm_free[:, None, None]

            YHinv = jnp.einsum("klij,ljm->klim", Y, Hll_inv)   # (K, Lb, 6, 3)
            # Schur complement: partial over the local landmark block, then
            # ONE psum of the (K, K, 6, 6) reduction over the mesh
            S = -jax.lax.psum(jnp.einsum("alim,bljm->abij", YHinv, Y), axis)
            S = S.at[jnp.arange(K_n), jnp.arange(K_n)].add(Hpp)
            b_schur = bp - jax.lax.psum(
                jnp.einsum("klim,lm->ki", YHinv, bl), axis)

            free = jnp.logical_not(fixed_kf).astype(S.dtype)
            S = S * free[:, None, None, None] * free[None, :, None, None]
            S = S.at[jnp.arange(K_n), jnp.arange(K_n)].add(
                jnp.eye(6) * jnp.where(fixed_kf, 1.0, 0.0)[:, None, None]
            )
            b_schur = b_schur * free[:, None]
            S = S.at[jnp.arange(K_n), jnp.arange(K_n)].add(jnp.eye(6) * damping)
            S_mat = S.transpose(0, 2, 1, 3).reshape(K_n * 6, K_n * 6)
            dp = jnp.linalg.solve(S_mat, b_schur.reshape(K_n * 6)).reshape(K_n, 6)

            Yt_dp = jnp.einsum("klim,ki->lm", Y, dp)           # local block
            dl = jnp.einsum("lij,lj->li", Hll_inv, bl - Yt_dp)
            dl = dl * lm_free[:, None]
            dp = dp * jnp.logical_not(fixed_kf)[:, None]
            dp_n = jnp.linalg.norm(dp, axis=-1, keepdims=True)
            dp = dp * jnp.minimum(1.0, 0.5 / jnp.maximum(dp_n, 1e-12))
            dl_n = jnp.linalg.norm(dl, axis=-1, keepdims=True)
            dl = dl * jnp.minimum(1.0, 1.0 / jnp.maximum(dl_n, 1e-12))
            return dp, dl

        def body(carry, _):
            T_cw, points, chi_prev = carry
            blocks = blocks_of(T_cw, points)
            dp, dl = step(T_cw, points, blocks)
            T_new = lie.compose(lie.se3_exp(dp), T_cw)
            pts_new = points + dl
            # residual-only candidate chi2 (one psum'd scalar; every obs of
            # a landmark lives on its owner shard, so the local sum is exact
            # before the reduction) instead of a second full blocks pass
            c_new = jax.lax.psum(
                ba_mod.chi2_residuals(K, T_new, pts_new, obs_local), axis)
            c_old = blocks[-1]
            accept = jnp.isfinite(c_new) & (c_new < c_old)
            T_out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), T_new, T_cw)
            p_out = jnp.where(accept, pts_new, points)
            return (T_out, p_out, jnp.where(accept, c_new, c_old)), c_old

        (T_fin, pts_fin, _), chis = jax.lax.scan(
            body, (T_cw0, points_blk, jnp.float32(jnp.inf)), None, length=iters
        )
        return (T_fin, pts_fin), chis

    (T_fin, pts_fin), chis = run(
        (prob.T_cw, prob.points, prob.fixed_kf, prob.fixed_lm), prob.obs
    )
    return prob._replace(T_cw=T_fin, points=pts_fin), chis
