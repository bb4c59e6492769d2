"""Pose-graph optimization as dense batched Gauss-Newton.

Replaces the reference's g2o pose-graph (ORB-SLAM3 loop closing: essential
graph optimization + global BA trigger, submodule; SURVEY.md §2.1 S1,
§3.4). Edges are a fixed-capacity masked table; per-edge 6x6 Jacobians come
from forward-mode autodiff of the boxplus-perturbed residual (vmapped — edges
are independent), and the (6K, 6K) Hessian is assembled by scatter-add and
solved densely. For the K <= a-few-hundred keyframes of this system the dense
solve is both simpler and faster on the MXU than any sparse structure.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit

from fitslam_tpu.ops import lie

# full-f32 contraction precision on the normal equations (see ops/lie.py)
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


class PoseGraphEdges(NamedTuple):
    i: jax.Array        # (E,) int32
    j: jax.Array        # (E,) int32
    T_ij: lie.SE3       # (E,) measured relative pose: maps frame j -> frame i
    weight: jax.Array   # (E,) float32 information scale
    valid: jax.Array    # (E,) bool


def edge_residual(T_cw_i: lie.SE3, T_cw_j: lie.SE3, T_ij: lie.SE3) -> jax.Array:
    """e = log(T_ij^-1 * T_cw_i * T_cw_j^-1)  (6,)."""
    rel = lie.compose(T_cw_i, lie.inverse(T_cw_j))
    return lie.se3_log(lie.compose(lie.inverse(T_ij), rel))


def _edge_res_jac(T_i: lie.SE3, T_j: lie.SE3, T_ij: lie.SE3):
    def f(xi, xj):
        Ti = lie.compose(lie.se3_exp(xi), T_i)
        Tj = lie.compose(lie.se3_exp(xj), T_j)
        return edge_residual(Ti, Tj, T_ij)

    z = jnp.zeros((6,))
    r = f(z, z)
    Ji, Jj = jax.jacfwd(f, argnums=(0, 1))(z, z)
    return r, Ji, Jj


@vjit(static_argnames=("iters",))
def optimize_pose_graph(
    T_cw: lie.SE3,            # (K,) poses
    kf_valid: jax.Array,      # (K,) bool
    edges: PoseGraphEdges,
    fixed: jax.Array,         # (K,) bool — gauge
    iters: int = 12,
    damping: float = 1e-4,
    huber_delta: float = 0.5,
) -> Tuple[lie.SE3, jax.Array]:
    """Gauss-Newton over the pose graph. Returns (poses, chi2 history)."""
    K_n = T_cw.t.shape[0]

    def linearize(T):
        Ti = lie.SE3(T.R[edges.i], T.t[edges.i])
        Tj = lie.SE3(T.R[edges.j], T.t[edges.j])
        r, Ji, Jj = jax.vmap(_edge_res_jac)(Ti, Tj, edges.T_ij)
        r2 = jnp.sum(r * r, axis=-1)
        w_rob = jnp.where(r2 > huber_delta**2, huber_delta / jnp.sqrt(jnp.maximum(r2, 1e-12)), 1.0)
        w = edges.weight * w_rob * edges.valid.astype(jnp.float32)
        return r, Ji, Jj, w, r2

    def chi2_of(T):
        r, _, _, w, r2 = linearize(T)
        return jnp.sum(w * r2)

    def body(T, _):
        r, Ji, Jj, w, _ = linearize(T)
        # assemble dense H, b via scatter into (K, K, 6, 6)
        Hii = _einsum("e,eri,erj->eij", w, Ji, Ji)
        Hjj = _einsum("e,eri,erj->eij", w, Jj, Jj)
        Hij = _einsum("e,eri,erj->eij", w, Ji, Jj)
        bi = -_einsum("e,eri,er->ei", w, Ji, r)
        bj = -_einsum("e,eri,er->ei", w, Jj, r)

        flat = lambda a, b_: a * K_n + b_
        H = jnp.zeros((K_n * K_n, 6, 6))
        H = H.at[flat(edges.i, edges.i)].add(Hii)
        H = H.at[flat(edges.j, edges.j)].add(Hjj)
        H = H.at[flat(edges.i, edges.j)].add(Hij)
        H = H.at[flat(edges.j, edges.i)].add(jnp.swapaxes(Hij, -1, -2))
        H = H.reshape(K_n, K_n, 6, 6)
        b = jnp.zeros((K_n, 6)).at[edges.i].add(bi).at[edges.j].add(bj)

        free = (jnp.logical_not(fixed) & kf_valid).astype(H.dtype)
        H = H * free[:, None, None, None] * free[None, :, None, None]
        H = H.at[jnp.arange(K_n), jnp.arange(K_n)].add(
            jnp.eye(6) * jnp.where(free > 0, damping, 1.0)[:, None, None]
        )
        b = b * free[:, None]

        H_mat = H.transpose(0, 2, 1, 3).reshape(K_n * 6, K_n * 6)
        dx = jnp.linalg.solve(H_mat, b.reshape(-1)).reshape(K_n, 6)
        dx = dx * free[:, None]
        # step clip for robustness
        n = jnp.linalg.norm(dx, axis=-1, keepdims=True)
        dx = dx * jnp.minimum(1.0, 1.0 / jnp.maximum(n, 1e-12))

        T_new = lie.compose(lie.se3_exp(dx), T)
        c_old = chi2_of(T)
        c_new = chi2_of(T_new)
        accept = jnp.isfinite(c_new) & (c_new < c_old)
        T_out = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), T_new, T)
        return T_out, jnp.where(accept, c_new, c_old)

    T_fin, chis = jax.lax.scan(body, T_cw, None, length=iters)
    return T_fin, chis


@vjit(static_argnames=("n_landmarks", "max_edges", "min_shared", "loop_gap"))
def covisibility_edges(
    kf_T_cw: lie.SE3,         # (K,) current keyframe poses
    kf_valid: jax.Array,      # (K,) bool
    obs_kf: jax.Array,        # (O,) int32
    obs_lm: jax.Array,        # (O,) int32
    obs_valid: jax.Array,     # (O,) bool
    n_landmarks: int,
    max_edges: int = 256,
    min_shared: int = 15,
    weight: float = 1.0,
    kf_T_cw_corr: lie.SE3 | None = None,   # (K,) loop-corrected poses
    tail: jax.Array | None = None,         # (K,) bool — pre-corrected group
    loop_gap: int = 0,
) -> PoseGraphEdges:
    """Essential-graph edges: keyframe pairs sharing >= min_shared landmarks.

    ORB-SLAM3's essential graph (covisibility edges above a shared-observation
    threshold; SURVEY.md §2.1 S1, §3.4) keeps the pose-graph correction
    anchored where observations actually constrain relative poses — with only
    the odometry chain + loop edges, PGO spreads the loop error evenly along
    the chain regardless of which pose pairs are rigidly tied by
    co-observations (VERDICT r04 weak #1).

    TPU shape: the (K, L) observation incidence matrix is built by one
    scatter, covisibility counts are ONE (K, L) @ (L, K) matmul on the MXU,
    and the top `max_edges` pairs (upper triangle, skipping the |i-j| <= 1
    pairs the odometry chain already covers) come from one top_k over the
    flattened count matrix. Relative measurements T_ij are taken from the
    CURRENT pose estimates — for co-observing pairs these are exactly the
    relative poses local BA has made consistent with the shared landmarks.
    Edge weight grows with sqrt(shared/min_shared) (information scales with
    observation count; sqrt tempers the dynamic range).

    LOOP CONNECTIONS (ORB-SLAM3 CorrectLoop's mvpCurrentConnectedKFs /
    LoopConnections split): the keyframes of a just-verified loop's tail
    re-associated the loop head's landmarks while still carrying the FULL
    accumulated drift, so a cross-loop covisibility pair measured from the
    raw estimates contradicts the loop edge and pins the drifted shape —
    exactly the r05 "corrections barely bite" failure. When
    (kf_T_cw_corr, tail, loop_gap) are given, a pair (i, j) with j in the
    pre-corrected tail group and j - i >= loop_gap takes j's pose from the
    corrected set (the analog of ORB-SLAM3 measuring new loop connections
    through CorrectedSim3); near-pairs keep raw measurements (their few-step
    relative drift is genuinely small, and injecting the correction there
    would be wrong by the full loop error)."""
    K_cap = kf_valid.shape[0]
    L = n_landmarks
    # (K, L) incidence via flat scatter
    flat = jnp.where(obs_valid, obs_kf * L + obs_lm, K_cap * L)
    A = jnp.zeros((K_cap * L + 1,), jnp.float32).at[flat].set(1.0)[:-1]
    A = A.reshape(K_cap, L)
    counts = jnp.matmul(A, A.T, precision=jax.lax.Precision.HIGHEST)
    ii = jnp.arange(K_cap)
    pair_ok = (
        kf_valid[:, None] & kf_valid[None, :]
        & (ii[None, :] - ii[:, None] > 1)       # strict upper, skip adjacent
    )
    counts = jnp.where(pair_ok, counts, 0.0)
    score = counts.reshape(-1)
    top, flat_idx = jax.lax.top_k(score, max_edges)
    i = (flat_idx // K_cap).astype(jnp.int32)
    j = (flat_idx % K_cap).astype(jnp.int32)
    ok = top >= float(min_shared)
    i = jnp.where(ok, i, 0)
    j = jnp.where(ok, j, 0)
    Tj = lie.SE3(kf_T_cw.R[j], kf_T_cw.t[j])
    if kf_T_cw_corr is not None and loop_gap > 0:
        cross = tail[j] & (j - i >= loop_gap)
        Tj_corr = lie.SE3(kf_T_cw_corr.R[j], kf_T_cw_corr.t[j])
        Tj = lie.SE3(
            jnp.where(cross[:, None, None], Tj_corr.R, Tj.R),
            jnp.where(cross[:, None], Tj_corr.t, Tj.t),
        )
    Ti = lie.SE3(kf_T_cw.R[i], kf_T_cw.t[i])
    T_ij = lie.compose(Ti, lie.inverse(Tj))
    w = weight * jnp.sqrt(jnp.maximum(top / float(min_shared), 1.0))
    return PoseGraphEdges(i, j, T_ij, w, ok)


def odometry_edges(T_cw: lie.SE3, n_kf: jax.Array, max_edges: int,
                   weight: float = 1.0) -> PoseGraphEdges:
    """Consecutive-keyframe edges from the current pose estimates."""
    K_n = T_cw.t.shape[0]
    i = jnp.arange(max_edges, dtype=jnp.int32)
    j = i + 1
    ok = (j < n_kf)
    i_c = jnp.minimum(i, K_n - 1)
    j_c = jnp.minimum(j, K_n - 1)
    Ti = lie.SE3(T_cw.R[i_c], T_cw.t[i_c])
    Tj = lie.SE3(T_cw.R[j_c], T_cw.t[j_c])
    T_ij = lie.compose(Ti, lie.inverse(Tj))
    return PoseGraphEdges(i_c, j_c, T_ij, jnp.full((max_edges,), weight), ok)
