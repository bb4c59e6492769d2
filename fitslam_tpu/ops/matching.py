"""Batched binary-descriptor matching.

Replaces ORB-SLAM3's ORBmatcher (reference submodule, SURVEY.md §2.1 S1) with
dense fixed-shape kernels: the full pairwise Hamming-distance matrix is one
XOR + population-count contraction on uint32 words — ideal VPU work — and all
selection logic (best/second-best ratio test, mutual consistency, windowed
search, stereo epipolar constraints) is masking over that matrix. Invalid
rows/columns carry +inf-like sentinel distances instead of changing shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

BIG = 20000  # sentinel distance for masked entries (> 256 bits, int16-safe);
# python int so it embeds as a literal instead of a captured device scalar


class Matches(NamedTuple):
    """Fixed-capacity match set from set A (rows) into set B (cols)."""

    idx_b: jax.Array     # (Na,) int32 — matched column per row (garbage if invalid)
    distance: jax.Array  # (Na,) int32 — Hamming distance
    valid: jax.Array     # (Na,) bool


def hamming_matrix(desc_a: jax.Array, desc_b: jax.Array,
                   valid_a: jax.Array, valid_b: jax.Array) -> jax.Array:
    """(Na, 256) x (Nb, 256) ±1 bfloat16 -> (Na, Nb) int16 Hamming distances.

    For ±1 vectors, dot = 256 - 2 * hamming, so the full distance matrix is
    one MXU matmul (f32 accumulate keeps it exact). Masked rows/cols get the
    BIG sentinel. int16 (distances are <= 256): the tracking hypothesis
    sweep re-reads this matrix 12x per frame and is bound by that HBM
    traffic — halving the element width halves the sweep time.
    """
    dot = jax.lax.dot_general(
        desc_a, desc_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # ±1 bf16 values are exact under f32 accumulation: pin bf16-input
        # MXU speed against the library-wide f32 matmul default
        precision=jax.lax.Precision.DEFAULT,
    )
    bits = desc_a.shape[-1]
    d = (bits - dot) * 0.5
    mask = valid_a[:, None] & valid_b[None, :]
    # select in f32, cast once afterwards
    return jnp.where(mask, d, float(BIG)).astype(jnp.int16)


_SENTINEL = 512  # stands in for BIG inside packed keys (> any true distance)


def match_ratio(
    dist: jax.Array,
    max_distance: int = 64,
    ratio: float = 0.8,
    mutual: bool = True,
) -> Matches:
    """Best-match selection with Lowe ratio + optional mutual-consistency.

    dist: (Na, Nb) int32 Hamming matrix (BIG where invalid).

    The row top-2 is computed as min-reductions over packed
    ``distance * Nb + column`` keys rather than ``lax.top_k``: top_k on
    int32 with both values and indices lowers to a full per-row sort on
    this backend — measured 5.2 ms for (1024, 8192) vs 41 us for the
    packed mins (MFU.md §1). Distances are clipped to a small sentinel so
    the packed key fits int32 at any capacity; every selection outcome is
    unchanged (sentinel > max_distance fails the gate, and the ratio test
    against a sentinel second-best accepts exactly like BIG does).
    """
    na, nb = dist.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    d = jnp.minimum(dist, _SENTINEL).astype(jnp.int32)
    packed = d * nb + cols
    p1 = jnp.min(packed, axis=1)
    best = p1 // nb
    best_idx = p1 % nb
    second = jnp.min(
        jnp.where(cols == best_idx[:, None], _SENTINEL * nb, packed), axis=1
    ) // nb
    ok = (best <= max_distance) & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    if mutual:
        col_best = jnp.argmin(dist, axis=0)  # (Nb,)
        ok = ok & (col_best[best_idx] == jnp.arange(na))
    return Matches(best_idx.astype(jnp.int32), best, ok)


def match_windowed(
    dist: jax.Array,
    xy_a: jax.Array,
    xy_b: jax.Array,
    radius: float,
    max_distance: int = 64,
    ratio: float = 0.9,
) -> Matches:
    """Projection-guided matching: only columns within `radius` px of the
    row's predicted position are candidates (reference: ORBmatcher's
    SearchByProjection used in motion-model tracking)."""
    d2 = jnp.sum((xy_a[:, None, :] - xy_b[None, :, :]) ** 2, axis=-1)
    dist = jnp.where(d2 <= radius * radius, dist, BIG)
    return match_ratio(dist, max_distance=max_distance, ratio=ratio, mutual=False)


def match_stereo(
    dist: jax.Array,
    xy_l: jax.Array,
    xy_r: jax.Array,
    level_l: jax.Array,
    level_r: jax.Array,
    max_disparity: float,
    max_distance: int = 64,
    row_tolerance: float = 2.0,
) -> Tuple[Matches, jax.Array]:
    """Rectified-stereo matching: same row (±tol), positive bounded disparity,
    same-or-adjacent pyramid level. Returns matches and per-row disparity."""
    dv = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    lvl_ok = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    ok = (dv <= row_tolerance) & (disp > 0.1) & (disp < max_disparity) & lvl_ok
    dist = jnp.where(ok, dist, BIG)
    m = match_ratio(dist, max_distance=max_distance, ratio=0.95, mutual=False)
    disparity = jnp.take_along_axis(disp, m.idx_b[:, None], axis=1)[:, 0]
    return m, jnp.where(m.valid, disparity, 0.0)


def match_ratio_chunked(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
    max_distance: int = 64,
    ratio: float = 0.8,
    mutual: bool = True,
    chunk: int = 2048,
) -> Matches:
    """match_ratio semantics without ever materializing the (Na, Nb)
    distance matrix in HBM.

    At map capacity (Na=1024, Nb=16384) the monolithic path writes + re-reads
    a 32-64 MB matrix around an 8.6 GFLOP matmul and lands at 1.45x the MXU
    bound (MFU.md §1, VERDICT r04 weak #6/#8). Here the landmark axis is
    scanned in `chunk`-column blocks: each block's distances live only as the
    matmul's registers/VMEM-resident output, the running row top-2 is carried
    as PACKED f32 keys (distance * Nb + column — exact to 2^24, far above
    any 512 * Nb + Nb here), and the per-column best row for the mutual check
    is emitted per block. Selection outcomes are bit-identical to
    match_ratio (parity-tested)."""
    na = desc_a.shape[0]
    nb = desc_b.shape[0]
    assert nb % chunk == 0, f"Nb {nb} not divisible by chunk {chunk}"
    n_chunks = nb // chunk
    db = desc_b.reshape(n_chunks, chunk, desc_b.shape[-1])
    vb = valid_b.reshape(n_chunks, chunk)
    bits = desc_a.shape[-1]
    rows = jnp.arange(na, dtype=jnp.int32)

    def body(carry, xs):
        p1, p2 = carry
        db_c, vb_c, off = xs
        dot = jax.lax.dot_general(
            desc_a, db_c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        d = jnp.minimum((bits - dot) * 0.5, float(_SENTINEL))
        mask = valid_a[:, None] & vb_c[None, :]
        d = jnp.where(mask, d, float(_SENTINEL))
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        packed = d * nb + (cols + off).astype(jnp.float32)
        q1 = jnp.min(packed, axis=1)
        q1_col = jnp.argmin(packed, axis=1)
        q2 = jnp.min(jnp.where(cols == q1_col[:, None], float(_SENTINEL * nb),
                               packed), axis=1)
        # merge running top-2 with the block's top-2
        new_p1 = jnp.minimum(p1, q1)
        new_p2 = jnp.minimum(jnp.maximum(p1, q1), jnp.minimum(p2, q2))
        col_best = jnp.argmin(d, axis=0).astype(jnp.int32)  # (chunk,)
        return (new_p1, new_p2), col_best

    init = (jnp.full((na,), float(_SENTINEL * nb)),
            jnp.full((na,), float(_SENTINEL * nb)))
    offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    (p1, p2), col_best_blocks = jax.lax.scan(body, init, (db, vb, offs))
    best = jnp.floor(p1 / nb)
    best_idx = (p1 - best * nb).astype(jnp.int32)
    second = jnp.floor(p2 / nb)
    ok = ((best <= max_distance) & (best < ratio * second)
          & valid_a & (best < _SENTINEL))
    if mutual:
        col_best = col_best_blocks.reshape(nb)
        ok = ok & (col_best[best_idx] == rows)
    return Matches(best_idx, best.astype(jnp.int32), ok)


def refine_disparity_subpixel(
    img_l: jax.Array,        # (H, W) float32 level-0 left image
    img_r: jax.Array,        # (H, W) right image
    xy_l: jax.Array,         # (N, 2) left feature positions (level-0 px)
    x_r: jax.Array,          # (N,) matched right feature x (level-0 px)
    valid: jax.Array,        # (N,) bool
    search_radius: int = 4,
    half_w: int = 3,
    half_h: int = 2,
) -> Tuple[jax.Array, jax.Array]:
    """Sub-pixel stereo disparity by zero-mean SAD + parabola interpolation.

    The integer-grid feature positions quantize disparity to whole pixels
    (x sx at pyramid level), and the resulting bias is SYSTEMATIC, not
    zero-mean: measured on the r05 ring diagnostic, tracking under-estimated
    forward motion by ~10 mm per keyframe step (~1.5% scale), an error the
    ring's own observations then *support* — GBA could not recover GT even
    from a GT initialization. This is ORB-SLAM3's ComputeStereoMatches
    correlation refinement (reference submodule, S1) as one batched kernel:
    a (N, 2h+1, strip) gather from the right image, 2r+1 shifted zero-mean
    SAD windows against the left patch, and a 3-point parabola on the best
    neighborhood. Returns (disparity (N,), ok (N,)); `ok` is False where the
    SAD minimum sits on the search boundary (refinement untrustworthy).
    """
    H, W = img_l.shape
    N = xy_l.shape[0]
    win_w = 2 * half_w + 1
    n_off = 2 * search_radius + 1
    strip_w = win_w + 2 * search_radius

    xl_i = jnp.clip(jnp.round(xy_l[:, 0]).astype(jnp.int32), half_w, W - 1 - half_w)
    y_i = jnp.clip(jnp.round(xy_l[:, 1]).astype(jnp.int32), half_h, H - 1 - half_h)
    xr_i = jnp.clip(jnp.round(x_r).astype(jnp.int32),
                    half_w + search_radius, W - 1 - half_w - search_radius)

    dy = jnp.arange(-half_h, half_h + 1)
    rows = y_i[:, None] + dy[None, :]                       # (N, wh)
    dxl = jnp.arange(-half_w, half_w + 1)
    cols_l = xl_i[:, None] + dxl[None, :]                   # (N, ww)
    dxs = jnp.arange(-half_w - search_radius, half_w + search_radius + 1)
    cols_s = xr_i[:, None] + dxs[None, :]                   # (N, strip_w)

    patch_l = img_l[rows[:, :, None], cols_l[:, None, :]]   # (N, wh, ww)
    strip_r = img_r[rows[:, :, None], cols_s[:, None, :]]   # (N, wh, strip_w)
    # zero-mean (brightness-robust, the IL - IL_center trick generalized)
    patch_l = patch_l - jnp.mean(patch_l, axis=(1, 2), keepdims=True)

    # (N, n_off, wh, ww) shifted windows out of the strip
    off = jnp.arange(n_off)
    win_idx = off[:, None] + jnp.arange(win_w)[None, :]     # (n_off, ww)
    wins = strip_r[:, :, win_idx]                           # (N, wh, n_off, ww)
    wins = jnp.swapaxes(wins, 1, 2)                         # (N, n_off, wh, ww)
    wins = wins - jnp.mean(wins, axis=(2, 3), keepdims=True)
    # SSD, not SAD: the squared-difference profile is locally quadratic in
    # the shift, so the 3-point parabola interpolates with far less bias
    # than on the piecewise-linear SAD profile (measured 0.12 px -> 0.05 px
    # on the synthetic shift test)
    diff = wins - patch_l[:, None, :, :]
    sad = jnp.sum(diff * diff, axis=(2, 3))                 # (N, n_off)

    best = jnp.argmin(sad, axis=1)
    interior = (best > 0) & (best < n_off - 1)
    b = jnp.clip(best, 1, n_off - 2)
    s0 = jnp.take_along_axis(sad, b[:, None], axis=1)[:, 0]
    sm = jnp.take_along_axis(sad, (b - 1)[:, None], axis=1)[:, 0]
    sp = jnp.take_along_axis(sad, (b + 1)[:, None], axis=1)[:, 0]
    denom = sm - 2.0 * s0 + sp
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (sm - sp) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)

    xr_star = (xr_i.astype(jnp.float32)
               + (b - search_radius).astype(jnp.float32) + delta)
    # local disparity at the patch center (disparity is locally constant on
    # the feature's surface, so this IS the feature's disparity; composing
    # with the feature's sub-pixel x offset would double-count it)
    disparity = xl_i.astype(jnp.float32) - xr_star
    ok = valid & interior & (disparity > 0.1)
    return disparity, ok


def scatter_matches(m: Matches, nb: int) -> jax.Array:
    """Invert matches: (Nb,) int32 row index per column, -1 where unmatched.

    When two rows claim one column, the lower row index wins (deterministic).
    """
    na = m.idx_b.shape[0]
    out = jnp.full((nb,), jnp.int32(na))
    rows = jnp.arange(na, dtype=jnp.int32)
    cols = jnp.where(m.valid, m.idx_b, nb)  # invalid -> dropped bucket
    padded = jnp.full((nb + 1,), jnp.int32(na))
    padded = padded.at[cols].min(rows, mode="drop")
    out = padded[:nb]
    return jnp.where(out < na, out, -1)
