"""Fused Pallas TPU kernel for binary-descriptor matching.

The XLA path (ops/matching.py) materializes the full (Na, Nb) Hamming
distance matrix in HBM and then reduces it (top-2 per row + per-column
argmin). At map capacity (Na=1024 queries vs Nb=8192 landmarks) that matrix
is 32 MB of HBM write + read around a 0.5 GFLOP matmul — bandwidth-dominated
(see MFU.md). This kernel tiles the landmark set through VMEM, computes each
distance block on the MXU, and reduces it in place: per-query running
(best, second, argbest) plus the per-column best row for the mutual check.
HBM traffic drops to the two descriptor reads + O(Na + Nb) outputs; the
distance matrix never exists.

Reference capability: ORBmatcher's brute-force + mutual matching (ORB-SLAM3
submodule, SURVEY.md §2.1 S1); selection semantics identical to
matching.match_ratio (parity-tested in tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIGF = 1.0e6  # sentinel distance (>> 256 bits)


def _top2_kernel(qa_ref, va_ref, db_ref, vb_ref,
                 idx_ref, d1_ref, d2_ref, colbest_ref, coldist_ref):
    # 1-D logical arrays travel as (1, N): Mosaic 1-D vector layouts don't
    # match XLA's preferred tiling and i1 minor-dim inserts don't lower
    j = pl.program_id(0)
    BS = db_ref.shape[0]
    bits = qa_ref.shape[1]
    # pin bf16 contract precision: Mosaic rejects fp32 contract precision
    # on bf16 operands (the library-wide f32 default would request it)
    dot = jnp.dot(qa_ref[:], db_ref[:].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    dist = (bits - dot) * 0.5                               # (Na, BS)
    mask = va_ref[0, :][:, None] * vb_ref[0, :][None, :]
    dist = jnp.where(mask > 0.25, dist, BIGF)

    # block-local top-2 per row
    m1 = jnp.min(dist, axis=1)
    i1 = jnp.argmin(dist, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    m2 = jnp.min(jnp.where(cols == i1[:, None], BIGF, dist), axis=1)
    gi1 = i1 + j * BS

    # per-column best row (each column lives in exactly one block)
    colbest_ref[0, :] = jnp.argmin(dist, axis=0).astype(jnp.int32)
    coldist_ref[0, :] = jnp.min(dist, axis=0)

    @pl.when(j == 0)
    def _():
        d1_ref[0, :] = m1
        d2_ref[0, :] = m2
        idx_ref[0, :] = gi1

    @pl.when(j > 0)
    def _():
        r1 = d1_ref[0, :]
        r2 = d2_ref[0, :]
        ri = idx_ref[0, :]
        # top-2 of the union of {r1 <= r2} and {m1 <= m2}
        idx_ref[0, :] = jnp.where(m1 < r1, gi1, ri)
        d1_ref[0, :] = jnp.minimum(r1, m1)
        d2_ref[0, :] = jnp.minimum(jnp.maximum(r1, m1), jnp.minimum(r2, m2))


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def hamming_top2(
    desc_a: jax.Array,   # (Na, bits) ±1
    valid_a: jax.Array,  # (Na,) bool
    desc_b: jax.Array,   # (Nb, bits) ±1
    valid_b: jax.Array,  # (Nb,) bool
    block: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (best_idx (Na,), best (Na,), second (Na,), col_best (Nb,))
    without materializing the (Na, Nb) distance matrix."""
    Na, bits = desc_a.shape
    Nb = desc_b.shape[0]
    block = min(block, Nb)
    while Nb % block:          # capacities are powers of two; degrade to fit
        block //= 2
    grid = (Nb // block,)
    out = pl.pallas_call(
        _top2_kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((1, Na), jnp.int32),
            jax.ShapeDtypeStruct((1, Na), jnp.float32),
            jax.ShapeDtypeStruct((1, Na), jnp.float32),
            jax.ShapeDtypeStruct((1, Nb), jnp.int32),
            jax.ShapeDtypeStruct((1, Nb), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((Na, bits), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Na), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, bits), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Na), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Na), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Na), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda j: (0, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(desc_a, valid_a.astype(jnp.float32)[None, :],
      desc_b, valid_b.astype(jnp.float32)[None, :])
    idx, d1, d2, col_best, _coldist = out
    # col_best holds per-column row argmins; rows aren't tiled, so the
    # block-local values are already global — no cross-block merge needed
    return idx[0], d1[0], d2[0], col_best[0]


def match_ratio_fused(
    desc_a: jax.Array,
    valid_a: jax.Array,
    desc_b: jax.Array,
    valid_b: jax.Array,
    max_distance: int = 64,
    ratio: float = 0.8,
    mutual: bool = True,
    block: int = 512,
    interpret: bool = False,
):
    """Drop-in for matching.hamming_matrix + matching.match_ratio.

    Since match_ratio moved its top-2 to packed min-reductions, the XLA
    path runs AT the matmul's MXU bound (in-graph on v5e: 20.7 us vs the
    21.8 us bound at Nb=8192, 63 us vs 43.6 at 16k) — XLA multi-output-
    fuses the reductions into the matmul so the distance matrix never
    round-trips HBM. The hand-written kernel below is 6-10x slower (its
    per-block reduction chain runs on the VPU between MXU block matmuls)
    and is kept for reference/parity testing only; pass `interpret=True`
    (or call hamming_top2 directly) to exercise it."""
    from fitslam_tpu.ops import matching

    if not interpret:
        dist = matching.hamming_matrix(desc_a, desc_b, valid_a, valid_b)
        return matching.match_ratio(dist, max_distance=max_distance,
                                    ratio=ratio, mutual=mutual)
    idx, d1, d2, col_best = hamming_top2(
        desc_a, valid_a, desc_b, valid_b, block=block, interpret=interpret)
    ok = (d1 <= max_distance) & (d1 < ratio * d2)
    if mutual:
        na = desc_a.shape[0]
        ok = ok & (col_best[idx] == jnp.arange(na))
    return matching.Matches(idx, d1.astype(jnp.int32), ok)
