"""Pallas kernel parity tests (interpret mode on the CPU mesh; the same
kernels run compiled on TPU — see MFU.md for the roofline argument)."""

import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.models import nav
from fitslam_tpu.ops import grid as gr
from fitslam_tpu.ops.pallas_grid import wavefront_sweeps

SPEC = gr.GridSpec2D(size=64, resolution=0.25, origin_x=-8.0, origin_y=-8.0)


def _problem():
    occ = np.zeros((SPEC.size, SPEC.size), np.uint8)
    occ[10:50, 30] = gr.LETHAL
    occ[:, 50:] = gr.UNKNOWN
    occ_j = jnp.asarray(occ)
    occ_i = occ_j.astype(jnp.int32)
    lethal = (occ_i != gr.UNKNOWN) & (occ_i >= gr.LETHAL)
    unknown = occ_i == gr.UNKNOWN
    passable = jnp.logical_not(lethal)
    base = SPEC.resolution * (
        1.0 + 0.02 * jnp.where(unknown, 0, occ_i).astype(jnp.float32))
    step = jnp.where(unknown, base * 2.0, base)
    step = jnp.where(passable, step, 1e9)
    pot0 = jnp.full((SPEC.size, SPEC.size), 1e9).at[32, 10].set(0.0)
    return occ_j, pot0, step, passable


def _xla_sweeps(pot0, step, passable, iters):
    def sweep(_, pot):
        up = jnp.roll(pot, 1, axis=0).at[0, :].set(1e9)
        dn = jnp.roll(pot, -1, axis=0).at[-1, :].set(1e9)
        lf = jnp.roll(pot, 1, axis=1).at[:, 0].set(1e9)
        rt = jnp.roll(pot, -1, axis=1).at[:, -1].set(1e9)
        best = jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt))
        return jnp.minimum(pot, jnp.where(passable, best + step, 1e9))

    return jax.lax.fori_loop(0, iters, sweep, pot0)


def test_wavefront_pallas_matches_xla():
    occ, pot0, step, passable = _problem()
    ref = np.asarray(_xla_sweeps(pot0, step, passable, 128))
    out = np.asarray(wavefront_sweeps(pot0, step, passable, 128,
                                      interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-3)
    # the potential is actually useful: reachable cells priced, wall blocked
    assert out[32, 10] == 0.0
    assert out[32, 25] < 1e8          # free cell priced
    assert out[30, 30] >= 1e8         # wall cell unpriced


def test_hamming_top2_matches_xla():
    """Fused matching kernel == hamming_matrix + match_ratio selection."""
    from fitslam_tpu.ops import matching
    from fitslam_tpu.ops.pallas_matching import hamming_top2, match_ratio_fused

    key = jax.random.PRNGKey(0)
    Na, Nb = 256, 1024
    da = jnp.where(jax.random.bernoulli(key, 0.5, (Na, 256)), 1.0, -1.0
                   ).astype(jnp.bfloat16)
    # half the db rows are noisy copies of query rows -> real matches exist
    kb = jax.random.fold_in(key, 1)
    db_rand = jnp.where(jax.random.bernoulli(kb, 0.5, (Nb, 256)), 1.0, -1.0
                        ).astype(jnp.bfloat16)
    flip = jax.random.bernoulli(jax.random.fold_in(key, 2), 0.05, (Na, 256))
    db = db_rand.at[:Na].set(jnp.where(flip, -da, da))
    va = jnp.ones((Na,), bool).at[3].set(False)
    vb = jnp.ones((Nb,), bool).at[17].set(False)

    idx, d1, d2, col_best = hamming_top2(da, va, db, vb, block=256,
                                         interpret=True)
    dist = matching.hamming_matrix(da, db, va, vb)
    ref = matching.match_ratio(dist, max_distance=64, ratio=0.8, mutual=True)
    got = match_ratio_fused(da, va, db, vb, max_distance=64, ratio=0.8,
                            mutual=True, block=256, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    assert v.sum() > Na // 2        # the planted matches are found
    np.testing.assert_array_equal(np.asarray(got.idx_b)[v],
                                  np.asarray(ref.idx_b)[v])
    np.testing.assert_array_equal(np.asarray(got.distance)[v],
                                  np.asarray(ref.distance)[v])
    # column-best agrees with a full argmin
    np.testing.assert_array_equal(np.asarray(col_best),
                                  np.asarray(jnp.argmin(dist, axis=0)))
