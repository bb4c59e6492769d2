"""Place recognition as dense linear algebra.

Replaces the reference's DBoW2 vocabulary scoring (ORB-SLAM3 loop detector,
submodule; SURVEY.md §2.1 S1) with a TPU-native global descriptor: each
frame's binary ORB descriptors are unpacked to ±1 bit vectors and averaged
into a 256-d signature; similarity against all keyframes is then one matvec
on the MXU. Crude relative to a trained vocabulary, but exact-shape, fast,
and good enough to shortlist loop candidates which are *verified* by
descriptor matching + geometric checks anyway (as the reference does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fitslam_tpu.utils.jit import vjit


@vjit
def signature_from_descriptors(desc: jax.Array, valid: jax.Array) -> jax.Array:
    """(N, 256) ±1 + (N,) mask -> (256,) L2-normalized float signature."""
    w = valid.astype(jnp.float32)[:, None]
    sig = jnp.sum(desc.astype(jnp.float32) * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
    n = jnp.linalg.norm(sig)
    return sig / jnp.maximum(n, 1e-6)


def score_against_keyframes(sig: jax.Array, kf_signatures: jax.Array,
                            kf_valid: jax.Array) -> jax.Array:
    """Cosine similarity of one signature vs all keyframes; -inf where invalid."""
    s = kf_signatures @ sig
    return jnp.where(kf_valid, s, -jnp.inf)
