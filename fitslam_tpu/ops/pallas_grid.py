"""Pallas TPU kernel for the wavefront potential (NavFn equivalent).

The XLA formulation (models/nav.py::wavefront_potential) runs `iters`
min-plus relaxation sweeps; each sweep reads and writes the full (G, G)
potential through HBM, so at G=512 / iters=512 the op moves ~500 MB of HBM
traffic for ~130 MFLOP of work — pure bandwidth bound, ~0.2 % of
speed-of-light compute (see MFU.md). This kernel keeps the potential, the
step costs, and the passability mask resident in VMEM for the entire sweep
loop: one HBM read of three (G, G) arrays, `iters` sweeps on the VPU, one
HBM write. VMEM budget: 3 x G^2 x 4 B = 3 MB at G=512, comfortably inside
the ~16 MB/core budget.

Reference capability: vendored Willow-Garage NavFn
(DEPRECATED/.../src/planners/planner.cpp, SURVEY.md §2.3 E11).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _sweep_kernel(pot_ref, step_ref, passable_ref, out_ref, *, iters: int):
    G = pot_ref.shape[0]
    step = step_ref[:]
    passable = passable_ref[:] > 0.5
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    top = rows == 0
    bot = rows == G - 1
    left = cols == 0
    right = cols == G - 1

    def body(_, pot):
        # pltpu.roll needs non-negative shifts: -1 == G-1 (mod G)
        up = jnp.where(top, BIG, pltpu.roll(pot, 1, 0))
        dn = jnp.where(bot, BIG, pltpu.roll(pot, G - 1, 0))
        lf = jnp.where(left, BIG, pltpu.roll(pot, 1, 1))
        rt = jnp.where(right, BIG, pltpu.roll(pot, G - 1, 1))
        best = jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt))
        cand = best + step
        return jnp.minimum(pot, jnp.where(passable, cand, BIG))

    out_ref[:] = jax.lax.fori_loop(0, iters, body, pot_ref[:])


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def wavefront_sweeps(pot0: jax.Array, step_cost: jax.Array,
                     passable: jax.Array, iters: int,
                     interpret: bool = False) -> jax.Array:
    """Run `iters` 4-neighbor min-plus relaxation sweeps entirely in VMEM.

    pot0/step_cost: (G, G) float32; passable: (G, G) bool. Returns the
    relaxed potential. Semantics identical to the XLA sweep loop in
    models/nav.py::wavefront_potential (parity-tested in
    tests/test_pallas.py).
    """
    return pl.pallas_call(
        functools.partial(_sweep_kernel, iters=iters),
        out_shape=jax.ShapeDtypeStruct(pot0.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pot0.astype(jnp.float32), step_cost.astype(jnp.float32),
      passable.astype(jnp.float32))
