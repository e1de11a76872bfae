"""Lane-shifted slab copy expansion as one Pallas pass.

The stacked pyramid's ``copies`` lane-shifted replicas
(ops/flatpyr.stack_pyramid) are pure data movement, but the XLA
formulation (concat of pad(slice) per copy) measures 1.57 ms at
1920x1200 — it re-reads the base per copy and materializes the
pad/slice intermediates.  This kernel emits all copies in one pass:
the grid's MINOR axis is the copy index with an input index map that
keeps the SAME base block across the ``copies`` minor steps, so Pallas'
revisiting detection fetches each base block once (59 MB read +
236 MB write at 1920x1200 — the speed-of-light traffic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Row-tile height: stack_pyramid pads the slab row count to a multiple
# of this when the Pallas expansion is requested.
EXPAND_TILE = 256


def _expand_kernel(b_ref, o_ref, *, ws: int, step: int):
    c = pl.program_id(1)
    s = c * step
    v = pltpu.roll(b_ref[...], (ws - s) % ws, 1)    # lane shift LEFT by s
    li = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    o_ref[...] = jnp.where(li < ws - s, v, 0.0)


@functools.partial(jax.jit, static_argnames=("copies", "interpret"))
def expand_lane_copies(base: jnp.ndarray, copies: int,
                       interpret: bool = False) -> jnp.ndarray:
    """[Hs, Ws] -> [copies*Hs, Ws]; copy c is the base lane-shifted LEFT
    by c * 128/copies with a zeroed tail — bit-identical to
    concat([base] + [pad(base[:, s:], s) ...])."""
    hs, ws = base.shape
    assert copies in (1, 2, 4) and LANES % copies == 0
    if copies == 1:
        return base
    t = EXPAND_TILE if hs % EXPAND_TILE == 0 else 8
    # Halve the row tile while a block exceeds ~2.5 MiB: at 4K widths a
    # [256, ws] f32 block blows the 16 MiB scoped-VMEM budget (observed
    # at ws=3968: 21 MiB > 16).  Powers of two down from EXPAND_TILE
    # always divide the EXPAND_TILE-padded slab height.
    while t > 8 and t * ws * 4 > 2_500_000:
        t //= 2
    assert hs % t == 0
    nt = hs // t
    step = LANES // copies
    return pl.pallas_call(
        functools.partial(_expand_kernel, ws=ws, step=step),
        grid=(nt, copies),
        in_specs=[pl.BlockSpec((t, ws), lambda i, c: (i, 0))],
        out_specs=pl.BlockSpec((t, ws), lambda i, c: (c * nt + i, 0)),
        out_shape=jax.ShapeDtypeStruct((copies * hs, ws), base.dtype),
        interpret=interpret,
    )(base)
