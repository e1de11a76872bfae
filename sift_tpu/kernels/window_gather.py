"""Pallas TPU kernel: batched per-keypoint window extraction.

THE hot data movement of the keypoint stages (orientation/descriptor read
a ~77x77 neighborhood per keypoint; the reference does it with per-warp
strided loads, sift_func/SiftOps.cu:299-325,537-601).  XLA formulations
top out far below HBM bandwidth here: element-wise gathers issue s^2
scalar loads, and vmapped dynamic_slice windows move unaligned ~300-byte
rows.  This kernel DMAs one tiling-aligned (rows x 256-lane) block per
keypoint from the padded pyramid slab in HBM straight into the output's
VMEM block, several keypoints per grid step with the DMAs overlapped.

HBM memrefs are (8, 128)-tiled, so DMA origins must be 8-row/128-lane
aligned: origins are aligned DOWN and the window is oversized (+8 rows,
+128 lanes) so it still contains the patch + gradient halo.  The window is
origin-shifted, never clipped; callers reconstruct exact per-pixel offsets
from the returned origins, so edge handling stays in the (already masked)
consumer math.  Gathering the GAUSSIAN window (not precomputed gradients)
halves traffic: consumers recompute dx/dy locally from the halo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 256      # default window width: 128-aligned origin + 128 slack
SUBLANE = 8


def _gather_kernel(lidx_ref, ys_ref, xs_ref, src_ref, out_ref, sems,
                   *, rows: int, lanes: int, block_k: int):
    i = pl.program_id(0)
    dmas = []
    for j in range(block_k):
        k = i * block_k + j
        ys = pl.multiple_of(ys_ref[k], SUBLANE)
        xs = pl.multiple_of(xs_ref[k], 128)
        dma = pltpu.make_async_copy(
            src_ref.at[lidx_ref[k], pl.ds(ys, rows), pl.ds(xs, lanes)],
            out_ref.at[j],
            sems.at[j])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


@functools.partial(jax.jit, static_argnames=("rows", "lanes", "block_k"))
def gather_windows_pallas(values: jnp.ndarray, lidx: jnp.ndarray,
                          ys0: jnp.ndarray, xs0: jnp.ndarray,
                          rows: int, lanes: int = LANES,
                          block_k: int = 8) -> jnp.ndarray:
    """values: [L, Hp, Wp] f32; lidx/ys0/xs0: [K] int32 ALIGNED window
    origins from `window_origins` (ys0 % 8 == 0, xs0 % 128 == 0, windows
    in-bounds).  rows % 8 == 0, lanes % 128 == 0.
    Returns [K, rows, lanes]."""
    hp, wp = values.shape[-2:]
    hp2 = -(-max(hp, rows) // SUBLANE) * SUBLANE
    wp2 = -(-max(wp, lanes) // 128) * 128
    if hp2 != hp or wp2 != wp:
        values = jnp.pad(values, ((0, 0), (0, hp2 - hp), (0, wp2 - wp)))
    k = lidx.shape[0]
    kp = -(-k // block_k) * block_k
    if kp != k:
        pad = kp - k
        lidx = jnp.concatenate([lidx, jnp.zeros((pad,), lidx.dtype)])
        ys0 = jnp.concatenate([ys0, jnp.zeros((pad,), ys0.dtype)])
        xs0 = jnp.concatenate([xs0, jnp.zeros((pad,), xs0.dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(kp // block_k,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block_k, rows, lanes),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((block_k,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows=rows, lanes=lanes,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((kp, rows, lanes), values.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(lidx, ys0, xs0, values)
    return out[:k]


def window_rows(radius: int) -> int:
    """Rows needed for a patch of +-radius with a 1-px gradient halo and
    8-row alignment slack."""
    need = 2 * (radius + 1) + 1 + (SUBLANE - 1)
    return -(-need // SUBLANE) * SUBLANE


def window_origins(padded_shape, layer_index, cy, cx, rows: int,
                   radius: int):
    """Aligned, clamped window origins: the [ys0:ys0+rows, xs0:xs0+256]
    window lies inside the slab and contains the image-masked
    +-(radius+1) neighborhood of (cy, cx).

    Requires slab dims aligned to (8, 128) (pad_pyramid guarantees this);
    then the clamp bounds are themselves aligned and clamping never loses
    edge coverage.  Returns (lidx, ys0, xs0), ys0 % 8 == 0,
    xs0 % 128 == 0."""
    l, hp, wp = padded_shape
    hp = -(-max(hp, rows) // SUBLANE) * SUBLANE
    wp = -(-max(wp, LANES) // 128) * 128
    r = radius + 1
    ys0 = jnp.minimum((cy - r) // SUBLANE * SUBLANE, hp - rows)
    ys0 = jnp.maximum(ys0, 0).astype(jnp.int32)
    xs0 = jnp.minimum((cx - r) // 128 * 128, wp - LANES)
    xs0 = jnp.maximum(xs0, 0).astype(jnp.int32)
    lidx = jnp.clip(layer_index, 0, l - 1).astype(jnp.int32)
    return lidx, ys0, xs0
