"""Fused Pallas TPU kernel for the dense detection stages:
Gaussian octave -> DoG -> 3x3x3 extrema mask -> Newton record field,
one pass, everything in VMEM.

THE hot dense compute of large frames (round-3 profile at 1600x900:
extrema 1.35 ms + refine 4.98 ms of a 15 ms frame).  The XLA
formulations (ops/peaks.py pooling, ops/refine_dense.record_fields)
materialize the DoG volume, ~28 shifted copies of it, and every
intermediate of the per-pixel Cramer solve in HBM — gigabytes of
traffic per frame that scale with pixel area.  This kernel reads each
Gaussian octave ONCE (row tiles with an 8-row halo, double-buffered
DMA), computes DoG, the 26-neighbor extremum test (the capability of
``findPeaks3D``, /root/reference/sift_cuda/image_func/MatOps.cu:92-181)
and the dense 3-D quadratic records (the capability of
``adjustExtrema``'s per-step solve, sift_func/SiftOps.cu:63-208) in
VMEM, and writes only the record field.

Output layout: [L, 3, Hq, Wp] f32 (plane-major — TPU lane dim =
padded width), the packed A/B/C channels of ops/records.py: A carries
flags (conv | div<<1 | edge_ok<<2 | **peak<<3** | contrast_ok<<4) plus
the clamped rounded Newton steps — everything a walk STEP gathers, one
element per candidate; B/C carry quantized sub-pixel offsets and the
response, gathered once at the final position.  The extrema mask rides
A's peak bit, so candidate compaction needs no separate mask volume
and the DoG volume is never materialized at all.

The arithmetic is expression-for-expression the same as the jnp
reference path (ops/refine_dense.record_fields + ops/peaks.peak_mask);
interior pixels match it bit-for-bit modulo f32 fusion.  Rim pixels
(1-px image border, lane/row padding) are garbage by the same contract
as the jnp path: the peak bit is explicitly masked to the
[border, size-border) interior, and the walk never consults rim
records for live candidates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMG_SCALE = 1.0 / 255.0
_DERIV_SCALE = _IMG_SCALE * 0.5
_SECOND_DERIV_SCALE = _IMG_SCALE
_CROSS_DERIV_SCALE = _IMG_SCALE * 0.25

TILE_ROWS = 32        # compute rows per grid step (mult of 16: bf16 out)
HALO = 8              # DMA halo rows above/below the tile (stencils use 1)


def _at(a, dr: int, dc: int):
    """Value at (row+dr, col+dc) via wrapping rolls.  Wrap garbage lands
    only on scratch rows 0 / last and image columns 0 / W-1 — all outside
    the compute slice's stencil reach or inside the masked image rim."""
    r, c = a.shape
    if dr:
        a = pltpu.roll(a, (r - dr) % r, 0)
    if dc:
        a = pltpu.roll(a, (c - dc) % c, 1)
    return a


def _detect_kernel(gp_ref, out_ref, scratch, sems, *,
                   n_layers: int, h: int, w: int, threshold: float,
                   border: int, edge_threshold: float,
                   contrast_threshold: float, octave_layers: int):
    """Grid step i computes image rows [i*TILE_ROWS, (i+1)*TILE_ROWS).

    gp_ref: [NL, Hin, Wp] padded Gaussian octave in HBM; image content
    at rows [HALO, HALO + h), cols [0, w); Hin = n_tiles*TILE_ROWS +
    2*HALO.  scratch: [2, NL, TILE_ROWS + 2*HALO, Wp] double-buffered
    VMEM tile.  out_ref: [L, 3, TILE_ROWS, Wp] block of the packed
    record field (channels A/B/C, ops/records.pack_record_channels)."""
    from sift_tpu.ops.records import pack_record_channels
    i = pl.program_id(0)
    nt = pl.num_programs(0)
    rows = TILE_ROWS + 2 * HALO

    def dma_in(slot, t):
        return pltpu.make_async_copy(
            gp_ref.at[:, pl.ds(t * TILE_ROWS, rows), :],
            scratch.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        dma_in(0, 0).start()

    @pl.when(i + 1 < nt)
    def _():
        dma_in(jax.lax.rem(i + 1, 2), i + 1).start()

    dma_in(jax.lax.rem(i, 2), i).wait()
    g = scratch[jax.lax.rem(i, 2)]           # [NL, rows, Wp] values

    nd = g.shape[0] - 1
    wp = g.shape[2]
    dog = [g[l + 1] - g[l] for l in range(nd)]

    # Global image coordinates of the scratch rows / lanes.
    gy = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
          + i * TILE_ROWS - HALO)
    gx = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    inb = ((gy >= border) & (gy < h - border)
           & (gx >= border) & (gx < w - border))

    for lr in range(1, nd - 1):
        lo, c, hi = dog[lr - 1], dog[lr], dog[lr + 1]

        # --- 26-neighbor extremum (ops/peaks.peak_mask): z-pool, then
        # separable 3x3 spatial pool of the z-pooled plane.
        zmx = jnp.maximum(jnp.maximum(lo, c), hi)
        zmn = jnp.minimum(jnp.minimum(lo, c), hi)
        mx = jnp.maximum(jnp.maximum(_at(zmx, -1, 0), zmx), _at(zmx, 1, 0))
        mx = jnp.maximum(jnp.maximum(_at(mx, 0, -1), mx), _at(mx, 0, 1))
        mn = jnp.minimum(jnp.minimum(_at(zmn, -1, 0), zmn), _at(zmn, 1, 0))
        mn = jnp.minimum(jnp.minimum(_at(mn, 0, -1), mn), _at(mn, 0, 1))
        peak = ((jnp.abs(c) > threshold)
                & (((c > 0) & (c >= mx)) | ((c < 0) & (c <= mn)))
                & inb)

        # --- dense Newton records (ops/refine_dense.record_fields).
        dx = (_at(c, 0, 1) - _at(c, 0, -1)) * _DERIV_SCALE
        dy = (_at(c, 1, 0) - _at(c, -1, 0)) * _DERIV_SCALE
        ds = (hi - lo) * _DERIV_SCALE
        v2 = c * 2.0
        dxx = (_at(c, 0, 1) + _at(c, 0, -1) - v2) * _SECOND_DERIV_SCALE
        dyy = (_at(c, 1, 0) + _at(c, -1, 0) - v2) * _SECOND_DERIV_SCALE
        dss = (hi + lo - v2) * _SECOND_DERIV_SCALE
        dxy = (_at(c, 1, 1) - _at(c, 1, -1) - _at(c, -1, 1)
               + _at(c, -1, -1)) * _CROSS_DERIV_SCALE
        dxs = (_at(hi, 0, 1) - _at(hi, 0, -1) - _at(lo, 0, 1)
               + _at(lo, 0, -1)) * _CROSS_DERIV_SCALE
        dys = (_at(hi, 1, 0) - _at(hi, -1, 0) - _at(lo, 1, 0)
               + _at(lo, -1, 0)) * _CROSS_DERIV_SCALE

        det = (dxx * (dyy * dss - dys * dys)
               - dxy * (dxy * dss - dys * dxs)
               + dxs * (dxy * dys - dyy * dxs))
        ok = jnp.abs(det) > 1e-30
        safe = jnp.where(ok, det, 1.0)
        x0 = (dx * (dyy * dss - dys * dys)
              - dxy * (dy * dss - dys * ds)
              + dxs * (dy * dys - dyy * ds)) / safe
        x1 = (dxx * (dy * dss - dys * ds)
              - dx * (dxy * dss - dys * dxs)
              + dxs * (dxy * ds - dy * dxs)) / safe
        x2 = (dxx * (dyy * ds - dy * dys)
              - dxy * (dxy * ds - dy * dxs)
              + dx * (dxy * dys - dyy * dxs)) / safe

        conv = ((jnp.abs(x0) < 0.5) & (jnp.abs(x1) < 0.5)
                & (jnp.abs(x2) < 0.5) & ok)
        div = ((jnp.abs(x0) > w) | (jnp.abs(x1) > h)
               | (jnp.abs(x2) > 100.0) | ~ok)

        contrast = c * _IMG_SCALE - (dx * x0 + dy * x1 + ds * x2) * 0.5
        tr = dxx + dyy
        det2 = dxx * dyy - dxy * dxy
        et = edge_threshold
        edge_ok = (det2 > 0) & (tr * tr * et < (et + 1.0) * (et + 1.0)
                                * det2)

        flags = (conv.astype(jnp.float32)
                 + 2.0 * div.astype(jnp.float32)
                 + 4.0 * edge_ok.astype(jnp.float32))
        # contrast_ok decided here at full f32 precision (bit 4 of A):
        # quantized C only shapes the response OUTPUT value.  Same f32
        # expression as records_jnp for bit-identical decisions.
        cok = (jnp.abs(contrast) * float(octave_layers)
               >= contrast_threshold)
        a, b, cch = pack_record_channels(x0, x1, x2, jnp.abs(contrast),
                                         flags, peak, cok)

        sl = slice(HALO, HALO + TILE_ROWS)
        out_ref[0, lr - 1] = a[sl]
        out_ref[1, lr - 1] = b[sl]
        out_ref[2, lr - 1] = cch[sl]


# Octaves smaller than this run the jnp path: Mosaic tiling and the
# DMA halo give the kernel nothing to win on a few thousand pixels.
MIN_PALLAS_H = 2 * TILE_ROWS
MIN_PALLAS_W = 128


def pad_octave_for_detect(gauss_oct: jnp.ndarray, h: int) -> jnp.ndarray:
    """[NL, H, W] -> the kernel's padded layout [NL, nT*TILE_ROWS +
    2*HALO, Wp]: HALO zero rows on top, zero rows to the tile grid +
    HALO below, zero lanes to Wp % 128 == 0.  The tiled pyramid emits
    this shape natively; this helper serves natural-shape inputs."""
    nl, hh, w = gauss_oct.shape
    nt = -(-h // TILE_ROWS)
    wp = -(-max(w, 128) // 128) * 128
    return jnp.pad(gauss_oct, ((0, 0),
                               (HALO, nt * TILE_ROWS + HALO - hh),
                               (0, wp - w)))


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "threshold", "border", "edge_threshold",
    "contrast_threshold", "octave_layers", "interpret"))
def detect_records_pallas(gp: jnp.ndarray, h: int, w: int,
                          threshold: float, border: int,
                          edge_threshold: float,
                          contrast_threshold: float, octave_layers: int,
                          interpret: bool = False) -> jnp.ndarray:
    """gp: [NL, Hin, Wp] f32 padded Gaussian octave — image rows at
    [HALO, HALO + h), lane-padded width Wp % 128 == 0, Hin =
    n_tiles*TILE_ROWS + 2*HALO with n_tiles = ceil(h / TILE_ROWS)
    (pad_octave_for_detect builds this, and the tiled pyramid emits it
    natively).  Returns the packed record field
    [3, NL-3, n_tiles*TILE_ROWS, Wp] f32, PLANE-major: flattening one
    plane for the walk's gathers is then a sliceless reshape (see
    module docstring)."""
    nl, hin, wp = gp.shape
    n_tiles = -(-h // TILE_ROWS)
    # >= not ==: the tiled pyramid rounds rows up to its own 128-row
    # grid; extra bottom rows are zero and simply never computed on.
    assert hin >= n_tiles * TILE_ROWS + 2 * HALO, (hin, h)
    assert wp % 128 == 0
    nrec = nl - 3
    rows = TILE_ROWS + 2 * HALO

    out = pl.pallas_call(
        functools.partial(
            _detect_kernel, n_layers=nl, h=h, w=w, threshold=threshold,
            border=border, edge_threshold=edge_threshold,
            contrast_threshold=contrast_threshold,
            octave_layers=octave_layers),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3, nrec, TILE_ROWS, wp),
                               lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (3, nrec, n_tiles * TILE_ROWS, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nl, rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # Scoped VMEM scales with the padded width (double-buffered
        # scratch + output blocks + stencil temporaries are all
        # [*, Wp]); the 16 MiB default trips at Wp >= 1920 while the
        # chip has 128 MiB.  48 MiB covers 4K-wide frames.
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(gp)
    return out
