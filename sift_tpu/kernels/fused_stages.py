"""Fused Pallas TPU kernels for the per-keypoint SIFT stages.

THE hot compute of detect+compute (round-1 profile: orientation 6.4 ms +
descriptor 8.5 ms + gradient slabs 1.2 ms of a 20 ms frame at 752x480).
The XLA formulations (ops/orientation.py, ops/descriptor.py) materialize
[K, P, bins]-shaped one-hot / hat operands in HBM — multi-GB of traffic
per frame.  These kernels instead DMA each keypoint's raw GAUSSIAN window
(rows x 128 lanes, origin-aligned) from the padded pyramid slab straight
into VMEM and do everything on-chip:

* gradients (dx/dy/mag/atan2) recomputed in-kernel from the pixel window
  — full f32 precision, and the three dense gradient slabs (mag, ori,
  packed) of the XLA path are never built;
* Gaussian window weights as separable row/col vectors (rows + lanes
  transcendentals, not rows*lanes);
* histogram accumulation as dense hat/one-hot products + reductions in
  VMEM (no atomics — the reference's __syncwarp/atomicAdd discipline,
  sift_func/SiftOps.cu:299-325,537-601, is replaced by construction);
* double-buffered window DMA overlapped with compute.

The numerical contracts match ops/orientation.py / ops/descriptor.py
exactly (same masks, same hat identities); tests gate the two paths
against each other in interpret mode.

Window contract: the source is a row-STACKED raw pyramid with
128/copies-lane-shifted copies (ops/flatpyr.stack_pyramid — every kept
(octave, layer) plane at natural height; only the layers keypoints
reference are kept, so 4 copies cost ~2x one full slab).  Copy selection
(ops/flatpyr.stacked_origins) places each keypoint's patch at a lane
offset < 128/copies inside an 8-row/128-lane aligned [rows, 128] DMA
block, so the unpacked kernels touch the window as-is — no dynamic
in-VMEM roll (measured ~0.15 us/keypoint on v5e, the single biggest
per-keypoint overhead of the rolled design).  With copies=4 a patch of
radius r <= 46 plus its 1-px gradient halo always fits.  The lane-packed
orientation path still rolls — by (seg*s - off) — to place pack patches
at segment starts.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_tpu.config import (SIFT_DESCR_HIST_BINS, SIFT_DESCR_WIDTH,
                             SIFT_ORI_HIST_BINS)

LANES = 128
DMA_LANES = 128
SUBLANE = 8
_D = SIFT_DESCR_WIDTH
_NBD = SIFT_DESCR_HIST_BINS
_NBO = SIFT_ORI_HIST_BINS
_RAD2DEG = 180.0 / math.pi

# f32 param-row layout shared by both kernels (desc uses all 13 columns):
#  0 dy0 (win row0 - cy)  1 dx0 (win lane0 - cx)  2 ylo (1-py)
#  3 yhi (h-2-py)  4 xlo (1-px)  5 xhi (w-2-px)   6 es  7 radius
#  8 valid  9 cos_t  10 sin_t  11 ang  12 patch lane offset (< 128/copies)
NPAR = 13


def _atan2_deg(dy, dx):
    """Polynomial atan2 in degrees, [-180, 180] (Mosaic has no atan2
    lowering).  Octant reduction + odd degree-15 minimax polynomial for
    atan on [0, 1]: |err| <= 3.8e-8 rad (2.2e-6 deg) — at the f32 noise
    floor, so histogram-bin decisions match the dense-gradient path's own
    jnp.arctan2 rounding (a pixel flips bins only when its orientation
    sits within f32 eps of a 10-degree boundary, same as the flat path).
    atan2(0, 0) -> 0 with no NaN (zero-magnitude pixels must not poison
    the weighted sums)."""
    ax = jnp.abs(dx)
    ay = jnp.abs(dy)
    mx = jnp.maximum(ax, ay)
    z = jnp.minimum(ax, ay) / jnp.maximum(mx, 1e-30)
    z2 = z * z
    p = z * (0.9999993357463199
             + z2 * (-0.3332986151078535
                     + z2 * (0.19946574511230034
                             + z2 * (-0.13908676324191868
                                     + z2 * (0.09642322342441606
                                             + z2 * (-0.05591409699715592
                                                     + z2 * (0.02186422353328521
                                                             + z2 * -0.004054926663980925)))))))
    r = jnp.where(ay > ax, (math.pi / 2) - p, p)
    r = jnp.where(dx < 0, math.pi - r, r)
    return jnp.where(dy < 0, -r, r) * _RAD2DEG


def _grad_mag_ori(win):
    """Gradients from the raw pixel window (rim lanes/rows garbage by
    contract — always masked by the bounds columns of the params).
    pltpu.roll requires non-negative shifts: shift by size-1 == -1."""
    rows = win.shape[0]
    dx = pltpu.roll(win, LANES - 1, 1) - pltpu.roll(win, 1, 1)
    dy = pltpu.roll(win, 1, 0) - pltpu.roll(win, rows - 1, 0)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ori = _atan2_deg(dy, dx)                      # [-180, 180]
    return mag, ori


def _axis_vectors(par, j, rows):
    """Separable per-row/per-col offset, Gaussian-weight and bounds-mask
    vectors.  Returns (offy [rows,1], offx [1,LANES], wy, wx)."""
    dy0 = par[j, 0]
    dx0 = par[j, 1]
    es = par[j, 6]
    rad = par[j, 7]
    offy = dy0 + jax.lax.broadcasted_iota(
        jnp.int32, (rows, 1), 0).astype(jnp.float32)
    offx = dx0 + jax.lax.broadcasted_iota(
        jnp.int32, (1, LANES), 1).astype(jnp.float32)
    my = ((offy >= par[j, 2]) & (offy <= par[j, 3])
          & (jnp.abs(offy) <= rad))
    mx = ((offx >= par[j, 4]) & (offx <= par[j, 5])
          & (jnp.abs(offx) <= rad))
    wy = jnp.where(my, jnp.exp(offy * offy * es), 0.0) * par[j, 8]
    wx = jnp.where(mx, jnp.exp(offx * offx * es), 0.0)
    return offy, offx, wy, wx


def _start_dma(cnt_ref, src_ref, ys_ref, xs_ref, wins, sems, slot,
               block, block_k, rows, n_kpts):
    """Issue per-keypoint window DMAs for ``block``; keypoints at or past
    the LIVE count (cnt_ref[0]; compaction is valid-first, so live ==
    first cnt) are skipped entirely — work scales with the frame's actual
    keypoint count, not the static capacity (the CUDA count-sized-launch
    equivalent at XLA-compatible static shapes)."""
    for j in range(block_k):
        k = block * block_k + j

        @pl.when(k < cnt_ref[0])
        def _(k=k, j=j):
            kc = jnp.minimum(k, n_kpts - 1)
            ys = pl.multiple_of(ys_ref[kc], SUBLANE)
            xs = pl.multiple_of(xs_ref[kc], LANES)
            pltpu.make_async_copy(
                src_ref.at[pl.ds(ys, rows), pl.ds(xs, DMA_LANES)],
                wins.at[slot, j],
                sems.at[slot, j]).start()


def _wait_dma(cnt_ref, src_ref, ys_ref, xs_ref, wins, sems, slot,
              block, block_k, rows, n_kpts):
    for j in range(block_k):
        k = block * block_k + j

        @pl.when(k < cnt_ref[0])
        def _(k=k, j=j):
            kc = jnp.minimum(k, n_kpts - 1)
            ys = pl.multiple_of(ys_ref[kc], SUBLANE)
            xs = pl.multiple_of(xs_ref[kc], LANES)
            pltpu.make_async_copy(
                src_ref.at[pl.ds(ys, rows), pl.ds(xs, DMA_LANES)],
                wins.at[slot, j],
                sems.at[slot, j]).wait()


def _seg_masks(pack: int, seg: int):
    """[1, LANES] bool lane masks of the ``pack`` packing segments."""
    li = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    return [(li >= s * seg) & (li < (s + 1) * seg) for s in range(pack)]


def _seg_vec(par_ref, js, col, masks, shift=None):
    """[1, LANES] f32 carrying par[js[s], col] (plus an optional static
    per-segment shift) on segment s — per-keypoint scalars as lane
    vectors, so ``pack`` keypoints share one vector op."""
    v = None
    for s, m in enumerate(masks):
        x = par_ref[js[s], col]
        if shift is not None:
            x = x + shift[s]
        t = jnp.where(m, x, 0.0)
        v = t if v is None else v + t
    return v


def _packed_window(wins, slot, js, par_ref, seg, masks):
    """Merge ``len(js)`` keypoints' patches into ONE [rows, LANES] window,
    patch s starting at lane s*seg (rolled there from its DMA offset,
    par column 12).  Keypoints share every subsequent vector op
    (gradients, atan2, histogram passes) — the per-keypoint cost of the
    whole compute chain divides by the pack factor.  Patch + gradient
    halo must fit the segment: 2*(radius+1)+1 <= seg.

    Invalid keypoints' segments are zeroed (their DMA may have been
    count-skipped, leaving stale or uninitialized VMEM — a NaN there
    would leak into a neighbor segment's masked halo through the
    gradient rolls, and NaN * 0 poisons the shared lane reductions)."""
    win = None
    for s, j in enumerate(js):
        off = par_ref[j, 12].astype(jnp.int32)
        shift = (LANES - off + s * seg) % LANES
        w = pltpu.roll(wins[slot, j], shift, 1)
        w = jnp.where(masks[s] & (par_ref[j, 8] > 0.0), w, 0.0)
        win = w if win is None else win + w
    return win


# ---------------------------------------------------------------------------
# Orientation: 36-bin Gaussian-weighted gradient histograms
# ---------------------------------------------------------------------------


def _ori_kernel(cnt_ref, ys_ref, xs_ref, par_ref, src_ref, out_ref,
                wins, sems, *,
                rows: int, block_k: int, n_kpts: int, pack: int):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        _start_dma(cnt_ref, src_ref, ys_ref, xs_ref, wins, sems, 0, 0,
                   block_k, rows, n_kpts)

    @pl.when(i + 1 < nb)
    def _():
        _start_dma(cnt_ref, src_ref, ys_ref, xs_ref, wins, sems,
                   (i + 1) % 2, i + 1, block_k, rows, n_kpts)

    _wait_dma(cnt_ref, src_ref, ys_ref, xs_ref, wins, sems, i % 2, i,
              block_k, rows, n_kpts)

    seg = LANES // pack
    masks = _seg_masks(pack, seg)
    for g in range(block_k // pack):
        js = [g * pack + s for s in range(pack)]

        # Whole-group skip past the live count (compaction is valid-
        # first): out rows stay garbage, discarded downstream by the
        # validity mask.
        @pl.when(i * block_k + js[0] < cnt_ref[0])
        def _(g=g, js=js):
            _ori_group(par_ref, out_ref, wins, i % 2, js, rows, pack,
                       seg, masks)


def _ori_group(par_ref, out_ref, wins, slot, js, rows, pack, seg, masks):
    if pack == 1:
        win = wins[slot, js[0]]
        mag, ori = _grad_mag_ori(win)
        _, _, wy, wx = _axis_vectors(par_ref, js[0], rows)
    else:
        win = _packed_window(wins, slot, js, par_ref, seg, masks)
        mag, ori = _grad_mag_ori(win)
        # Per-keypoint scalars as per-segment lane vectors; offx is
        # lane-relative to each patch's segment start (dx0 is DMA-
        # window-lane-0 relative — add the patch offset, col 12).
        li = jax.lax.broadcasted_iota(
            jnp.int32, (1, LANES), 1).astype(jnp.float32)
        ri = jax.lax.broadcasted_iota(
            jnp.int32, (rows, 1), 0).astype(jnp.float32)
        shift = [-float(s * seg) for s in range(pack)]
        offy = _seg_vec(par_ref, js, 0, masks) + ri     # [rows, LANES]
        offx = (_seg_vec(par_ref, js, 1, masks, shift)
                + _seg_vec(par_ref, js, 12, masks) + li)
        ylo = _seg_vec(par_ref, js, 2, masks)
        yhi = _seg_vec(par_ref, js, 3, masks)
        xlo = _seg_vec(par_ref, js, 4, masks)
        xhi = _seg_vec(par_ref, js, 5, masks)
        es = _seg_vec(par_ref, js, 6, masks)
        rad = _seg_vec(par_ref, js, 7, masks)
        vld = _seg_vec(par_ref, js, 8, masks)
        my = (offy >= ylo) & (offy <= yhi) & (jnp.abs(offy) <= rad)
        mx = ((offx >= xlo) & (offx <= xhi)
              & (jnp.abs(offx) <= rad))                 # [1, LANES]
        wy = jnp.where(my, jnp.exp(offy * offy * es), 0.0)
        wx = jnp.where(mx, jnp.exp(offx * offx * es) * vld, 0.0)
    contrib = mag * wy * wx                    # [rows, LANES]
    # bin = round(ori * 36/360), wrapped (ops/orientation.py:113-115).
    b = jnp.round(ori * (_NBO / 360.0))
    b = jnp.where(b >= _NBO, b - _NBO, b)
    b = jnp.where(b < 0, b + _NBO, b)
    # Sublane-reduce per bin (cheap), then ONE lane reduction over the
    # stacked [36, LANES] matrix — lane reductions are ~7x the cost of
    # sublane reductions and must not run once per bin.
    cols = [
        jnp.sum(jnp.where(b == float(bi), contrib, 0.0),
                axis=0, keepdims=True)          # [1, LANES]
        for bi in range(_NBO)
    ]
    m = jnp.concatenate(cols, axis=0)           # [36, LANES]
    if pack == 1:
        out_ref[js[0], :] = jnp.sum(m, axis=1)
    else:
        for s in range(pack):
            out_ref[js[s], :] = jnp.sum(
                jnp.where(masks[s], m, 0.0), axis=1)


def _pad_args(ys0, xs0, par, k, kp):
    pad = kp - k
    ys0 = jnp.concatenate([ys0, jnp.zeros((pad,), ys0.dtype)])
    xs0 = jnp.concatenate([xs0, jnp.zeros((pad,), xs0.dtype)])
    par = jnp.concatenate([par, jnp.zeros((pad, NPAR), par.dtype)])
    return ys0, xs0, par


# Largest patch radius whose patch + gradient halo fits a 64-lane
# packing segment: 2*(r+1)+1 <= 64.
DESC_PACK_RADIUS = (LANES // 2 - 3) // 2


def pack_factor(rmax: int) -> int:
    """Largest lane-packing factor whose segment holds a patch of radius
    ``rmax`` plus the 1-px gradient halo (2*(rmax+1)+1 lanes)."""
    width = 2 * (rmax + 1) + 1
    for pack in (3, 2):
        if width <= LANES // pack:
            return pack
    return 1


@functools.partial(jax.jit,
                   static_argnames=("rows", "block_k", "pack", "interpret"))
def orientation_hist_fused(values, ys0, xs0, par, rows: int,
                           block_k: int = 0, pack: int = 1,
                           interpret: bool = False, count=None):
    """values: [Hs, Ws] f32 row-stacked RAW Gaussian (or DoG) slab
    (ops/flatpyr.stack_pyramid, extra_rows >= rows); ys0/xs0: [K] i32
    aligned absolute window origins (stacked_origins); par: [K, NPAR] f32
    (see layout above).  ``pack``: keypoints per 128-lane compute window
    (pack_factor of the static radius bound).  ``count``: live keypoint
    count (valid-first order) — blocks past it are skipped, so runtime
    scales with the frame content, not the capacity.  Returns [K, 36] f32
    raw histograms (rows past ``count`` garbage)."""
    if not block_k:
        # Sublane-dim block sizes must be multiples of 8 AND of pack.
        block_k = 24 if pack == 3 else 8
    assert block_k % pack == 0 and block_k % 8 == 0
    k = ys0.shape[0]
    kp = -(-k // block_k) * block_k
    if kp != k:
        ys0, xs0, par = _pad_args(ys0, xs0, par, k, kp)
    cnt = jnp.full((1,), kp, jnp.int32) if count is None \
        else jnp.minimum(count, kp).astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(kp // block_k,),
        in_specs=[
            pl.BlockSpec((block_k, NPAR), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_k, _NBO), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, rows, DMA_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, block_k)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_ori_kernel, rows=rows, block_k=block_k,
                          n_kpts=kp, pack=pack),
        out_shape=jax.ShapeDtypeStruct((kp, _NBO), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(cnt, ys0, xs0, par, values)
    return out[:k]


# ---------------------------------------------------------------------------
# Descriptor: rotated 4x4x8 trilinear histogram
# ---------------------------------------------------------------------------


def _desc_kernel(cnt_ref, ys_ref, xs_ref, par_ref, src_ref, out_ref,
                 wins, sems, *,
                 rows: int, block_k: int, n_kpts: int, pack: int):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        _start_dma(cnt_ref, src_ref, ys_ref, xs_ref, wins, sems, 0, 0,
                   block_k, rows, n_kpts)

    @pl.when(i + 1 < nb)
    def _():
        _start_dma(cnt_ref, src_ref, ys_ref, xs_ref, wins, sems,
                   (i + 1) % 2, i + 1, block_k, rows, n_kpts)

    _wait_dma(cnt_ref, src_ref, ys_ref, xs_ref, wins, sems, i % 2, i,
              block_k, rows, n_kpts)

    seg = LANES // pack
    masks = _seg_masks(pack, seg)
    for g in range(block_k // pack):
        js = [g * pack + s for s in range(pack)]

        # Skip groups past the live count (valid-first order): their
        # out rows stay garbage, discarded downstream by the validity
        # mask.
        @pl.when(i * block_k + js[0] < cnt_ref[0])
        def _(js=js):
            _desc_group(par_ref, out_ref, wins, i % 2, js, rows, pack,
                        seg, masks)


def _desc_group(par_ref, out_ref, wins, slot, js, rows, pack, seg, masks):
    if pack == 1:
        win = wins[slot, js[0]]
        mag, ori = _grad_mag_ori(win)
        offy, offx, wy, wx = _axis_vectors(par_ref, js[0], rows)
        cos_t = par_ref[js[0], 9]
        sin_t = par_ref[js[0], 10]
        ang = par_ref[js[0], 11]
    else:
        win = _packed_window(wins, slot, js, par_ref, seg, masks)
        mag, ori = _grad_mag_ori(win)
        # Per-keypoint scalars as per-segment lane vectors (see
        # _ori_kernel's packed branch).
        li = jax.lax.broadcasted_iota(
            jnp.int32, (1, LANES), 1).astype(jnp.float32)
        ri = jax.lax.broadcasted_iota(
            jnp.int32, (rows, 1), 0).astype(jnp.float32)
        shift = [-float(s * seg) for s in range(pack)]
        offy = _seg_vec(par_ref, js, 0, masks) + ri      # [rows, LANES]
        offx = (_seg_vec(par_ref, js, 1, masks, shift)
                + _seg_vec(par_ref, js, 12, masks) + li)  # [1, LANES]
        ylo = _seg_vec(par_ref, js, 2, masks)
        yhi = _seg_vec(par_ref, js, 3, masks)
        xlo = _seg_vec(par_ref, js, 4, masks)
        xhi = _seg_vec(par_ref, js, 5, masks)
        es = _seg_vec(par_ref, js, 6, masks)
        rad = _seg_vec(par_ref, js, 7, masks)
        vld = _seg_vec(par_ref, js, 8, masks)
        my = (offy >= ylo) & (offy <= yhi) & (jnp.abs(offy) <= rad)
        mx = (offx >= xlo) & (offx <= xhi) & (jnp.abs(offx) <= rad)
        wy = jnp.where(my, jnp.exp(offy * offy * es), 0.0)
        wx = jnp.where(mx, jnp.exp(offx * offx * es) * vld, 0.0)
        cos_t = _seg_vec(par_ref, js, 9, masks)
        sin_t = _seg_vec(par_ref, js, 10, masks)
        ang = _seg_vec(par_ref, js, 11, masks)

    c_rot = offx * cos_t - offy * sin_t        # [rows, LANES]
    r_rot = offx * sin_t + offy * cos_t
    rbin = r_rot + (_D / 2 - 0.5)
    cbin = c_rot + (_D / 2 - 0.5)
    inb = (rbin > -1.0) & (rbin < float(_D)) \
        & (cbin > -1.0) & (cbin < float(_D))
    mag_w = jnp.where(inb, mag * (wy * wx), 0.0)

    # ori in [-180,180]; the mod folds it into [0, NBD).
    ob = (ori - ang) * (_NBD / 360.0)
    ob = ob - jnp.floor(ob * (1.0 / _NBD)) * _NBD
    vo = []
    for o in range(_NBD):
        od = jnp.abs(ob - float(o))
        vo.append(jnp.maximum(0.0, 1.0 - jnp.minimum(od, _NBD - od))
                  * mag_w)

    hr = [jnp.maximum(0.0, 1.0 - jnp.abs(rbin - float(r)))
          for r in range(_D)]
    hc = [jnp.maximum(0.0, 1.0 - jnp.abs(cbin - float(c)))
          for c in range(_D)]

    # out[(r*D+c)*NBD+o] = sum(hr_r * hc_c * vo_o): sublane-reduce
    # each bin to a [1, LANES] partial (cheap), stack all 128 into one
    # [128, LANES] matrix, then ONE lane reduction finishes every bin
    # (lane reductions are ~7x sublane reductions — never per-bin).
    cols = []
    for r in range(_D):
        for c in range(_D):
            t = hr[r] * hc[c]
            for o in range(_NBD):
                cols.append(jnp.sum(t * vo[o], axis=0, keepdims=True))
    m = jnp.concatenate(cols, axis=0)           # [128, LANES]
    if pack == 1:
        out_ref[js[0], :] = jnp.sum(m, axis=1)
    else:
        for s in range(pack):
            out_ref[js[s], :] = jnp.sum(
                jnp.where(masks[s], m, 0.0), axis=1)


@functools.partial(jax.jit,
                   static_argnames=("rows", "block_k", "pack", "interpret"))
def descriptor_fused(values, ys0, xs0, par, rows: int,
                     block_k: int = 8, pack: int = 1,
                     interpret: bool = False, count=None):
    """values/origins/par as orientation_hist_fused (par additionally
    carries cos_t, sin_t, ang).  ``count``: live keypoint count — see
    orientation_hist_fused.  ``pack``: keypoints per 128-lane compute
    window (pack=2 requires patch radius <= 30: 2*(r+1)+1 <= 64-lane
    segments).  Returns [K, 128] f32 raw descriptor histograms
    (pre-normalization, cell-major r, c, o — finalize_descriptor order;
    rows past ``count`` garbage)."""
    assert block_k % pack == 0 and block_k % 8 == 0
    k = ys0.shape[0]
    kp = -(-k // block_k) * block_k
    if kp != k:
        ys0, xs0, par = _pad_args(ys0, xs0, par, k, kp)
    cnt = jnp.full((1,), kp, jnp.int32) if count is None \
        else jnp.minimum(count, kp).astype(jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(kp // block_k,),
        in_specs=[
            pl.BlockSpec((block_k, NPAR), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((block_k, _D * _D * _NBD),
                               lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, rows, DMA_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, block_k)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_desc_kernel, rows=rows, block_k=block_k,
                          n_kpts=kp, pack=pack),
        out_shape=jax.ShapeDtypeStruct((kp, _D * _D * _NBD), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(cnt, ys0, xs0, par, values)
    return out[:k]
