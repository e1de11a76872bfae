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
* dynamic-trip execution: ONE grid step, an internal fori_loop over
  ceil(live_count / block_k) blocks only (unused capacity costs zero —
  the CUDA count-sized-launch equivalent), an NBUF-slot window-DMA ring
  with a single shared semaphore per slot (one scalar wait per block
  instead of block_k), and par/out resident in VMEM for the whole call
  (no per-block pipeline copies).

The numerical contracts match ops/orientation.py / ops/descriptor.py
exactly (same masks, same hat identities); tests gate the two paths
against each other in interpret mode.

Window contract: the source is a row-STACKED raw pyramid with
128/copies-lane-shifted copies (ops/flatpyr.stack_pyramid — every kept
(octave, layer) plane at natural height; only the layers keypoints
reference are kept).  Copy selection (ops/flatpyr.stacked_origins)
places each keypoint's patch at a lane offset < 128/copies inside an
8-row/128-lane aligned DMA block.  Production uses copies=2 (slab
memory/bandwidth halved): packed windows roll patches to their segment
starts (any offset), and UNPACKED windows — whose patch + offset can
exceed 128 lanes — DMA 256 lanes and roll the patch to lane 0 (the
wrap lands past the 128-lane slice, so uncapped-radius masks can never
read a wrapped pixel; that hazard is what forbids rolling 128-lane
unpacked windows, which is why copies=4 slabs serve them unrolled,
offset < 32).
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


# Default DMA ring depth: blocks in flight.  The dynamic-trip kernels
# (below) run a fori_loop over ceil(live_count / block_k) blocks only;
# nbuf - 1 blocks' window DMAs stay outstanding while one block computes.
# Per-call override via the wrappers' ``nbuf`` argument (v5e sweep at
# 752x480: orientation wants 8, descriptor 4).
NBUF = 4


def _start_block(ys_ref, xs_ref, src_ref, wins, sems, slot, base,
                 block_k, rows, lanes=DMA_LANES):
    """Issue the block at keypoint offset ``base``'s block_k window DMAs
    into ring slot ``slot``.  All of a slot's copies share ONE semaphore
    (sems[slot]) so the consumer can wait for the whole slot in a single
    scalar op.  No per-copy bounds branch: the caller only starts blocks
    below the live block count, and padded tail entries carry clamped
    origins (a valid slab window; their compute output is garbage past
    the live count, which the downstream validity mask discards)."""
    for j in range(block_k):
        ys = pl.multiple_of(ys_ref[base + j], SUBLANE)
        xs = pl.multiple_of(xs_ref[base + j], LANES)
        pltpu.make_async_copy(
            src_ref.at[pl.ds(ys, rows), pl.ds(xs, lanes)],
            wins.at[slot, j],
            sems.at[slot]).start()


def _wait_slot(wins, sems, slot):
    """ONE wait for a whole slot: the descriptor's dst is the full
    [block_k, rows, LANES] slot buffer, so the awaited byte count equals
    the sum of the slot's block_k window copies (dma_wait's count comes
    from the dst ref shape) — 1 scalar op instead of block_k waits."""
    pltpu.make_async_copy(wins.at[slot], wins.at[slot],
                          sems.at[slot]).wait()


def _seg_masks(pack: int, seg: int):
    """[1, LANES] bool lane masks of the ``pack`` packing segments."""
    li = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    return [(li >= s * seg) & (li < (s + 1) * seg) for s in range(pack)]


def _segsel(pack: int, seg: int):
    """Constant [pack, LANES] f32 segment-selection matrix:
    segsel[s, l] = 1 where lane l belongs to packing segment s."""
    li = jax.lax.broadcasted_iota(jnp.int32, (pack, LANES), 1)
    si = jax.lax.broadcasted_iota(jnp.int32, (pack, LANES), 0)
    return (li // seg == si).astype(jnp.float32)


def _seg_table(par_ref, jg0, pack, segsel):
    """ALL per-keypoint par columns as per-segment lane vectors in ONE
    tiny MXU contraction: T[c, l] = par[jg0 + (l // seg), c].  Row c of
    T is the [1, LANES] "segment vector" of par column c — the value of
    the keypoint owning each lane's packing segment.  One [pack, LANES]
    vector load + one dot per GROUP replaces ~12 per-column load/roll
    chains (and the per-[1,1]-broadcast Mosaic limits entirely)."""
    p = par_ref[pl.ds(jg0, pack), :]            # [pack, LANES(cols)]
    # precision=HIGHEST: the default MXU precision truncates the par
    # INPUT values to bf16 before the one-hot contraction — integer
    # bounds > 256 (yhi at 752x480: up to ~958) and cos/sin/ang all
    # lose mantissa.  HIGHEST keeps full f32; the matmul is tiny.
    return jax.lax.dot_general(p, segsel, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _trow(t, col, shift_lanes=None):
    """[1, LANES] segment vector of par column ``col`` from a _seg_table
    result, plus an optional additive constant lane vector."""
    v = t[col:col + 1, :]
    if shift_lanes is not None:
        v = v + shift_lanes
    return v


def _packed_window(wins, slot, jl, jg, sh_ref, vld, seg, masks):
    """Merge ``len(jl)`` keypoints' patches into ONE [rows, LANES] window,
    patch s starting at lane s*seg (rolled there from its DMA offset —
    the combined roll shift is precomputed host-side and prefetched as
    the int32 SMEM array ``sh_ref``).  Keypoints share every subsequent
    vector op (gradients, atan2, histogram passes) — the per-keypoint
    cost of the whole compute chain divides by the pack factor.  Patch +
    gradient halo must fit the segment: 2*(radius+1)+1 <= seg.  ``jl``:
    static slot-local window indices; ``jg``: dynamic global keypoint
    indices; ``vld``: [1, LANES] per-segment validity vector (_trow of
    par column 8).

    Invalid keypoints' segments are zeroed (a padded tail entry's window
    holds unrelated slab pixels — a NaN there would leak into a neighbor
    segment's masked halo through the gradient rolls, and NaN * 0
    poisons the shared lane reductions).

    pack == 1 windows are NOT rolled (offx stays DMA-window-relative,
    par column 1 alone): rolling the patch to lane 0 wraps the window's
    first ``off`` lanes to the high end, where a keypoint whose TRUE
    radius exceeds the static window bound (par col 7 is deliberately
    uncapped, matching the flat path's masks) would pass the |offx| <=
    radius test with the wrong pixels at the wrong offsets.  Packed
    segments never wrap: off + lane-in-segment < 32 + 64 < 128."""
    ok = vld > 0.0
    if len(jl) == 1:
        w = wins[slot, jl[0]]
        if w.shape[1] > LANES:
            # 2-copy slab: the patch's lane offset can reach 128/copies
            # - 1 = 63, so a 128-lane window cannot contain a wide
            # pack-1 patch.  The window is DMA'd at 256 lanes and
            # rolled so the patch starts at lane 0 (sh = (256 - off) %
            # 256); wrapped lanes land at >= 256 - off > 128 and are
            # cut by the slice, so the uncapped-radius masks can never
            # read them (the wrap hazard that forbids rolling 128-lane
            # pack-1 windows).
            w = pltpu.roll(w, sh_ref[jg[0]], 1)[:, :LANES]
        return jnp.where(ok, w, 0.0)
    win = None
    for s, (j, g) in enumerate(zip(jl, jg)):
        w = pltpu.roll(wins[slot, j], sh_ref[g], 1)
        w = jnp.where(masks[s] & ok, w, 0.0)
        win = w if win is None else win + w
    return win


# ---------------------------------------------------------------------------
# Orientation: 36-bin Gaussian-weighted gradient histograms
# ---------------------------------------------------------------------------


def _ori_kernel(cnt_ref, ys_ref, xs_ref, sh_ref, par_ref, src_ref,
                out_ref, wins, sems, *,
                rows: int, block_k: int, n_kpts: int, pack: int,
                nbuf: int):
    """Dynamic-trip driver: ONE grid step, fori_loop over only the LIVE
    blocks (ceil(count / block_k)) starting at keypoint offset
    cnt_ref[1] (classed invocations share one partitioned array set —
    see ops/descriptor.compute_descriptors_fused).  Unused capacity
    costs nothing — no skipped grid steps, no per-block par/out pipeline
    copies (par is a VMEM-resident table read via [1,1] vector loads;
    out is a full-VMEM buffer written at dynamic offsets).  NBUF-slot
    DMA ring keeps NBUF - 1 blocks' window copies in flight behind the
    one being computed."""
    nblocks = (cnt_ref[0] + block_k - 1) // block_k
    start = cnt_ref[1]

    for b in range(nbuf - 1):
        @pl.when(b < nblocks)
        def _(b=b):
            _start_block(ys_ref, xs_ref, src_ref, wins, sems, b,
                         start + b * block_k, block_k, rows)

    seg = LANES // pack
    masks = _seg_masks(pack, seg)
    segsel = _segsel(pack, seg)

    def body(i, carry):
        slot = jax.lax.rem(i, nbuf)

        @pl.when(i + nbuf - 1 < nblocks)
        def _():
            _start_block(ys_ref, xs_ref, src_ref, wins, sems,
                         jax.lax.rem(i + nbuf - 1, nbuf),
                         start + (i + nbuf - 1) * block_k,
                         block_k, rows)

        _wait_slot(wins, sems, slot)
        base = start + i * block_k
        for g in range(block_k // pack):
            jl = [g * pack + s for s in range(pack)]
            jg = [base + j for j in jl]
            _ori_group(par_ref, sh_ref, out_ref, wins, slot, jl, jg,
                       rows, pack, seg, masks, segsel)
        return carry

    jax.lax.fori_loop(0, nblocks, body, 0, unroll=False)


def _ori_group(par_ref, sh_ref, out_ref, wins, slot, jl, jg, rows, pack,
               seg, masks, segsel):
    t = _seg_table(par_ref, jg[0], pack, segsel)
    vld = _trow(t, 8)
    win = _packed_window(wins, slot, jl, jg, sh_ref, vld, seg, masks)
    mag, ori = _grad_mag_ori(win)
    # Per-keypoint values as per-segment lane vectors; offx is
    # lane-relative to each patch's segment start (dx0 is DMA-
    # window-lane-0 relative — add the patch offset, col 12).
    li = jax.lax.broadcasted_iota(
        jnp.int32, (1, LANES), 1).astype(jnp.float32)
    ri = jax.lax.broadcasted_iota(
        jnp.int32, (rows, 1), 0).astype(jnp.float32)
    si = jax.lax.broadcasted_iota(
        jnp.int32, (1, LANES), 1) // seg
    seg_starts = (si * seg).astype(jnp.float32)     # s*seg per lane
    offy = _trow(t, 0) + ri                         # [rows, LANES]
    # Unpacked windows are unrolled (see _packed_window): offx is
    # window-lane-0-relative, no patch-offset shift.
    offx = (_trow(t, 1) + li if pack == 1
            else _trow(t, 1, _trow(t, 12) - seg_starts) + li)
    es = _trow(t, 6)
    rad = _trow(t, 7)
    my = ((offy >= _trow(t, 2)) & (offy <= _trow(t, 3))
          & (jnp.abs(offy) <= rad))
    mx = ((offx >= _trow(t, 4)) & (offx <= _trow(t, 5))
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
        out_ref[pl.ds(jg[0], 1), :] = jnp.sum(m, axis=1)[None]
    else:
        for s in range(pack):
            out_ref[pl.ds(jg[s], 1), :] = jnp.sum(
                jnp.where(masks[s], m, 0.0), axis=1)[None]


def _pad_args(ys0, xs0, par, k, kp):
    pad = kp - k
    ys0 = jnp.concatenate([ys0, jnp.zeros((pad,), ys0.dtype)])
    xs0 = jnp.concatenate([xs0, jnp.zeros((pad,), xs0.dtype)])
    par = jnp.concatenate([par, jnp.zeros((pad, par.shape[1]),
                                          par.dtype)])
    return ys0, xs0, par


def _pad_par_lanes(par):
    """Lane-pad par [K, NPAR] -> [K, LANES] so _seg_table can load whole
    [pack, LANES] rows for its one-hot MXU contraction."""
    return jnp.pad(par, ((0, 0), (0, LANES - par.shape[1])))


def _roll_shifts(par, pack, start=0, win_lanes=LANES):
    """Per-keypoint combined lane-roll shift for _packed_window,
    precomputed host-side and prefetched to SMEM (int32): shift =
    (LANES - dma_offset + segment_index * seg) % LANES, where a
    keypoint's segment index is its position within its pack group.
    ``start``: keypoint offset of the kernel's first block (classed
    invocations) — group slots count from there.  Wide (256-lane)
    pack-1 windows roll the patch to lane 0: shift = (256 - off) % 256.
    """
    kp = par.shape[0]
    off = par[:, 12].astype(jnp.int32)
    if pack == 1 and win_lanes > LANES:
        return (win_lanes - off) % win_lanes
    seg = LANES // pack
    s = jnp.mod(jnp.arange(kp, dtype=jnp.int32) - start, pack)
    return (LANES - off + s * seg) % LANES


def _clamp_origins(ys0, xs0, values, rows, lanes=DMA_LANES):
    """Clamp DMA origins into the slab (alignment-preserving).  The
    dynamic-trip kernels issue every window DMA in a live block without
    per-copy validity branches, so an INVALID entry inside the last live
    block (its coordinates may be arbitrary garbage) must still address
    readable memory; its compute output is discarded by the validity
    mask."""
    ymax = max((values.shape[0] - rows) // SUBLANE * SUBLANE, 0)
    xmax = max((values.shape[1] - lanes) // LANES * LANES, 0)
    return (jnp.clip(ys0, 0, ymax).astype(jnp.int32),
            jnp.clip(xs0, 0, xmax).astype(jnp.int32))


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
                   static_argnames=("rows", "block_k", "pack", "interpret",
                                    "nbuf"))
def orientation_hist_fused(values, ys0, xs0, par, rows: int,
                           block_k: int = 0, pack: int = 1,
                           interpret: bool = False, count=None,
                           nbuf: int = 0):
    """values: [Hs, Ws] f32 row-stacked RAW Gaussian (or DoG) slab
    (ops/flatpyr.stack_pyramid, extra_rows >= rows); ys0/xs0: [K] i32
    aligned absolute window origins (stacked_origins); par: [K, NPAR] f32
    (see layout above).  ``pack``: keypoints per 128-lane compute window
    (pack_factor of the static radius bound).  ``count``: live keypoint
    count (valid-first order) — the kernel's internal loop runs
    ceil(count / block_k) blocks, so runtime scales with the frame
    content; unused capacity costs nothing.  Returns [K, 36] f32 raw
    histograms (rows past ``count`` garbage)."""
    if not block_k:
        # Sublane-dim block sizes must be multiples of 8 AND of pack.
        # Larger blocks amortize the per-block scalar path + DMA issue
        # (v5e sweep at 1600x900, scripts/kernel_bench.py: 48 beats 24
        # by 11%; 96 regresses — VMEM pressure stalls the ring).
        block_k = 48 if pack == 3 else 16
    nbuf = nbuf or 8
    assert block_k % pack == 0 and block_k % 8 == 0
    k = ys0.shape[0]
    kp = -(-k // block_k) * block_k
    ys0, xs0 = _clamp_origins(ys0, xs0, values, rows)
    par = _pad_par_lanes(par)
    if kp != k:
        ys0, xs0, par = _pad_args(ys0, xs0, par, k, kp)
    sh = _roll_shifts(par, pack)
    cnt = jnp.stack([
        jnp.asarray(kp, jnp.int32) if count is None
        else jnp.minimum(count, kp).astype(jnp.int32),
        jnp.zeros((), jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            # par: full VMEM residence, [1,1] vector loads in-kernel.
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, block_k, rows, DMA_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_ori_kernel, rows=rows, block_k=block_k,
                          n_kpts=kp, pack=pack,
                          nbuf=nbuf),
        out_shape=jax.ShapeDtypeStruct((kp, _NBO), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(cnt, ys0, xs0, sh, par, values)
    return out[:k]


# ---------------------------------------------------------------------------
# Descriptor: rotated 4x4x8 trilinear histogram
# ---------------------------------------------------------------------------


def _desc_kernel(cnt_ref, ys_ref, xs_ref, sh_ref, par_ref, src_ref,
                 out_ref, wins, sems, *,
                 rows: int, block_k: int, n_kpts: int, pack: int,
                 nbuf: int, win_lanes: int = DMA_LANES):
    """Dynamic-trip driver — see _ori_kernel."""
    nblocks = (cnt_ref[0] + block_k - 1) // block_k
    start = cnt_ref[1]

    for b in range(nbuf - 1):
        @pl.when(b < nblocks)
        def _(b=b):
            _start_block(ys_ref, xs_ref, src_ref, wins, sems, b,
                         start + b * block_k, block_k, rows, win_lanes)

    seg = LANES // pack
    masks = _seg_masks(pack, seg)
    segsel = _segsel(pack, seg)

    def body(i, carry):
        slot = jax.lax.rem(i, nbuf)

        @pl.when(i + nbuf - 1 < nblocks)
        def _():
            _start_block(ys_ref, xs_ref, src_ref, wins, sems,
                         jax.lax.rem(i + nbuf - 1, nbuf),
                         start + (i + nbuf - 1) * block_k,
                         block_k, rows, win_lanes)

        _wait_slot(wins, sems, slot)
        base = start + i * block_k
        for g in range(block_k // pack):
            jl = [g * pack + s for s in range(pack)]
            jg = [base + j for j in jl]
            _desc_group(par_ref, sh_ref, out_ref, wins, slot, jl, jg,
                        rows, pack, seg, masks, segsel,
                        wide=win_lanes > LANES)
        return carry

    jax.lax.fori_loop(0, nblocks, body, 0, unroll=False)


def _desc_group(par_ref, sh_ref, out_ref, wins, slot, jl, jg, rows,
                pack, seg, masks, segsel, wide=False):
    t = _seg_table(par_ref, jg[0], pack, segsel)
    vld = _trow(t, 8)
    win = _packed_window(wins, slot, jl, jg, sh_ref, vld, seg, masks)
    mag, ori = _grad_mag_ori(win)
    # Per-keypoint values as per-segment lane vectors (see _ori_group).
    li = jax.lax.broadcasted_iota(
        jnp.int32, (1, LANES), 1).astype(jnp.float32)
    ri = jax.lax.broadcasted_iota(
        jnp.int32, (rows, 1), 0).astype(jnp.float32)
    si = jax.lax.broadcasted_iota(
        jnp.int32, (1, LANES), 1) // seg
    seg_starts = (si * seg).astype(jnp.float32)
    offy = _trow(t, 0) + ri                          # [rows, LANES]
    # pack-1 windows from a 4-copy slab are unrolled (offx relative to
    # DMA lane 0); wide (256-lane, 2-copy slab) pack-1 windows are
    # rolled so the patch starts at lane 0 (offx shifts by the patch
    # offset, col 12).  Packed windows roll to segment starts.
    if pack == 1:
        offx = (_trow(t, 1, _trow(t, 12)) if wide else _trow(t, 1)) + li
    else:
        offx = _trow(t, 1, _trow(t, 12) - seg_starts) + li
    es = _trow(t, 6)
    rad = _trow(t, 7)
    my = ((offy >= _trow(t, 2)) & (offy <= _trow(t, 3))
          & (jnp.abs(offy) <= rad))
    mx = ((offx >= _trow(t, 4)) & (offx <= _trow(t, 5))
          & (jnp.abs(offx) <= rad))
    wy = jnp.where(my, jnp.exp(offy * offy * es), 0.0)
    wx = jnp.where(mx, jnp.exp(offx * offx * es) * vld, 0.0)
    cos_t = _trow(t, 9)
    sin_t = _trow(t, 10)
    ang = _trow(t, 11)

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
            hrc = hr[r] * hc[c]
            for o in range(_NBD):
                cols.append(jnp.sum(hrc * vo[o], axis=0, keepdims=True))
    m = jnp.concatenate(cols, axis=0)           # [128, LANES]
    if pack == 1:
        out_ref[pl.ds(jg[0], 1), :] = jnp.sum(m, axis=1)[None]
    else:
        for s in range(pack):
            out_ref[pl.ds(jg[s], 1), :] = jnp.sum(
                jnp.where(masks[s], m, 0.0), axis=1)[None]


@functools.partial(jax.jit,
                   static_argnames=("rows", "block_k", "pack", "interpret",
                                    "nbuf", "win_lanes"))
def descriptor_fused(values, ys0, xs0, par, rows: int,
                     block_k: int = 16, pack: int = 1,
                     interpret: bool = False, count=None, start=None,
                     nbuf: int = 0, win_lanes: int = DMA_LANES):
    """values/origins/par as orientation_hist_fused (par additionally
    carries cos_t, sin_t, ang).  ``count``: live keypoint count — see
    orientation_hist_fused.  ``pack``: keypoints per 128-lane compute
    window (pack=2 requires patch radius <= 30: 2*(r+1)+1 <= 64-lane
    segments).  ``start``: traced keypoint offset of the first live
    block — radius-classed invocations share ONE partitioned array set
    and each processes rows [start, start+count) (the caller guarantees
    start+count <= K and that every row is DMA-safe — clamped origins,
    valid flag 0 on dead rows).  Returns [K, 128] f32 raw descriptor
    histograms (pre-normalization, cell-major r, c, o — finalize_
    descriptor order; rows outside [start, start+count) garbage)."""
    assert block_k % pack == 0 and block_k % 8 == 0
    assert win_lanes == DMA_LANES or pack == 1
    nbuf = nbuf or NBUF
    k = ys0.shape[0]
    kp = -(-k // block_k) * block_k
    if start is not None:
        # The last live block may run past start+count by block_k-1
        # rows; one extra block of padding keeps every read in-bounds.
        kp += block_k
    ys0, xs0 = _clamp_origins(ys0, xs0, values, rows, win_lanes)
    par = _pad_par_lanes(par)
    if kp != k:
        ys0, xs0, par = _pad_args(ys0, xs0, par, k, kp)
    sh = _roll_shifts(par, pack, 0 if start is None else start,
                      win_lanes)
    cnt = jnp.stack([
        jnp.asarray(kp, jnp.int32) if count is None
        else jnp.minimum(count, kp).astype(jnp.int32),
        jnp.zeros((), jnp.int32) if start is None
        else jnp.asarray(start, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, block_k, rows, win_lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_desc_kernel, rows=rows, block_k=block_k,
                          n_kpts=kp, pack=pack, nbuf=nbuf,
                          win_lanes=win_lanes),
        out_shape=jax.ShapeDtypeStruct((kp, _D * _D * _NBD), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(cnt, ys0, xs0, sh, par, values)
    return out[:k]
