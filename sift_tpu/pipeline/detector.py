"""The SIFT pipeline orchestrator — the public detect-and-compute API.

Equivalent capability to the reference's ``Detector``
(/root/reference/sift_cuda/interface/Detector.{hh,cu}):

* ctor + ``gpuWarmUpAndAllocate``  ->  ``SiftDetector(config)`` builds the
  static plan (octave shapes, blur operators, capacities) and traces/compiles
  one XLA program.  Static shapes + jit + XLA's buffer allocator replace the
  explicit preallocation (Detector.cu:17-131); the first call compiles
  (the reference's warm-up/graph-capture contract, doc/faq.md:3).
* ``detectAndCompute``             ->  ``detect_and_compute(image)``; the
  full pipeline is ONE jitted program (the CUDA-graph replay equivalent,
  with zero mid-pipeline host synchronization — the reference's pinned-memory
  count readback, Detector.cu:542-559, does not exist here).
* ``prev_descriptor`` rotation (Detector.cu:136-141) -> kept by the host
  wrapper for sequential matching.

Pipeline shape (TPU-first): detection/refinement run per octave (cheap,
shapes differ per octave), then keypoints of ALL octaves are compacted into
ONE fixed-capacity set and orientation + descriptors run as single global
batched passes over a flattened gradient pyramid (ops/flatpyr.py) — the
expensive per-keypoint work costs one capacity, not one per octave (the
reference instead launches per-octave kernels on round-robin streams,
Detector.cu:555-582).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sift_tpu.config import SiftConfig
from sift_tpu.core.types import Keypoints, SiftPlan, SiftResult, build_plan
from sift_tpu.ops import compact as C
from sift_tpu.ops import descriptor as D
from sift_tpu.ops import orientation as O
from sift_tpu.ops.flatpyr import (dense_gradients_packed,
                                  dense_gradients_padded, pad_pyramid,
                                  shift_copies)
from sift_tpu.ops.pyramid import dog_pyramid


def build_detect_fn(plan: SiftPlan, quant_mode: str = "opencv",
                    kpt_cap: Optional[int] = None):
    """Returns the pure function image [H, W] f32 -> SiftResult.

    ``kpt_cap`` bounds the INTERNAL keypoint capacity of the global
    orientation/descriptor passes (a capacity tier; defaults to
    num_features).  Outputs are always padded to num_features so every
    tier produces identical shapes; if a frame saturates the tier
    (count == kpt_cap) the caller should re-run a larger tier."""
    cfg = plan.config
    kcap = int(kpt_cap or cfg.num_features)

    def detect(image: jnp.ndarray) -> SiftResult:
        from sift_tpu.ops.flatpyr import resolve_gather_impl
        from sift_tpu.ops.pyramid import (gaussian_pyramid_padded,
                                          padded_content_views)
        from sift_tpu.ops.records import (candidates_from_records,
                                          detect_records_padded,
                                          finalize_walk,
                                          walk_records_positions)
        impl = resolve_gather_impl(cfg.gather_impl)
        # Padded-layout pyramid (content rows at [8, 8+h)): the zero
        # padding is baked into the band-blocked blur operators, so the
        # fused detect kernel reads it with no repacking copy; all
        # other consumers take lazy content views.
        gp = gaussian_pyramid_padded(plan, image)
        gauss = padded_content_views(plan, gp)

        # Dense detection: ONE fused pass per octave (DoG + extrema +
        # Newton records, kernels/fused_detect.py — the DoG volume is
        # never materialized), per-octave candidate compaction
        # (octave-major order, matching the reference's cross-octave
        # collection order, utils/CudaMemcpyUtils.cu:21-70), then ONE
        # fused Newton walk over all octaves' candidates.
        recs = [detect_records_padded(gp[o], plan.octaves[o].height,
                                      plan.octaves[o].width, cfg, impl)
                for o in range(cfg.num_octaves)]
        cands = [candidates_from_records(recs[o],
                                         plan.octaves[o].cand_cap)
                 for o in range(cfg.num_octaves)]
        st, rflat = walk_records_positions(recs, cands, cfg)

        # Global compaction: ONE fixed-capacity keypoint set across all
        # octaves (≙ collectKpts per octave + the cross-octave gather).
        # The walk's B/C planes (sub-pixel offsets, response) are only
        # gathered AFTER compaction — kcap rows, not candidate capacity.
        idx, val = C.stream_compact(st.ok, kcap)
        # ONE [N, 8] row-gather instead of 7 scalar [N] gathers: 1-D
        # gathers run element-at-a-time on TPU (~36 us per 5000-take);
        # row gathers move whole lanes and are ~free.
        from sift_tpu.ops.records import WalkState
        stm = jnp.stack([st.l, st.r, st.c, st.ok.astype(jnp.int32),
                         st.octv, st.fi], axis=1)
        stg = jnp.take(stm, idx, axis=0)
        stc = WalkState(l=stg[:, 0], r=stg[:, 1], c=stg[:, 2],
                        ok=stg[:, 3].astype(bool), octv=stg[:, 4],
                        fi=stg[:, 5])
        ref, koct = finalize_walk(rflat, stc, val, cfg)
        kx, ky, klyr, kxi = ref.x, ref.y, ref.layer, ref.xi
        ksize, kresp = ref.size, ref.response

        # Dense gradients once per frame on the padded uniform stack
        # (window gathers need uniform octave shapes); lane-shifted copies
        # shrink per-keypoint windows to 128 lanes.  The descriptor reads
        # a PACKED (mag, ori) slab — one gather per window; orientation
        # keeps the full-precision pair (its 1-degree parity gate is
        # sensitive to quantization).
        # The fused kernels' copy-selected window contract holds for
        # patch radius <= 46 (patch + halo + the 32-lane residual offset
        # within one 128-lane DMA, ops/flatpyr.stacked_origins); the flat
        # path's 128-lane shifted-copy contract needs radius <= 47.
        # Legal configs with larger sigma fall back to unshifted 256-lane
        # windows instead of silently dropping patch-edge pixels.
        from sift_tpu.kernels.window_gather import window_rows
        from sift_tpu.ops.descriptor import max_descr_radius
        from sift_tpu.ops.flatpyr import stack_pyramid
        from sift_tpu.ops.orientation import max_ori_radius
        rmax = max(max_descr_radius(cfg), max_ori_radius(cfg))
        fused = rmax <= 46 and impl in ("pallas", "pallas_interpret")
        interp = impl == "pallas_interpret"
        # The DoG pyramid exists only for the non-default DoG
        # orientation source (the fused detect path never builds it).
        dogs = dog_pyramid(gauss) \
            if cfg.orientation_source == "dog" else None

        if fused:
            # Fused-Pallas path (TPU): the kernels DMA RAW pixel windows
            # off ONE row-stacked lane-shifted-copy slab (keypoint
            # layers 1..L only) and compute gradients + histograms in
            # VMEM — no dense gradient slabs (kernels/fused_stages.py).
            nl = cfg.num_octave_layers
            margin = window_rows(rmax)
            # 2 lane-shifted copies instead of 4 when the slab is wide
            # enough for 256-lane unpacked descriptor windows: halves
            # the slab's memory and the expansion pass's bandwidth
            # (0.37 -> 0.19 ms at 1920x1200).  The packed kernels roll
            # patches to segment starts regardless of offset; the
            # unpacked descriptor class rolls its 256-lane window
            # (ops/descriptor.compute_descriptors_fused).
            wp0 = -(-max(plan.octaves[0].width, 128) // 128) * 128
            ncop = 2 if wp0 >= 256 else 4
            slab_g = stack_pyramid(gauss, extra_rows=margin,
                                   copies=ncop, layer_lo=1,
                                   layer_hi=nl + 1, expand_impl=impl)
            ori_slab = slab_g if cfg.orientation_source == "gaussian" \
                else stack_pyramid(dogs, extra_rows=margin,
                                   copies=ncop, layer_lo=1,
                                   layer_hi=nl + 1, expand_impl=impl)
            # Live counts let the kernels skip whole blocks past the
            # frame's actual keypoint count (compactions are valid-first).
            n_kp = jnp.sum(val.astype(jnp.int32))
            hist = O.orientation_histograms_fused(
                ori_slab, koct, kx, ky, klyr, ksize, val, cfg,
                interpret=interp, count=n_kp)
        else:
            fits_128 = rmax <= 47
            shift = shift_copies if fits_128 else (lambda p: p)
            padded_gauss = pad_pyramid(gauss)
            gradf = shift(dense_gradients_packed(padded_gauss))
            if cfg.orientation_source == "gaussian":
                o_mag, o_ori = dense_gradients_padded(padded_gauss)
            else:
                o_mag, o_ori = dense_gradients_padded(pad_pyramid(dogs))
            o_mag, o_ori = shift(o_mag), shift(o_ori)
            hist = O.orientation_histograms_flat(
                o_mag, o_ori, koct, kx, ky, klyr, ksize, val, cfg)

        angles, peaks = O.orientation_peaks(hist, val, cfg)

        # Expansion: up to 36 oriented copies per keypoint
        # (SiftOps.cu:338-373), flattened and compacted to num_features.
        nb = angles.shape[1]
        eidx, evalid = C.stream_compact(peaks.reshape(-1), kcap)
        src = eidx // nb

        # Packed row-gathers (see the WalkState gather above): one f32
        # and one i32 matrix instead of 7 scalar gathers, and the angle
        # comes from a row-gather of [kcap, nb] + a one-hot bin select
        # instead of a scalar gather over the flattened [kcap*nb] array.
        fm = jnp.take(jnp.stack([kx, ky, kxi, ksize, kresp], axis=1),
                      src, axis=0)
        im = jnp.take(jnp.stack([klyr, koct], axis=1), src, axis=0)
        arow = jnp.take(angles, src, axis=0)            # [kcap, nb]
        bsel = (eidx % nb)[:, None] == jnp.arange(nb, dtype=jnp.int32)
        kps = Keypoints(
            x=fm[:, 0], y=fm[:, 1],
            layer=im[:, 0],
            octave=im[:, 1],
            xi=fm[:, 2], size=fm[:, 3],
            response=fm[:, 4],
            angle=jnp.sum(jnp.where(bsel, arow, 0.0), axis=1),
            valid=evalid)

        if fused:
            desc, nrm2 = D.compute_descriptors_fused(
                slab_g, kps.octave, kps.x, kps.y, kps.layer, kps.size,
                kps.angle, kps.valid, cfg, interpret=interp,
                count=jnp.sum(evalid.astype(jnp.int32)))
        else:
            desc, nrm2 = D.compute_descriptors_flat(
                gradf, kps.octave, kps.x, kps.y, kps.layer, kps.size,
                kps.angle, kps.valid, cfg)
        desc = D.quantize_descriptor(desc, nrm2, quant_mode)
        desc = jnp.where(evalid[:, None], desc, 0.0)
        if quant_mode == "opencv" and cfg.descriptor_dtype == "uint8":
            # Integer-quantized values fit one byte; the matcher's bf16
            # path matches bit-identically (config.descriptor_dtype).
            desc = desc.astype(jnp.uint8)

        if cfg.upscale:
            # OpenCV firstOctave = -1 final adjustment: halve coords/size,
            # octave index shifts down by one.
            kps = kps._replace(x=kps.x * 0.5, y=kps.y * 0.5,
                               size=kps.size * 0.5, octave=kps.octave - 1)
        if kcap < cfg.num_features:
            # Pad tiered outputs to the uniform num_features shape.
            pad = cfg.num_features - kcap

            def padf(a):
                return jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])

            kps = Keypoints(*[padf(f) for f in kps])
            desc = padf(desc)
        return SiftResult(keypoints=kps, descriptors=desc,
                          count=kps.count().astype(jnp.int32),
                          raw_count=jnp.sum(val.astype(jnp.int32)))

    return detect


class SiftDetector:
    """Host-side convenience wrapper (≙ the reference ``Detector`` object).

    Keeps ``prev_descriptors``/``prev_result`` for sequential matching
    (≙ prev_descriptor rotation, Detector.cu:136-141)."""

    def __init__(self, config: SiftConfig, quant_mode: str = "opencv",
                 jit: bool = True, tiers: tuple = ()):
        """``tiers``: optional ascending internal keypoint-capacity tiers
        (e.g. (1024, 2048)).  Tier selection is automatic per frame
        (scaled previous count, with an exact saturation fallback that
        re-runs the full program), and every tier pads its output to
        num_features so downstream shapes never change.

        NOTE (measured, tools/benchmark.py --tiers, v5e @752x480):
        count-gated kernels made tiers a net LOSS — the full-capacity
        program runs 1.09 ms vs 1.69/1.71 ms for tiers 1024/2048 (the
        per-keypoint stages already scale with the frame's live count,
        so a tier only shrinks capacity-shaped glue while adding output
        padding).  Tiers remain supported for API stability; leave them
        off unless a future workload shows capacity-bound glue."""
        self.config = config
        self.plan = build_plan(config)
        wrap = jax.jit if jit else (lambda f: f)
        self._fn = wrap(build_detect_fn(self.plan, quant_mode))
        self.tiers = tuple(int(t) for t in sorted(tiers)
                           if t < config.num_features)
        self._tier_fns = {t: wrap(build_detect_fn(self.plan, quant_mode, t))
                          for t in self.tiers}
        self._last_count: Optional[int] = None
        self.prev_result: Optional[SiftResult] = None  # frame t-1
        self.last_result: Optional[SiftResult] = None  # frame t

    def warm_up(self):
        """Compile every program — full capacity AND all tiers — so no
        frame inside a tracking loop pays a mid-sequence compile
        (≙ gpuWarmUpAndAllocate + graph capture).  The scalar host
        readback guarantees device completion even on transports where
        block_until_ready acknowledges dispatch early."""
        img = jnp.zeros((self.config.height, self.config.width), jnp.float32)
        res = self._fn(img)
        for fn in self._tier_fns.values():
            fn(img)
        float(jnp.sum(res.descriptors[0]))
        return True

    def _pick_tier(self) -> Optional[int]:
        """Smallest tier with 1.5x headroom over the previous frame's
        count; None = full capacity (also for the first frame)."""
        if self._last_count is None or not self.tiers:
            return None
        need = max(64, int(self._last_count * 1.5))
        for t in self.tiers:
            if t >= need:
                return t
        return None

    def detect_and_compute(self, image) -> SiftResult:
        image = jnp.asarray(image, jnp.float32)
        if image.shape != (self.config.height, self.config.width):
            raise ValueError(
                f"image shape {image.shape} != configured "
                f"{(self.config.height, self.config.width)}")
        tier = self._pick_tier()
        if tier is None:
            result = self._fn(image)
        else:
            result = self._tier_fns[tier](image)
            # Saturated tier -> a compaction may have truncated; re-run at
            # full capacity for exact results.  Both compactions (keypoint
            # stage and post-expansion) run at the tier, so test both
            # counts — the final count alone can sit below the tier while
            # the keypoint-stage compaction truncated.
            if max(int(result.count), int(result.raw_count)) >= tier:
                result = self._fn(image)
        if self.tiers:
            # Host count readback steers the next frame's tier (the only
            # host sync; ≙ the reference's pinned-count sync,
            # Detector.cu:542-559).
            self._last_count = int(result.count)
        self.prev_result = self.last_result
        self.last_result = result
        return result

    @property
    def prev_descriptors(self):
        """Descriptors of the frame before the most recent one
        (≙ Detector::prev_descriptor, Detector.hh:54-62)."""
        return None if self.prev_result is None \
            else self.prev_result.descriptors
