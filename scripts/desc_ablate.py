"""Ablation micro-bench of the fused descriptor kernel: where does the
per-keypoint time go?  Monkeypatches fused_stages._desc_group with
progressively truncated bodies (jax.clear_caches() between variants —
descriptor_fused is jit-cached) and times descriptor_fused on the real
bench-image keypoint load.

Usage: python scripts/desc_ablate.py
"""

import sys

sys.path.insert(0, ".")

from sift_tpu.perf.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import sift_tpu.kernels.fused_stages as FS
from sift_tpu.config import SIFT_IMG_BORDER, SiftConfig
from sift_tpu.core.types import build_plan
from sift_tpu.kernels.window_gather import window_rows
from sift_tpu.ops import compact as C
from sift_tpu.ops import descriptor as D
from sift_tpu.ops import orientation as O
from sift_tpu.ops.descriptor import max_descr_radius
from sift_tpu.ops.flatpyr import stack_pyramid
from sift_tpu.ops.orientation import max_ori_radius
from sift_tpu.ops.peaks import find_candidates
from sift_tpu.ops.pyramid import dog_pyramid, gaussian_pyramid
from sift_tpu.ops.refine_dense import refine_keypoints_dense_all
from sift_tpu.perf.benchimg import bench_image
from sift_tpu.perf.timing import measure_ms

_D = FS._D
_NBD = FS._NBD
pl = FS.pl


def _store(out_ref, jg, v):
    for g in jg:
        out_ref[pl.ds(g, 1), :] = v


def _group_dma_only(par_ref, sh_ref, out_ref, wins, slot, jl, jg, rows,
                    pack, seg, masks):
    s = jnp.sum(sum(wins[slot, j] for j in jl), axis=0, keepdims=True)
    _store(out_ref, jg, s)


def _group_rolls(par_ref, sh_ref, out_ref, wins, slot, jl, jg, rows,
                 pack, seg, masks):
    win = FS._packed_window(wins, slot, jl, jg, sh_ref, par_ref, seg,
                            masks)
    _store(out_ref, jg, jnp.sum(win, axis=0, keepdims=True))


def _group_parreads(par_ref, sh_ref, out_ref, wins, slot, jl, jg, rows,
                    pack, seg, masks):
    """All 12 segment vectors + packed window, no gradient/bin math."""
    win = FS._packed_window(wins, slot, jl, jg, sh_ref, par_ref, seg,
                            masks)
    acc = None
    for col in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11):
        v = FS._seg_vec(par_ref, jg, col, masks)
        acc = v if acc is None else acc + v
    _store(out_ref, jg,
           jnp.sum(win, axis=0, keepdims=True) + acc)


def main():
    w, h, cap = 752, 480, 5000
    cfg = SiftConfig(width=w, height=h, num_features=cap)
    plan = build_plan(cfg)
    img = jax.device_put(jnp.asarray(bench_image(h, w), jnp.float32))
    rmax = max(max_descr_radius(cfg), max_ori_radius(cfg))

    def prefix(image):
        gauss = gaussian_pyramid(plan, image)
        dogs = dog_pyramid(gauss)
        cands = [find_candidates(dogs[o], cfg.peak_threshold,
                                 SIFT_IMG_BORDER, plan.octaves[o].cand_cap)
                 for o in range(cfg.num_octaves)]
        ref, roct = refine_keypoints_dense_all(dogs, cands, cfg)
        idx, val = C.stream_compact(ref.valid, cap)
        kx = jnp.take(ref.x, idx)
        ky = jnp.take(ref.y, idx)
        klyr = jnp.take(ref.layer, idx)
        ksize = jnp.take(ref.size, idx)
        koct = jnp.take(roct, idx)
        slab = stack_pyramid(gauss, extra_rows=window_rows(rmax), copies=4,
                             layer_lo=1, layer_hi=cfg.num_octave_layers + 1)
        n_kp = jnp.sum(val.astype(jnp.int32))
        hist = O.orientation_histograms_fused(
            slab, koct, kx, ky, klyr, ksize, val, cfg, count=n_kp)
        angles, peaks = O.orientation_peaks(hist, val, cfg)
        nb = angles.shape[1]
        eidx, evalid = C.stream_compact(peaks.reshape(-1), cap)
        src = eidx // nb
        return (slab.values, jnp.take(koct, src), jnp.take(kx, src),
                jnp.take(ky, src), jnp.take(klyr, src),
                jnp.take(ksize, src),
                jnp.take(angles.reshape(-1), eidx), evalid)

    slab_vals, foct, fx, fy, flyr, fsize, fang, evalid = jax.jit(prefix)(img)
    gauss_c = gaussian_pyramid(plan, img)
    slab = stack_pyramid(gauss_c, extra_rows=window_rows(rmax), copies=4,
                         layer_lo=1, layer_hi=cfg.num_octave_layers + 1)
    slab = slab._replace(values=slab_vals)
    n = int(jnp.sum(evalid.astype(jnp.int32)))
    print(f"live expanded kpts: {n}")

    count = jnp.sum(evalid.astype(jnp.int32))

    def run(tag):
        jax.clear_caches()

        def step(x):
            desc, nrm2 = D.compute_descriptors_fused(
                slab, foct, fx, fy, flyr, fsize, fang, evalid, cfg,
                count=count)
            return x, jnp.sum(desc) + jnp.sum(x) * 1e-20
        ms = measure_ms(step, img, k_small=4, k_large=24, repeats=3)
        print(f"{tag:36s} {ms:8.3f} ms  ({ms*1000/n:6.2f} us/kpt)",
              flush=True)
        return ms

    orig = FS._desc_group
    run("full kernel")
    FS._desc_group = _group_parreads
    run("DMA + rolls + 12 seg_vec reads")
    FS._desc_group = _group_rolls
    run("DMA + packed-window rolls")
    FS._desc_group = _group_dma_only
    run("DMA only")
    FS._desc_group = orig


if __name__ == "__main__":
    main()
