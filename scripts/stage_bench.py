"""Per-stage latency breakdown of the detect pipeline on the current
backend.  Times cumulative pipeline prefixes with the chained-K slope
method (perf/timing.py) and prints the per-stage diffs.

Mirrors pipeline/detector.build_detect_fn at HEAD: the fused all-octave
Newton walk, count-gated fused Pallas kernels, and the textured
bench_image workload (count gating makes white noise benchmark an
almost-empty frame — perf/benchimg.py).

Usage: python scripts/stage_bench.py [W H CAP]
"""

import sys

sys.path.insert(0, ".")

from sift_tpu.perf.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from sift_tpu.config import SiftConfig
from sift_tpu.core.types import build_plan
from sift_tpu.kernels.window_gather import window_rows
from sift_tpu.ops import compact as C
from sift_tpu.ops import descriptor as D
from sift_tpu.ops import orientation as O
from sift_tpu.ops.descriptor import max_descr_radius
from sift_tpu.ops.flatpyr import stack_pyramid
from sift_tpu.ops.orientation import max_ori_radius
from sift_tpu.ops.records import (candidates_from_records,
                                  detect_records_padded, finalize_walk,
                                  walk_records_positions)
from sift_tpu.ops.pyramid import (gaussian_pyramid_padded,
                                  padded_content_views)
from sift_tpu.perf.timing import measure_ms

STAGES = ["pyramid", "records", "walk", "compact", "stackslab",
          "ori_hist", "peaks+expand", "descriptor"]


def build_prefix_fn(plan, n_stages):
    """Stage order: 1 pyramid, 2 fused detect records (DoG + extrema +
    Newton records, one Pallas pass per octave) + candidate compaction,
    3 all-octave Newton walk, 4 compaction, 5 stack slab, 6 fused
    orientation histogram kernel (count-gated), 7 peak finding +
    expansion compaction, 8 descriptor kernel (count-gated)."""
    cfg = plan.config
    kcap = cfg.num_features
    rmax = max(max_descr_radius(cfg), max_ori_radius(cfg))

    def fn(image):
        gp = gaussian_pyramid_padded(plan, image)
        gauss = padded_content_views(plan, gp)
        if n_stages == 1:
            # Touch EVERY layer (the per-layer blurs are independent
            # matmuls — a layer the probe misses is DCE'd away).
            return sum(jnp.sum(g[:, :8]) for g in gp)
        recs = [detect_records_padded(gp[o], plan.octaves[o].height,
                                      plan.octaves[o].width, cfg,
                                      "pallas")
                for o in range(cfg.num_octaves)]
        cands = [candidates_from_records(recs[o],
                                         plan.octaves[o].cand_cap)
                 for o in range(cfg.num_octaves)]
        if n_stages == 2:
            return sum(jnp.sum(cx) + jnp.sum(cv)
                       for cx, _, _, cv in cands)
        st, rflat = walk_records_positions(recs, cands, cfg)
        if n_stages == 3:
            return jnp.sum(st.c) + jnp.sum(st.ok)
        idx, val = C.stream_compact(st.ok, kcap)
        stc = jax.tree.map(lambda a: jnp.take(a, idx), st)
        ref, koct = finalize_walk(rflat, stc, val, cfg)
        kx, ky, klyr, ksize = ref.x, ref.y, ref.layer, ref.size
        if n_stages == 4:
            return jnp.sum(kx) + jnp.sum(ksize)
        slab = stack_pyramid(gauss, extra_rows=window_rows(rmax), copies=2,
                             layer_lo=1, layer_hi=cfg.num_octave_layers + 1)
        if n_stages == 5:
            return jnp.sum(slab.values[0]) + jnp.sum(kx)
        n_kp = jnp.sum(val.astype(jnp.int32))
        hist = O.orientation_histograms_fused(
            slab, koct, kx, ky, klyr, ksize, val, cfg, count=n_kp)
        if n_stages == 6:
            return jnp.sum(hist) + jnp.sum(kx)
        angles, peaks = O.orientation_peaks(hist, val, cfg)
        nb = angles.shape[1]
        eidx, evalid = C.stream_compact(peaks.reshape(-1), kcap)
        src = eidx // nb
        fx = jnp.take(kx, src)
        fy = jnp.take(ky, src)
        flyr = jnp.take(klyr, src)
        foct = jnp.take(koct, src)
        fsize = jnp.take(ksize, src)
        fang = jnp.take(angles.reshape(-1), eidx)
        if n_stages == 7:
            return jnp.sum(fang) + jnp.sum(fx)
        desc, nrm2 = D.compute_descriptors_fused(
            slab, foct, fx, fy, flyr, fsize, fang, evalid, cfg,
            count=jnp.sum(evalid.astype(jnp.int32)))
        return jnp.sum(desc) + jnp.sum(fx)

    return fn


def main():
    w, h, cap = 752, 480, 5000
    if len(sys.argv) >= 4:
        w, h, cap = map(int, sys.argv[1:4])
    cfg = SiftConfig(width=w, height=h, num_features=cap)
    plan = build_plan(cfg)
    from sift_tpu.perf.benchimg import bench_image
    img = jax.device_put(jnp.asarray(bench_image(h, w), jnp.float32))

    prev = 0.0
    for i, name in enumerate(STAGES, 1):
        fn = build_prefix_fn(plan, i)

        def step(x, fn=fn):
            return x, fn(x)

        ms = measure_ms(step, img, k_small=4, k_large=16, repeats=3)
        print(f"stage {i} {name:12s} cum {ms:8.3f} ms   "
              f"delta {ms - prev:8.3f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
