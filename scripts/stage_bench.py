"""Per-stage latency breakdown of the detect pipeline on the current
backend.  Times cumulative pipeline prefixes with the chained-K slope
method (perf/timing.py) and prints the per-stage diffs.

Profiles the FUSED path (the TPU default): raw-window Pallas kernels off
a row-stacked slab; stage 5 is the slab stack, not gradient slabs.

Usage: python scripts/stage_bench.py [W H CAP]
"""

import sys

sys.path.insert(0, ".")

from sift_tpu.perf.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

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
from sift_tpu.ops.refine_dense import refine_keypoints_dense
from sift_tpu.perf.timing import measure_ms


def build_prefix_fn(plan, n_stages):
    """Stage order: 1 pyramid, 2 extrema, 3 refine, 4 compaction,
    5 stack slab, 6 orientation(+peaks+expand), 7 descriptor."""
    cfg = plan.config
    kcap = cfg.num_features
    rmax = max(max_descr_radius(cfg), max_ori_radius(cfg))

    def fn(image):
        probe = jnp.float32(0)
        gauss = gaussian_pyramid(plan, image)
        dogs = dog_pyramid(gauss)
        if n_stages == 1:
            return sum(jnp.sum(d[0]) for d in dogs) + jnp.sum(gauss[0][0])
        rx, ry, rlyr, rxi, rsize, rresp, roct, rval = \
            [], [], [], [], [], [], [], []
        for o in range(cfg.num_octaves):
            op = plan.octaves[o]
            cx, cy, clyr, cval = find_candidates(
                dogs[o], cfg.peak_threshold, SIFT_IMG_BORDER, op.cand_cap)
            if n_stages == 2:
                probe = probe + jnp.sum(cx) + jnp.sum(cval)
                continue
            ref = refine_keypoints_dense(dogs[o], cx, cy, clyr, cval, o, cfg)
            rx.append(ref.x)
            ry.append(ref.y)
            rlyr.append(ref.layer)
            rxi.append(ref.xi)
            rsize.append(ref.size)
            rresp.append(ref.response)
            roct.append(jnp.full(ref.x.shape, o, jnp.int32))
            rval.append(ref.valid)
        if n_stages == 2:
            return probe
        cat = lambda xs: jnp.concatenate(xs)
        rx, ry, rlyr, rxi, rsize, rresp, roct, rval = map(
            cat, (rx, ry, rlyr, rxi, rsize, rresp, roct, rval))
        if n_stages == 3:
            return jnp.sum(rx) + jnp.sum(rval)
        idx, val = C.stream_compact(rval, kcap)
        kx = jnp.take(rx, idx)
        ky = jnp.take(ry, idx)
        klyr = jnp.take(rlyr, idx)
        ksize = jnp.take(rsize, idx)
        koct = jnp.take(roct, idx)
        if n_stages == 4:
            return jnp.sum(kx) + jnp.sum(ksize)
        slab = stack_pyramid(gauss, extra_rows=window_rows(rmax), copies=4,
                             layer_lo=1, layer_hi=cfg.num_octave_layers + 1)
        if n_stages == 5:
            return jnp.sum(slab.values[0]) + jnp.sum(kx)
        hist = O.orientation_histograms_fused(
            slab, koct, kx, ky, klyr, ksize, val, cfg)
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
        if n_stages == 6:
            return jnp.sum(fang) + jnp.sum(fx)
        desc, nrm2 = D.compute_descriptors_fused(
            slab, foct, fx, fy, flyr, fsize, fang, evalid, cfg)
        return jnp.sum(desc) + jnp.sum(fx)

    return fn


def main():
    w, h, cap = 752, 480, 5000
    if len(sys.argv) >= 4:
        w, h, cap = map(int, sys.argv[1:4])
    cfg = SiftConfig(width=w, height=h, num_features=cap)
    plan = build_plan(cfg)
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        np.clip(rng.normal(128, 40, (h, w)), 0, 255), jnp.float32))

    names = ["pyramid", "extrema", "refine", "compact", "stackslab",
             "orientation", "descriptor"]
    prev = 0.0
    for i, name in enumerate(names, 1):
        fn = build_prefix_fn(plan, i)

        def step(x, fn=fn):
            return x, fn(x)

        ms = measure_ms(step, img, k_small=2, k_large=8, repeats=3)
        print(f"stage {i} {name:12s} cum {ms:8.3f} ms   "
              f"delta {ms - prev:8.3f} ms", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
