"""Sweep tuning parameters of the fused per-keypoint kernels
(kernels/fused_stages.py) on realistic pipeline state: block_k and NBUF
for the orientation and descriptor kernels, at a chosen frame size.

The inputs come from running the real detect pipeline prefix on the
textured bench image, so keypoint counts / radii / octave mix match
what tools/benchmark.py measures.

Usage: python scripts/kernel_bench.py [W H CAP]
"""

import functools
import sys

sys.path.insert(0, ".")

from sift_tpu.perf.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

import sift_tpu.kernels.fused_stages as FS
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
from sift_tpu.perf.benchimg import bench_image
from sift_tpu.perf.timing import measure_ms


def pipeline_state(plan, image):
    """Run the detect prefix up to the per-keypoint stages; returns the
    slab + compacted keypoint fields + expanded (angled) fields."""
    cfg = plan.config
    kcap = cfg.num_features
    rmax = max(max_descr_radius(cfg), max_ori_radius(cfg))
    gp = gaussian_pyramid_padded(plan, image)
    gauss = padded_content_views(plan, gp)
    recs = [detect_records_padded(gp[o], plan.octaves[o].height,
                                  plan.octaves[o].width, cfg, "pallas")
            for o in range(cfg.num_octaves)]
    cands = [candidates_from_records(recs[o], plan.octaves[o].cand_cap)
             for o in range(cfg.num_octaves)]
    st, rflat = walk_records_positions(recs, cands, cfg)
    idx, val = C.stream_compact(st.ok, kcap)
    stc = jax.tree.map(lambda a: jnp.take(a, idx), st)
    ref, koct = finalize_walk(rflat, stc, val, cfg)
    slab = stack_pyramid(gauss, extra_rows=window_rows(rmax), copies=2,
                         layer_lo=1, layer_hi=cfg.num_octave_layers + 1)
    n_kp = jnp.sum(val.astype(jnp.int32))
    hist = O.orientation_histograms_fused(
        slab, koct, ref.x, ref.y, ref.layer, ref.size, val, cfg,
        count=n_kp)
    angles, peaks = O.orientation_peaks(hist, val, cfg)
    nb = angles.shape[1]
    eidx, evalid = C.stream_compact(peaks.reshape(-1), kcap)
    src = eidx // nb
    return dict(
        slab=slab, koct=koct, kx=ref.x, ky=ref.y, klyr=ref.layer,
        ksize=ref.size, val=val, n_kp=n_kp,
        foct=jnp.take(koct, src), fx=jnp.take(ref.x, src),
        fy=jnp.take(ref.y, src), flyr=jnp.take(ref.layer, src),
        fsize=jnp.take(ref.size, src),
        fang=jnp.take(angles.reshape(-1), eidx), evalid=evalid,
        n_desc=jnp.sum(evalid.astype(jnp.int32)))


def main():
    w, h, cap = 1600, 900, 5000
    if len(sys.argv) >= 4:
        w, h, cap = map(int, sys.argv[1:4])
    cfg = SiftConfig(width=w, height=h, num_features=cap)
    plan = build_plan(cfg)
    img = jax.device_put(jnp.asarray(bench_image(h, w), jnp.float32))
    state = jax.jit(functools.partial(pipeline_state, plan))(img)
    # jit traces the StackedPyramid's static int fields into arrays;
    # restore them (copies=2, layers=D, copy_rows=Hs/copies).
    slab = state["slab"]
    state["slab"] = slab._replace(
        layers=cfg.num_gauss_layers, copies=2,
        copy_rows=slab.values.shape[0] // 2)
    print(f"{w}x{h}: {int(state['n_kp'])} kpts, "
          f"{int(state['n_desc'])} descriptors", flush=True)

    s = state
    orig_ori = FS.orientation_hist_fused
    orig_desc = FS.descriptor_fused

    def time_ori(block_k, nbuf):
        orig_ori.clear_cache()
        FS.orientation_hist_fused = (
            lambda *a, **kw: orig_ori(*a, **{**kw, "block_k": block_k,
                                             "nbuf": nbuf}))

        def step(x):
            hist = O.orientation_histograms_fused(
                s["slab"], s["koct"], x, s["ky"], s["klyr"], s["ksize"],
                s["val"], cfg, count=s["n_kp"])
            return x, jnp.sum(hist)

        ms = measure_ms(step, s["kx"], k_small=4, k_large=16, repeats=3)
        FS.orientation_hist_fused = orig_ori
        print(f"ori  block_k={block_k:3d} NBUF={nbuf} {ms:7.3f} ms",
              flush=True)

    def time_desc(block_k, nbuf):
        orig_desc.clear_cache()
        FS.descriptor_fused = (
            lambda *a, **kw: orig_desc(*a, **{**kw, "block_k": block_k,
                                              "nbuf": nbuf}))

        def step(x):
            desc, _ = D.compute_descriptors_fused(
                s["slab"], s["foct"], x, s["fy"], s["flyr"], s["fsize"],
                s["fang"], s["evalid"], cfg, count=s["n_desc"])
            return x, jnp.sum(desc)

        ms = measure_ms(step, s["fx"], k_small=4, k_large=16, repeats=3)
        FS.descriptor_fused = orig_desc
        print(f"desc block_k={block_k:3d} NBUF={nbuf} {ms:7.3f} ms",
              flush=True)

    # scratch = nbuf * block_k * rows * 128 * 4B must stay well under
    # the 16 MB VMEM (ori rows ~48, desc rows ~88).
    for bk in (24, 48):
        time_ori(bk, 4)
    time_ori(48, 8)
    time_ori(96, 4)
    for bk in (8, 16, 32):
        time_desc(bk, 4)
    time_desc(16, 2)
    time_desc(16, 8)
    time_desc(32, 2)


if __name__ == "__main__":
    main()
