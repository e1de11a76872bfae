"""CLI: the BASELINE.md benchmark table on the current backend.

Reproduces the reference's published workload set (readme.md:9-16 —
detect+compute at 752x480 / 1600x900 / 1920x1200, brute-force match of
2000x2000 descriptors) with the transport-robust chained-iteration timer
(perf/timing.py).  Prints one JSON line per metric.

Usage: python -m sift_tpu.tools.benchmark [--quick] [--sizes WxH ...]
"""

from __future__ import annotations

import argparse
import json


BASELINES_MS = {
    "detect_compute_752x480": 0.95,
    "detect_compute_1600x900": 2.5,
    "detect_compute_1920x1200": 3.1,
    "match_2000x2000": 1.0,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true",
                   help="752x480 + match only")
    p.add_argument("--sizes", nargs="*", default=None,
                   help="override detect sizes, e.g. 752x480 1920x1200")
    p.add_argument("--num-features", type=int, default=5000)
    p.add_argument("--batch", type=int, default=0,
                   help="also measure single-chip THROUGHPUT with this "
                        "many frames vmapped into one program (amortizes "
                        "per-program fixed costs; reports per-frame ms)")
    p.add_argument("--tiers", nargs="*", type=int, default=None,
                   help="also measure the capacity-TIER programs "
                        "(detector.py tier dispatch) at these internal "
                        "keypoint capacities — the device-side latency a "
                        "tracking loop pays when the tier fits the frame")
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from sift_tpu.config import SiftConfig
    from sift_tpu.core.types import build_plan
    from sift_tpu.perf.timing import measure_ms
    from sift_tpu.pipeline.detector import build_detect_fn
    from sift_tpu.pipeline.matcher import match_brute_force

    rng = np.random.default_rng(0)
    sizes = args.sizes or (["752x480"] if args.quick
                           else ["752x480", "1600x900", "1920x1200"])

    for spec in sizes:
        w, h = (int(v) for v in spec.split("x"))
        cfg = SiftConfig(width=w, height=h,
                         num_features=args.num_features)
        detect = build_detect_fn(build_plan(cfg))

        def step(img):
            res = detect(img)
            return img, (jnp.sum(res.descriptors)
                         + jnp.sum(res.keypoints.x))

        from sift_tpu.perf.benchimg import bench_image
        img = jax.device_put(jnp.asarray(bench_image(h, w), jnp.float32))
        count = int(jax.jit(detect)(img).count)
        ms = measure_ms(step, img)
        name = f"detect_compute_{w}x{h}"
        base = BASELINES_MS.get(name)
        print(json.dumps({
            "metric": name, "value": round(ms, 4), "unit": "ms",
            "keypoints": count,
            "vs_baseline": round(ms / base, 4) if base else None}))

        if args.tiers:
            for tier in args.tiers:
                tfn = build_detect_fn(build_plan(cfg), kpt_cap=tier)

                def tstep(im):
                    res = tfn(im)
                    return im, (jnp.sum(res.descriptors)
                                + jnp.sum(res.keypoints.x))

                tms = measure_ms(tstep, img)
                print(json.dumps({
                    "metric": f"detect_compute_{w}x{h}_tier{tier}",
                    "value": round(tms, 4), "unit": "ms",
                    "keypoints": count,
                    "vs_baseline": round(tms / base, 4) if base
                    else None}))

        if args.batch:
            from sift_tpu.parallel.batched import batched_detect_fn
            bfn = batched_detect_fn(build_plan(cfg))
            batch = jnp.broadcast_to(img, (args.batch,) + img.shape)
            batch = jax.device_put(batch)

            def bstep(imgs):
                res = bfn(imgs)
                return imgs, (jnp.sum(res.descriptors)
                              + jnp.sum(res.keypoints.x))

            bms = measure_ms(bstep, batch) / args.batch
            print(json.dumps({
                "metric": f"detect_compute_{w}x{h}_batch{args.batch}",
                "value": round(bms, 4), "unit": "ms/frame",
                "vs_baseline": round(bms / base, 4) if base else None}))

    # Brute-force matching (readme.md:11: 2000x2000 in < 1 ms).
    # uint8 storage — the pipeline's default descriptor dtype; the
    # matcher runs the exact bf16 MXU path on it.  The chained timer
    # carries f32 (its probe fold needs float), cast to u8 in-step.
    q = jax.device_put(jnp.asarray(rng.integers(0, 256, (2000, 128)),
                                   jnp.float32))
    t = jax.device_put(jnp.asarray(rng.integers(0, 256, (2000, 128)),
                                   jnp.uint8))

    def match_step(qq):
        m = match_brute_force(qq.astype(jnp.uint8), t)
        return qq, jnp.sum(m).astype(jnp.float32)

    # K spread must be wide: one match is ~18 us, so a 40-iteration
    # spread (~0.7 ms of chained work) drowns in tunnel round-trip
    # noise and can report faster-than-MXU-speed-of-light numbers.
    ms = measure_ms(match_step, q, k_small=16, k_large=256)
    print(json.dumps({
        "metric": "match_2000x2000", "value": round(ms, 4), "unit": "ms",
        "vs_baseline": round(ms / BASELINES_MS["match_2000x2000"], 4)}))


if __name__ == "__main__":
    main()
