"""Headline benchmark: detect+compute latency at 752x480, the reference's
primary published number (0.95 ms on RTX 4070 Super excluding transfers,
/root/reference/readme.md:13-15; mirrored in BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
``vs_baseline`` is our_time / reference_time (< 1.0 means faster than the
reference GPU).  Input is pre-placed on device and timing excludes
host<->device transfer, matching the reference's methodology
(readme.md:11).  Run with the default backend (real TPU under the driver).
"""

import json
import time

import numpy as np


BASELINE_MS = 0.95  # RTX 4070 Super, 752x480 (readme.md:13-15)


def main():
    import jax
    import jax.numpy as jnp

    from sift_tpu.config import SiftConfig
    from sift_tpu.core.types import build_plan
    from sift_tpu.perf.timing import measure_ms
    from sift_tpu.pipeline.detector import build_detect_fn

    cfg = SiftConfig(width=752, height=480, num_features=5000)
    plan = build_plan(cfg)
    detect = build_detect_fn(plan)

    def step(img):
        res = detect(img)
        return img, jnp.sum(res.descriptors) + jnp.sum(res.keypoints.x)

    rng = np.random.default_rng(0)
    host = np.clip(rng.normal(128, 40, (480, 752)), 0, 255)
    img = jax.device_put(jnp.asarray(host, jnp.float32))

    ms = measure_ms(step, img)

    print(json.dumps({
        "metric": "detect_compute_752x480",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(ms / BASELINE_MS, 4),
    }))


if __name__ == "__main__":
    main()
