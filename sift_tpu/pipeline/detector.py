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
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sift_tpu.config import SIFT_IMG_BORDER, SiftConfig
from sift_tpu.core.types import Keypoints, SiftPlan, SiftResult, build_plan
from sift_tpu.ops import compact as C
from sift_tpu.ops import descriptor as D
from sift_tpu.ops import orientation as O
from sift_tpu.ops.peaks import find_candidates
from sift_tpu.ops.pyramid import dog_pyramid, gaussian_pyramid
from sift_tpu.ops.refine import refine_keypoints


def _octave_keypoints(plan: SiftPlan, o: int, gauss, dog):
    """One octave: peaks -> refine -> compact -> orientation -> expand ->
    compact -> descriptors.  Returns (Keypoints[kpt_cap], desc [kpt_cap,128],
    nrm2)."""
    cfg = plan.config
    op = plan.octaves[o]

    cx, cy, clyr, cval = find_candidates(
        dog, cfg.peak_threshold, SIFT_IMG_BORDER, op.cand_cap)
    ref = refine_keypoints(dog, cx, cy, clyr, cval, o, cfg)

    # Compact survivors in index order (≙ collectKpts, SiftOps.cu:210-235).
    idx, val = C.stream_compact(ref.valid, op.kpt_cap)
    kx = jnp.take(ref.x, idx)
    ky = jnp.take(ref.y, idx)
    klyr = jnp.take(ref.layer, idx)
    kxi = jnp.take(ref.xi, idx)
    ksize = jnp.take(ref.size, idx)
    kresp = jnp.take(ref.response, idx)

    ori_block = gauss if cfg.orientation_source == "gaussian" else dog
    hist = O.orientation_histograms(ori_block, kx, ky, klyr, ksize, val,
                                    o, cfg)
    angles, peaks = O.orientation_peaks(hist, val, cfg)

    # Expansion: up to 36 oriented copies per keypoint (SiftOps.cu:338-373),
    # flattened to [kpt_cap * 36] and compacted back to kpt_cap.
    nb = angles.shape[1]
    eidx, evalid = C.stream_compact(peaks.reshape(-1), op.kpt_cap)
    src = eidx // nb

    kps = Keypoints(
        x=jnp.take(kx, src), y=jnp.take(ky, src),
        layer=jnp.take(klyr, src),
        octave=jnp.full(src.shape, o, jnp.int32),
        xi=jnp.take(kxi, src), size=jnp.take(ksize, src),
        response=jnp.take(kresp, src),
        angle=jnp.take(angles.reshape(-1), eidx),
        valid=evalid)

    desc, nrm2 = D.compute_descriptors(
        gauss, kps.x, kps.y, kps.layer, kps.size, kps.angle, kps.valid,
        o, cfg)
    return kps, desc, nrm2


def _concat_keypoints(parts: List[Keypoints]) -> Keypoints:
    return Keypoints(*[jnp.concatenate(f) for f in zip(*parts)])


def build_detect_fn(plan: SiftPlan, quant_mode: str = "opencv"):
    """Returns the pure function image [H, W] f32 -> SiftResult."""
    cfg = plan.config

    def detect(image: jnp.ndarray) -> SiftResult:
        gauss = gaussian_pyramid(plan, image)
        dogs = dog_pyramid(gauss)

        kp_parts, d_parts, n_parts = [], [], []
        for o in range(cfg.num_octaves):
            kps, desc, nrm2 = _octave_keypoints(plan, o, gauss[o], dogs[o])
            kp_parts.append(kps)
            d_parts.append(desc)
            n_parts.append(nrm2)

        all_kps = _concat_keypoints(kp_parts)
        all_desc = jnp.concatenate(d_parts)
        all_nrm = jnp.concatenate(n_parts)

        # Cross-octave gather to num_features capacity, octave/index order
        # (≙ collectKptsAndDescriptor, utils/CudaMemcpyUtils.cu:21-70).
        idx, val = C.stream_compact(all_kps.valid, cfg.num_features)
        kps = Keypoints(*[jnp.take(f, idx) for f in all_kps[:-1]], valid=val)
        desc = jnp.take(all_desc, idx, axis=0)
        nrm2 = jnp.take(all_nrm, idx, axis=0)
        desc = D.quantize_descriptor(desc, nrm2, quant_mode)
        desc = jnp.where(val[:, None], desc, 0.0)

        if cfg.upscale:
            # OpenCV firstOctave = -1 final adjustment: halve coords/size,
            # octave index shifts down by one.
            kps = kps._replace(x=kps.x * 0.5, y=kps.y * 0.5,
                               size=kps.size * 0.5, octave=kps.octave - 1)
        return SiftResult(keypoints=kps, descriptors=desc,
                          count=kps.count().astype(jnp.int32))

    return detect


class SiftDetector:
    """Host-side convenience wrapper (≙ the reference ``Detector`` object).

    Keeps ``prev_descriptors``/``prev_result`` for sequential matching
    (≙ prev_descriptor rotation, Detector.cu:136-141)."""

    def __init__(self, config: SiftConfig, quant_mode: str = "opencv",
                 jit: bool = True):
        self.config = config
        self.plan = build_plan(config)
        fn = build_detect_fn(self.plan, quant_mode)
        self._fn = jax.jit(fn) if jit else fn
        self.prev_result: Optional[SiftResult] = None  # frame t-1
        self.last_result: Optional[SiftResult] = None  # frame t

    def warm_up(self):
        """Compile (≙ gpuWarmUpAndAllocate + graph capture)."""
        img = jnp.zeros((self.config.height, self.config.width), jnp.float32)
        jax.block_until_ready(self._fn(img))
        return True

    def detect_and_compute(self, image) -> SiftResult:
        image = jnp.asarray(image, jnp.float32)
        if image.shape != (self.config.height, self.config.width):
            raise ValueError(
                f"image shape {image.shape} != configured "
                f"{(self.config.height, self.config.width)}")
        result = self._fn(image)
        self.prev_result = self.last_result
        self.last_result = result
        return result

    @property
    def prev_descriptors(self):
        """Descriptors of the frame before the most recent one
        (≙ Detector::prev_descriptor, Detector.hh:54-62)."""
        return None if self.prev_result is None \
            else self.prev_result.descriptors
