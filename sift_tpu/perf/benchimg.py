"""Deterministic benchmark input image.

Multi-octave value-noise texture — photo-like spectrum yielding a
realistic keypoint load (~1100 live keypoints at 752x480, in line with
cv2.SIFT's ~1500 on the same image).  White noise yields almost none and
would benchmark an empty frame: the per-keypoint Pallas kernels scale
with the LIVE keypoint count (kernels/fused_stages.py count gating), not
the static capacity — like the reference's count-sized kernel launches.
"""

from __future__ import annotations

import numpy as np


def bench_image(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for s in (2, 4, 8, 16, 32, 64):
        n = rng.normal(0, 1, (h // s + 2, w // s + 2)).astype(np.float32)
        img += _resize_bicubic(n, h, w) * s ** 0.4
    img -= img.min()
    return img * (255.0 / max(float(img.max()), 1e-6))


def _resize_bicubic(a: np.ndarray, h: int, w: int) -> np.ndarray:
    try:
        import cv2
        return cv2.resize(a, (w, h), interpolation=cv2.INTER_CUBIC)
    except ImportError:
        import jax
        return np.asarray(jax.image.resize(a, (h, w), "cubic"))
