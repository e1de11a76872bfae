"""Gaussian and DoG pyramid construction.

Equivalent capability to the reference's pipeline stages
``createInitialImage`` / ``getGaussianPyramid`` / ``getDogPyramid``
(/root/reference/sift_cuda/interface/Detector.cu:235-359).

TPU-first design: with the blur expressed as precomputed banded operators
(core/gaussian.py), each octave's six layers come from the octave base via
ONE batched matmul pair on the MXU, and each octave base comes from the
previous base via one composed (resize ∘ blur) matmul pair.  No sequential
per-layer kernel chain, no streams, no CUDA-graph capture — the whole
pyramid is a short static chain of large matmuls that XLA schedules.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from sift_tpu.core.types import SiftPlan
from sift_tpu.ops.blur import blur_matmul, blur_conv
from sift_tpu.ops.resize import resize_matmul


def gaussian_pyramid(plan: SiftPlan, image: jnp.ndarray) -> List[jnp.ndarray]:
    """image: [H, W] float32 (0..255 range).  Returns per-octave stacks
    [L+3, H_o, W_o]."""
    cfg = plan.config
    if cfg.upscale:
        base = resize_matmul(image, jnp.asarray(plan.up_v),
                             jnp.asarray(plan.up_h))
    else:
        base = image

    if cfg.blur_impl == "conv":
        return _gaussian_pyramid_conv(plan, base)

    # Layer 0 of octave 0: base blur with sigma_diff (Detector.cu:41-60).
    base = blur_matmul(base, jnp.asarray(plan.init_v), jnp.asarray(plan.init_h))
    octaves = []
    for o in range(cfg.num_octaves):
        if o > 0:
            base = blur_matmul(base, jnp.asarray(plan.carry_v[o]),
                               jnp.asarray(plan.carry_h[o]))
        layers = blur_matmul(base, jnp.asarray(plan.blur_v[o]),
                             jnp.asarray(plan.blur_h[o]))
        octaves.append(layers)
    return octaves


def _gaussian_pyramid_conv(plan: SiftPlan, base: jnp.ndarray):
    """Sequential conv path, mirroring the reference's per-layer chain
    (Detector.cu:292-303): layer i = blur(layer i-1, sigmas[i]); octave
    base = bilinear-resize(previous octave layer L)."""
    cfg = plan.config
    layer0 = blur_conv(base, jnp.asarray(plan.init_kernel_1d))
    octaves = []
    for o in range(cfg.num_octaves):
        if o > 0:
            prev_L = octaves[o - 1][cfg.num_octave_layers]
            layer0 = resize_matmul(prev_L, jnp.asarray(plan.down_v[o]),
                                   jnp.asarray(plan.down_h[o]))
        layers = [layer0]
        for i in range(1, cfg.num_gauss_layers):
            layers.append(blur_conv(layers[-1],
                                    jnp.asarray(plan.kernels_1d[i])))
        octaves.append(jnp.stack(layers))
    return octaves


def dog_pyramid(gauss: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """DoG[i] = gauss[i+1] - gauss[i] per octave (Detector.cu:347-353,
    image_func/MatOps.cu:10-37)."""
    return [g[1:] - g[:-1] for g in gauss]
