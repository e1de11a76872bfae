"""Orientation assignment — 36-bin gradient histograms + peak expansion.

Equivalent capability to the reference's ``calOriHistMultiThread``
(/root/reference/sift_cuda/sift_func/SiftOps.cu:237-376): Gaussian-weighted
gradient-orientation histogram over a square window, (6,4,1)/16 circular
smoothing, and one emitted keypoint per local max >= 0.8 * peak.

TPU-first: warp-per-keypoint shared-memory atomics become a batched masked
histogram — a static-size patch gather per keypoint, then 36 fused masked
reductions (no scatter).  Peak expansion produces a fixed [K, 36] candidate
grid + mask, compacted downstream.

Deviations from the reference, both gated on OpenCV (the reference's own
oracle, readme.md:5):
* gradients default to the Gaussian block, not the DoG block the reference
  passes in (interface/Detector.cu:489) — config.orientation_source;
* histogram bin = round(ori * 36/360) like OpenCV, not floor;
* parabolic peak interpolation like OpenCV when
  config.interpolate_orientation (the reference leaves it TODO,
  SiftOps.cu:359-371).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from sift_tpu.config import (SIFT_ORI_HIST_BINS, SIFT_ORI_PEAK_RATIO,
                             SIFT_ORI_RADIUS, SIFT_ORI_SIG_FCTR, SiftConfig)
from sift_tpu.ops.patches import gather_patches, patch_gradients

_NB = SIFT_ORI_HIST_BINS


def max_ori_radius(cfg: SiftConfig) -> int:
    """Static bound on the orientation window radius: scl_octv <=
    sigma * 2^((L + 0.5)/L) (layer <= L, |xi| <= 0.5)."""
    scl_max = cfg.sigma * 2.0 ** ((cfg.num_octave_layers + 0.5)
                                  / cfg.num_octave_layers)
    return int(round(SIFT_ORI_RADIUS * scl_max))


def orientation_histograms(block: jnp.ndarray, x, y, layer, size, valid,
                           octave: int, cfg: SiftConfig) -> jnp.ndarray:
    """block: [D, H, W] source image stack (Gaussian or DoG per config);
    x/y in base-image space; size in base-image space.  Returns raw
    histograms [K, 36]."""
    h, w = block.shape[1], block.shape[2]
    inv = 1.0 / float(1 << octave)
    px = jnp.round(x * inv).astype(jnp.int32)
    py = jnp.round(y * inv).astype(jnp.int32)
    scl_octv = size * 0.5 * inv
    sigma_ori = SIFT_ORI_SIG_FCTR * scl_octv
    radius = jnp.round(SIFT_ORI_RADIUS * scl_octv)

    rmax = max_ori_radius(cfg)
    s = 2 * (rmax + 1) + 1  # +1 halo for central differences
    patch, offy, offx = gather_patches(block, layer, py, px, s)
    dx, dy = patch_gradients(patch)            # [K, s-2, s-2]
    ii = offy[1:-1][None, :, None].astype(jnp.float32)
    jj = offx[1:-1][None, None, :].astype(jnp.float32)

    pyy = py[:, None, None] + ii.astype(jnp.int32)
    pxx = px[:, None, None] + jj.astype(jnp.int32)
    in_img = ((pyy >= 1) & (pyy <= h - 2) & (pxx >= 1) & (pxx <= w - 2))
    rad = radius[:, None, None]
    in_win = (jnp.abs(ii) <= rad) & (jnp.abs(jj) <= rad)
    m = in_img & in_win & valid[:, None, None]

    mag = jnp.sqrt(dx * dx + dy * dy)
    ori = jnp.arctan2(dy, dx) * (180.0 / math.pi)
    ori = jnp.where(ori < 0, ori + 360.0, ori)
    wexp = jnp.exp((-0.5 / (sigma_ori * sigma_ori))[:, None, None]
                   * (ii * ii + jj * jj))
    contrib = jnp.where(m, wexp * mag, 0.0)

    b = jnp.round(ori * (_NB / 360.0)).astype(jnp.int32)
    b = jnp.where(b >= _NB, b - _NB, b)
    b = jnp.where(b < 0, b + _NB, b)

    # One fused masked one-hot reduction instead of atomics (SiftOps.cu:324).
    onehot = (b[..., None] == jnp.arange(_NB, dtype=jnp.int32))
    hist = jnp.sum(jnp.where(onehot, contrib[..., None], 0.0), axis=(1, 2))
    return hist


def smooth_histogram(hist: jnp.ndarray) -> jnp.ndarray:
    """(6 h[i] + 4 (h[i-1] + h[i+1]) + h[i-2] + h[i+2]) / 16, circular
    (SiftOps.cu:329-336)."""
    r1 = jnp.roll(hist, 1, -1)
    l1 = jnp.roll(hist, -1, -1)
    r2 = jnp.roll(hist, 2, -1)
    l2 = jnp.roll(hist, -2, -1)
    return (6.0 * hist + 4.0 * (r1 + l1) + r2 + l2) / 16.0


def orientation_peaks(hist: jnp.ndarray, valid, cfg: SiftConfig):
    """Returns (angles [K, 36], peak_mask [K, 36]): one candidate orientation
    per histogram bin that is a strict local max >= 0.8 * global max
    (SiftOps.cu:338-373)."""
    sm = smooth_histogram(hist)
    left = jnp.roll(sm, 1, -1)
    right = jnp.roll(sm, -1, -1)
    peak = (sm > left) & (sm > right) \
        & (sm >= SIFT_ORI_PEAK_RATIO * jnp.max(sm, -1, keepdims=True)) \
        & valid[:, None]

    bins = jnp.arange(_NB, dtype=jnp.float32)[None, :]
    if cfg.interpolate_orientation:
        denom = left - 2.0 * sm + right
        denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        fb = bins + 0.5 * (left - right) / denom
        fb = jnp.where(fb < 0, fb + _NB, jnp.where(fb >= _NB, fb - _NB, fb))
    else:
        fb = bins
    angle = 360.0 - fb * (360.0 / _NB)
    angle = jnp.where(jnp.abs(angle - 360.0) < 1.192092896e-07, 0.0, angle)
    return angle, peak
