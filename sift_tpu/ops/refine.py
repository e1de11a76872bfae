"""Keypoint refinement — vectorized Newton iteration on the DoG cube.

Equivalent capability to the reference's ``adjustExtrema``
(/root/reference/sift_cuda/sift_func/SiftOps.cu:63-208): up to 5 Newton
steps of a 3-D quadratic fit with 1/255-scaled derivatives, divergence /
border / layer rejection, contrast test, and the Hessian edge test; plus the
in-register 3x3 solve (SiftOps.cu:5-61) replaced by a vectorized Cramer
solve.

TPU-first: one thread-per-candidate kernel becomes a masked, batched
computation over the fixed-capacity candidate array; the data-dependent
per-candidate walk is a statically unrolled 5-step loop with liveness masks,
and the 27-point neighborhoods are XLA gathers.

Unlike the reference (which drops OpenCV's sub-pixel offset in the final
coordinates, SiftOps.cu:200-203), the sub-pixel offset is applied when
``config.subpixel`` (default) — matching OpenCV.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sift_tpu.config import (SIFT_IMG_BORDER, SIFT_MAX_INTERP_STEPS,
                             SiftConfig)

_IMG_SCALE = 1.0 / 255.0
_DERIV_SCALE = _IMG_SCALE * 0.5
_SECOND_DERIV_SCALE = _IMG_SCALE
_CROSS_DERIV_SCALE = _IMG_SCALE * 0.25


class RefinedKeypoints(NamedTuple):
    x: jnp.ndarray         # base-image-space x (float)
    y: jnp.ndarray
    layer: jnp.ndarray     # final integer layer (1..L)
    xi: jnp.ndarray        # sub-pixel layer offset (OpenCV's xi)
    size: jnp.ndarray      # base-image-space diameter
    response: jnp.ndarray  # |contrast|
    valid: jnp.ndarray


def _gather27(dog, l, r, c):
    """[K, 3, 3, 3] neighborhood values at (l+dl, r+dr, c+dc), dl/dr/dc in
    {-1,0,1}.  Element-wise gather: with 27 points per candidate a blocked
    dynamic_slice is slower on TPU (tiny unaligned slices pad each DMA);
    indices are clamped for safety — liveness masks guarantee live
    candidates are interior."""
    d, h, w = dog.shape
    flat = dog.reshape(-1)
    dl = jnp.arange(-1, 2)
    base = jnp.clip(l[:, None] + dl[None, :], 0, d - 1) * (h * w)
    ys = jnp.clip(r[:, None] + dl[None, :], 0, h - 1) * w
    xs = jnp.clip(c[:, None] + dl[None, :], 0, w - 1)
    idx = (base[:, :, None, None] + ys[:, None, :, None]
           + xs[:, None, None, :])
    return jnp.take(flat, idx.reshape(idx.shape[0], -1),
                    axis=0).reshape(-1, 3, 3, 3)


def _derivatives(v):
    """v: [K, 3, 3, 3] indexed [layer, row, col] offsets (0=-1,1=0,2=+1).
    Returns (b [K,3], A [K,3,3]) with the reference's scaling
    (SiftOps.cu:90-137)."""
    dD = jnp.stack([
        (v[:, 1, 1, 2] - v[:, 1, 1, 0]) * _DERIV_SCALE,
        (v[:, 1, 2, 1] - v[:, 1, 0, 1]) * _DERIV_SCALE,
        (v[:, 2, 1, 1] - v[:, 0, 1, 1]) * _DERIV_SCALE,
    ], axis=-1)
    v2 = v[:, 1, 1, 1] * 2.0
    dxx = (v[:, 1, 1, 2] + v[:, 1, 1, 0] - v2) * _SECOND_DERIV_SCALE
    dyy = (v[:, 1, 2, 1] + v[:, 1, 0, 1] - v2) * _SECOND_DERIV_SCALE
    dss = (v[:, 2, 1, 1] + v[:, 0, 1, 1] - v2) * _SECOND_DERIV_SCALE
    dxy = (v[:, 1, 2, 2] - v[:, 1, 2, 0] - v[:, 1, 0, 2] + v[:, 1, 0, 0]) \
        * _CROSS_DERIV_SCALE
    dxs = (v[:, 2, 1, 2] - v[:, 2, 1, 0] - v[:, 0, 1, 2] + v[:, 0, 1, 0]) \
        * _CROSS_DERIV_SCALE
    dys = (v[:, 2, 2, 1] - v[:, 2, 0, 1] - v[:, 0, 2, 1] + v[:, 0, 0, 1]) \
        * _CROSS_DERIV_SCALE
    row0 = jnp.stack([dxx, dxy, dxs], -1)
    row1 = jnp.stack([dxy, dyy, dys], -1)
    row2 = jnp.stack([dxs, dys, dss], -1)
    return dD, jnp.stack([row0, row1, row2], -2)


def _solve3(A, b):
    """Vectorized Cramer solve of A x = b; (x, ok) with ok=False when the
    system is singular (the reference's pivoted elimination would produce
    inf/nan there and the candidate takes the divergence path)."""
    det = (A[:, 0, 0] * (A[:, 1, 1] * A[:, 2, 2] - A[:, 1, 2] * A[:, 2, 1])
           - A[:, 0, 1] * (A[:, 1, 0] * A[:, 2, 2] - A[:, 1, 2] * A[:, 2, 0])
           + A[:, 0, 2] * (A[:, 1, 0] * A[:, 2, 1] - A[:, 1, 1] * A[:, 2, 0]))
    ok = jnp.abs(det) > 1e-30
    safe = jnp.where(ok, det, 1.0)

    def rep(col):
        m = jnp.concatenate(
            [A[:, :, :col], b[:, :, None], A[:, :, col + 1:]], axis=2)
        return (m[:, 0, 0] * (m[:, 1, 1] * m[:, 2, 2] - m[:, 1, 2] * m[:, 2, 1])
                - m[:, 0, 1] * (m[:, 1, 0] * m[:, 2, 2] - m[:, 1, 2] * m[:, 2, 0])
                + m[:, 0, 2] * (m[:, 1, 0] * m[:, 2, 1] - m[:, 1, 1] * m[:, 2, 0]))

    x = jnp.stack([rep(0), rep(1), rep(2)], -1) / safe[:, None]
    return x, ok


def refine_keypoints(dog: jnp.ndarray, cx, cy, clayer, cvalid,
                     octave: int, cfg: SiftConfig) -> RefinedKeypoints:
    """dog: [D, H, W] octave DoG block; candidates (cx, cy, clayer, cvalid)
    from ops/peaks.py.  ``octave`` is the pyramid octave index."""
    d, h, w = dog.shape
    border = SIFT_IMG_BORDER
    if d < 3 or h < 3 or w < 3:
        # Tiny octaves can't fit a 3x3x3 slice; zero-pad (any candidate
        # here is already invalid — border=5 excludes images < 11 px).
        dog = jnp.pad(dog, ((0, max(0, 3 - d)), (0, max(0, 3 - h)),
                            (0, max(0, 3 - w))))

    c = cx.astype(jnp.int32)
    r = cy.astype(jnp.int32)
    l = clayer.astype(jnp.int32)
    alive = cvalid
    converged = jnp.zeros_like(alive)
    x0 = jnp.zeros(c.shape, jnp.float32)
    x1 = jnp.zeros_like(x0)
    x2 = jnp.zeros_like(x0)

    # Statically unrolled Newton loop (SIFT_MAX_INTERP_STEPS = 5), frozen
    # per-candidate once converged/dead (SiftOps.cu:106-168).
    for _ in range(int(SIFT_MAX_INTERP_STEPS)):
        active = alive & ~converged
        v = _gather27(dog, l, r, c)
        b, A = _derivatives(v)
        x, solve_ok = _solve3(A, b)
        nx0, nx1, nx2 = x[:, 0], x[:, 1], x[:, 2]
        conv_now = ((jnp.abs(nx0) < 0.5) & (jnp.abs(nx1) < 0.5)
                    & (jnp.abs(nx2) < 0.5) & solve_ok)
        diverged = ((jnp.abs(nx0) > w) | (jnp.abs(nx1) > h)
                    | (jnp.abs(nx2) > 100.0) | ~solve_ok)
        # Update position only when active, not newly converged, not diverged.
        step = active & ~conv_now & ~diverged
        nl = l - jnp.round(nx2).astype(jnp.int32)
        nr = r - jnp.round(nx1).astype(jnp.int32)
        nc = c - jnp.round(nx0).astype(jnp.int32)
        oob = ((nl < 1) | (nl > d - 2)
               | (nr < border) | (nr >= h - border)
               | (nc < border) | (nc >= w - border))
        l = jnp.where(step, jnp.clip(nl, 0, d - 1), l)
        r = jnp.where(step, jnp.clip(nr, 0, h - 1), r)
        c = jnp.where(step, jnp.clip(nc, 0, w - 1), c)
        # Record the solve at the position where convergence happened.
        x0 = jnp.where(active & conv_now, nx0, x0)
        x1 = jnp.where(active & conv_now, nx1, x1)
        x2 = jnp.where(active & conv_now, nx2, x2)
        alive = alive & ~(active & (diverged | (step & oob)))
        converged = converged | (active & conv_now)

    ok = alive & converged

    # Contrast test at the converged position (SiftOps.cu:170-185):
    # contrast = v * img_scale - (dD . x) * 0.5  (x = A^-1 b, so this equals
    # OpenCV's v*img_scale + 0.5*dD.X with X = -x).
    v = _gather27(dog, l, r, c)
    dD, A = _derivatives(v)
    t = dD[:, 0] * x0 + dD[:, 1] * x1 + dD[:, 2] * x2
    contrast = v[:, 1, 1, 1] * _IMG_SCALE - t * 0.5
    ok = ok & (jnp.abs(contrast) * cfg.num_octave_layers
               >= cfg.contrast_threshold)

    # Hessian edge test (SiftOps.cu:187-198).
    dxx, dyy, dxy = A[:, 0, 0], A[:, 1, 1], A[:, 0, 1]
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    et = cfg.edge_threshold
    ok = ok & (det2 > 0) & (tr * tr * et < (et + 1.0) * (et + 1.0) * det2)

    scale = float(1 << octave)
    if cfg.subpixel:
        # OpenCV semantics: kpt = (c + xc) * 2^o with xc = -x0.
        fx = (c.astype(jnp.float32) - x0) * scale
        fy = (r.astype(jnp.float32) - x1) * scale
    else:
        # Reference semantics (SiftOps.cu:200-203): integer coordinates.
        fx = c.astype(jnp.float32) * scale
        fy = r.astype(jnp.float32) * scale
    xi = -x2
    size = (cfg.sigma * jnp.power(2.0, (l.astype(jnp.float32) + xi)
                                  / cfg.num_octave_layers) * scale * 2.0)
    return RefinedKeypoints(x=fx, y=fy, layer=l, xi=xi, size=size,
                            response=jnp.abs(contrast), valid=ok)
