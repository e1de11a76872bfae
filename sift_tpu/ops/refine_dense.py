"""Keypoint refinement — THE Newton implementation: the 3-D quadratic
solve precomputed densely for every DoG pixel, candidates walk the field.

Equivalent capability to the reference's ``adjustExtrema``
(/root/reference/sift_cuda/sift_func/SiftOps.cu:63-208): up to 5 Newton
steps of a 3-D quadratic fit with 1/255-scaled derivatives, divergence /
border / layer rejection, contrast test, and the Hessian edge test; the
in-register 3x3 solve (SiftOps.cu:5-61) becomes a vectorized Cramer
solve over the whole volume.

TPU-first restructuring: the per-candidate 3x3x3 stencil gather + solve
(27 scattered loads x 5 steps each) becomes ONE dense vectorized pass
over the DoG volume (stencils are shifts — pure VPU, no gathers)
producing a packed 5-channel record per pixel:

    [x0, x1, x2, |contrast|, flags]   flags = conv | div<<1 | edge_ok<<2

The 5-step Newton walk then gathers one contiguous record per candidate
per step; final accept tests read |contrast| and the edge bit at the
final position.  Records can be stored in bfloat16
(``SiftConfig.refine_record_dtype``): flags (small integers) are exact,
sub-pixel offsets carry <= 2^-9 relative error — halving the pipeline's
largest buffer and its HBM write traffic.

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


def record_dtype(cfg: SiftConfig):
    """Resolve ``cfg.refine_record_dtype``.  "auto" keeps float32 records
    below 1 MP (bit-exact parity at the flagship 752x480 and all test
    shapes) and switches to bfloat16 at/above (the record field is the
    largest buffer at 1920x1200; VERDICT r2 memory-parity item)."""
    mode = cfg.refine_record_dtype
    if mode == "auto":
        mode = ("bfloat16"
                if cfg.base_width * cfg.base_height >= (1 << 20)
                else "float32")
    return jnp.bfloat16 if mode == "bfloat16" else jnp.float32


def record_fields(dog: jnp.ndarray, cfg: SiftConfig):
    """dog [D, H, W] -> five [D-2, H, W] record channels
    (x0, x1, x2, |contrast|, flags) for layers 1..D-2 only (boundary
    pixels garbage; the walk never consults them for live candidates,
    and any Newton step out of layers [1, D-2] kills its candidate — so
    end layers are never needed).  Shared math of the stacked-record
    path below and the plane-layout fused path (ops/records.py): the
    fused Pallas kernel (kernels/fused_detect.py) computes the same
    expressions tile-wise in VMEM."""
    d, h, w = dog.shape

    def sh(dl, dr, dc):
        return jnp.roll(dog, (-dl, -dr, -dc), axis=(0, 1, 2))[1:d - 1]

    v = dog[1:d - 1]
    dx = (sh(0, 0, 1) - sh(0, 0, -1)) * _DERIV_SCALE
    dy = (sh(0, 1, 0) - sh(0, -1, 0)) * _DERIV_SCALE
    ds = (sh(1, 0, 0) - sh(-1, 0, 0)) * _DERIV_SCALE
    v2 = v * 2.0
    dxx = (sh(0, 0, 1) + sh(0, 0, -1) - v2) * _SECOND_DERIV_SCALE
    dyy = (sh(0, 1, 0) + sh(0, -1, 0) - v2) * _SECOND_DERIV_SCALE
    dss = (sh(1, 0, 0) + sh(-1, 0, 0) - v2) * _SECOND_DERIV_SCALE
    dxy = (sh(0, 1, 1) - sh(0, 1, -1) - sh(0, -1, 1) + sh(0, -1, -1)) \
        * _CROSS_DERIV_SCALE
    dxs = (sh(1, 0, 1) - sh(1, 0, -1) - sh(-1, 0, 1) + sh(-1, 0, -1)) \
        * _CROSS_DERIV_SCALE
    dys = (sh(1, 1, 0) - sh(1, -1, 0) - sh(-1, 1, 0) + sh(-1, -1, 0)) \
        * _CROSS_DERIV_SCALE

    # Cramer solve of A x = dD (A = Hessian), vectorized per pixel.
    det = (dxx * (dyy * dss - dys * dys)
           - dxy * (dxy * dss - dys * dxs)
           + dxs * (dxy * dys - dyy * dxs))
    ok = jnp.abs(det) > 1e-30
    safe = jnp.where(ok, det, 1.0)
    x0 = (dx * (dyy * dss - dys * dys)
          - dxy * (dy * dss - dys * ds)
          + dxs * (dy * dys - dyy * ds)) / safe
    x1 = (dxx * (dy * dss - dys * ds)
          - dx * (dxy * dss - dys * dxs)
          + dxs * (dxy * ds - dy * dxs)) / safe
    x2 = (dxx * (dyy * ds - dy * dys)
          - dxy * (dxy * ds - dy * dxs)
          + dx * (dxy * dys - dyy * dxs)) / safe

    conv = (jnp.abs(x0) < 0.5) & (jnp.abs(x1) < 0.5) & (jnp.abs(x2) < 0.5) \
        & ok
    div = (jnp.abs(x0) > w) | (jnp.abs(x1) > h) | (jnp.abs(x2) > 100.0) \
        | ~ok

    contrast = v * _IMG_SCALE - (dx * x0 + dy * x1 + ds * x2) * 0.5
    tr = dxx + dyy
    det2 = dxx * dyy - dxy * dxy
    et = cfg.edge_threshold
    edge_ok = (det2 > 0) & (tr * tr * et < (et + 1.0) * (et + 1.0) * det2)

    flags = (conv.astype(jnp.float32) + 2.0 * div.astype(jnp.float32)
             + 4.0 * edge_ok.astype(jnp.float32))
    return x0, x1, x2, jnp.abs(contrast), flags


def _dense_records(dog: jnp.ndarray, cfg: SiftConfig) -> jnp.ndarray:
    """record_fields stacked channel-last: [D-2, H, W, 5]."""
    return jnp.stack(record_fields(dog, cfg),
                     axis=-1).astype(record_dtype(cfg))


def refine_keypoints_dense_all(dogs, cands, cfg: SiftConfig):
    """ALL octaves' candidates walked in ONE pass over one concatenated
    record slab.  The per-octave variant issues 5 gather steps per
    octave — 5 * n_octaves small latency-bound gathers; here the same
    walk runs once over the union (per-candidate octave geometry as
    gathered arrays), so the gather count is octave-independent.

    dogs: per-octave [D, H_o, W_o] DoG stacks (same D).  cands: list of
    (cx, cy, clayer, cvalid) per octave.  Returns (RefinedKeypoints
    concatenated octave-major, octave indices [K])."""
    d = dogs[0].shape[0]
    recs, bases, hs, ws = [], [], [], []
    row = 0
    for dog in dogs:
        _, h, w = dog.shape
        recs.append(_dense_records(dog, cfg).reshape(-1, 5))
        bases.append(row)
        hs.append(h)
        ws.append(w)
        row += recs[-1].shape[0]
    rec = jnp.concatenate(recs)

    octv = jnp.concatenate([
        jnp.full(c[0].shape, o, jnp.int32) for o, c in enumerate(cands)])
    cat = lambda i: jnp.concatenate([jnp.asarray(c[i]) for c in cands])
    cx, cy, clayer, cvalid = cat(0), cat(1), cat(2), cat(3)
    base = jnp.take(jnp.asarray(bases, jnp.int32), octv)
    h = jnp.take(jnp.asarray(hs, jnp.int32), octv)
    w = jnp.take(jnp.asarray(ws, jnp.int32), octv)

    def fetch(l, r, c):
        idx = base + ((jnp.clip(l, 1, d - 2) - 1) * h
                      + jnp.clip(r, 0, h - 1)) * w + jnp.clip(c, 0, w - 1)
        return jnp.take(rec, idx, axis=0).astype(jnp.float32)   # [K, 5]

    scale = jnp.exp2(octv.astype(jnp.float32))
    ref = _newton_walk(fetch, cx, cy, clayer, cvalid, d, h, w, scale, cfg)
    return ref, octv


def refine_keypoints_dense(dog: jnp.ndarray, cx, cy, clayer, cvalid,
                           octave: int, cfg: SiftConfig) -> RefinedKeypoints:
    """Single-octave entry (the per-stage replay/parity contract,
    perf/replay.py run_adjust)."""
    d, h, w = dog.shape
    rec = _dense_records(dog, cfg).reshape(-1, 5)

    def fetch(l, r, c):
        idx = ((jnp.clip(l, 1, d - 2) - 1) * h
               + jnp.clip(r, 0, h - 1)) * w + jnp.clip(c, 0, w - 1)
        return jnp.take(rec, idx, axis=0).astype(jnp.float32)   # [K, 5]

    return _newton_walk(fetch, cx, cy, clayer, cvalid, d, h, w,
                        float(1 << octave), cfg)


def _newton_walk(fetch, cx, cy, clayer, cvalid, d, h, w, scale,
                 cfg: SiftConfig) -> RefinedKeypoints:
    """The 5-step walk + accept tests over a record fetcher.  ``h``,
    ``w``, ``scale`` may be scalars (one octave) or per-candidate arrays
    (the all-octave fused walk)."""
    border = SIFT_IMG_BORDER
    c = cx.astype(jnp.int32)
    r = cy.astype(jnp.int32)
    l = clayer.astype(jnp.int32)
    alive = cvalid
    converged = jnp.zeros_like(alive)
    x0 = jnp.zeros(c.shape, jnp.float32)
    x1 = jnp.zeros_like(x0)
    x2 = jnp.zeros_like(x0)

    for _ in range(int(SIFT_MAX_INTERP_STEPS)):
        active = alive & ~converged
        rc = fetch(l, r, c)
        nx0, nx1, nx2 = rc[:, 0], rc[:, 1], rc[:, 2]
        flags = rc[:, 4]
        conv_now = jnp.mod(flags, 2.0) > 0.5
        diverged = jnp.mod(jnp.floor(flags * 0.5), 2.0) > 0.5
        step = active & ~conv_now & ~diverged
        # Step clamps match the packed-record walk (ops/records.py
        # STEP_CLIP_*): spatial steps to [-32, 31], layer to [-8, 7].
        # Layer clamping is exactly equivalent (any |step| > 2 exits
        # [1, d-2] either way); spatial clamping deviates only for
        # |round(x)| > 31 — quadratic-fit steps that large are
        # divergence chases, and both walk paths must agree bit-for-bit.
        nl = l - jnp.clip(jnp.round(nx2), -8, 7).astype(jnp.int32)
        nr = r - jnp.clip(jnp.round(nx1), -32, 31).astype(jnp.int32)
        nc = c - jnp.clip(jnp.round(nx0), -32, 31).astype(jnp.int32)
        oob = ((nl < 1) | (nl > d - 2)
               | (nr < border) | (nr >= h - border)
               | (nc < border) | (nc >= w - border))
        l = jnp.where(step, jnp.clip(nl, 0, d - 1), l)
        r = jnp.where(step, jnp.clip(nr, 0, h - 1), r)
        c = jnp.where(step, jnp.clip(nc, 0, w - 1), c)
        x0 = jnp.where(active & conv_now, nx0, x0)
        x1 = jnp.where(active & conv_now, nx1, x1)
        x2 = jnp.where(active & conv_now, nx2, x2)
        alive = alive & ~(active & (diverged | (step & oob)))
        converged = converged | (active & conv_now)

    ok = alive & converged
    final = fetch(l, r, c)
    contrast = final[:, 3]
    ok = ok & (contrast * cfg.num_octave_layers >= cfg.contrast_threshold)
    # edge_ok bit (bit 2).  Bit arithmetic, not >= 4: plane-layout
    # records (ops/records.py) fold the extrema-peak bit into bit 3, so
    # flags may exceed 7 without the edge bit being set.
    ok = ok & (jnp.mod(jnp.floor(final[:, 4] * 0.25), 2.0) > 0.5)

    if cfg.subpixel:
        fx = (c.astype(jnp.float32) - x0) * scale
        fy = (r.astype(jnp.float32) - x1) * scale
    else:
        fx = c.astype(jnp.float32) * scale
        fy = r.astype(jnp.float32) * scale
    xi = -x2
    size = (cfg.sigma * jnp.power(2.0, (l.astype(jnp.float32) + xi)
                                  / cfg.num_octave_layers) * scale * 2.0)
    return RefinedKeypoints(x=fx, y=fy, layer=l, xi=xi, size=size,
                            response=contrast, valid=ok)
