"""Flattened-pyramid addressing: gather per-keypoint patches from any
octave/layer out of ONE concatenated buffer.

TPU-native replacement for the reference's per-octave kernel launches with
device-pointer tables (types/SiftData.cuh:14-21, the MemLocData indirection
that feeds its cross-octave gather).  Here the pyramid becomes a single
flat [N] array plus static per-octave (offset, height, width) tables;
keypoints from ALL octaves are processed by one batched gather, so
orientation/descriptor run once per frame instead of once per octave.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp


class FlatPyramid(NamedTuple):
    """values: [N] flat buffer; per-octave static geometry tables
    (device-resident int32 [n_octaves])."""

    values: jnp.ndarray
    base_offset: jnp.ndarray  # offset of octave o's block
    height: jnp.ndarray       # h_o
    width: jnp.ndarray        # w_o

    def octave_geometry(self, octave: jnp.ndarray):
        """Per-keypoint (offset, h, w) for octave indices [K]."""
        return (jnp.take(self.base_offset, octave),
                jnp.take(self.height, octave),
                jnp.take(self.width, octave))


def flatten_pyramid(blocks: List[jnp.ndarray]) -> FlatPyramid:
    """blocks: per-octave [D, H_o, W_o] stacks (all same D)."""
    offs, hs, ws = [], [], []
    acc = 0
    for b in blocks:
        d, h, w = b.shape
        offs.append(acc)
        hs.append(h)
        ws.append(w)
        acc += d * h * w
    values = jnp.concatenate([b.reshape(-1) for b in blocks])
    return FlatPyramid(
        values=values,
        base_offset=jnp.asarray(np.array(offs, np.int32)),
        height=jnp.asarray(np.array(hs, np.int32)),
        width=jnp.asarray(np.array(ws, np.int32)))


def gather_patches_flat(flat: FlatPyramid, octave, layer, cy, cx,
                        size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched [K, size, size] patch gather centered at (cy, cx) of
    (octave, layer), clamped to each keypoint's own octave bounds.

    Returns (patch, off) with off = [-R..R] the patch coordinate offsets.
    Consumers must mask positions whose unclamped coordinates fall outside
    the octave image.
    """
    r = size // 2
    off = jnp.arange(size, dtype=jnp.int32) - r
    base, h, w = flat.octave_geometry(octave)
    lbase = base + layer.astype(jnp.int32) * h * w
    ys = jnp.clip(cy[:, None] + off[None, :], 0,
                  (h - 1)[:, None])                          # [K, S]
    xs = jnp.clip(cx[:, None] + off[None, :], 0,
                  (w - 1)[:, None])                          # [K, S]
    idx = (lbase[:, None, None] + ys[:, :, None] * w[:, None, None]
           + xs[:, None, :])                                 # [K, S, S]
    patch = jnp.take(flat.values, idx.reshape(idx.shape[0], -1),
                     axis=0).reshape(-1, size, size)
    return patch, off


def dense_gradients(blocks: List[jnp.ndarray]):
    """Per-octave dense gradient magnitude and orientation (degrees,
    [0, 360)) of every layer, computed ONCE per frame (the reference
    recomputes gradients inside every per-keypoint window,
    SiftOps.cu:299-325,537-556 — here the transcendentals are dense and
    fused, and keypoint stages just gather).

    dx = I[y, x+1] - I[y, x-1];  dy = I[y-1, x] - I[y+1, x].
    Border pixels (the 1-px rim) hold garbage and must be masked by
    consumers — matching the reference's x/y in [1, size-2] guard.
    """
    mags, oris = [], []
    for b in blocks:
        dx = jnp.roll(b, -1, axis=-1) - jnp.roll(b, 1, axis=-1)
        dy = jnp.roll(b, 1, axis=-2) - jnp.roll(b, -1, axis=-2)
        mags.append(jnp.sqrt(dx * dx + dy * dy))
        ori = jnp.arctan2(dy, dx) * (180.0 / np.pi)
        oris.append(jnp.where(ori < 0, ori + 360.0, ori))
    return mags, oris
