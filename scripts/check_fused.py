"""Scratch parity check: fused Pallas (interpret) vs flat XLA paths."""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from sift_tpu.config import SiftConfig
from sift_tpu.kernels.window_gather import window_rows
from sift_tpu.ops.descriptor import max_descr_radius
from sift_tpu.ops.flatpyr import (dense_gradients_packed,
                                  dense_gradients_padded, pad_pyramid,
                                  shift_copies, stack_pyramid)
from sift_tpu.ops.orientation import max_ori_radius
from sift_tpu.ops import descriptor as D
from sift_tpu.ops import orientation as O

rng = np.random.default_rng(0)
cfg = SiftConfig(width=320, height=240, gather_impl="xla")

# Synthetic 3-octave pyramid, 6 layers each
blocks = []
h, w = 240, 320
L = cfg.num_octave_layers + 3
for o in range(3):
    blocks.append(jnp.asarray(
        rng.normal(100, 40, (L, h >> o, w >> o)).astype(np.float32)))

gauss = pad_pyramid(blocks)
rmax = max(max_descr_radius(cfg), max_ori_radius(cfg))
slab = stack_pyramid(blocks, extra_rows=window_rows(rmax), copies=4,
                     layer_lo=1, layer_hi=L - 2)
gradp = shift_copies(dense_gradients_packed(gauss))
o_mag, o_ori = dense_gradients_padded(gauss)
o_mag, o_ori = shift_copies(o_mag), shift_copies(o_ori)

K = 64
octv = rng.integers(0, 3, K).astype(np.int32)
hs = np.array([240, 120, 60])[octv]
ws = np.array([320, 160, 80])[octv]
# keypoint coords in base-image space; keep inside octave bounds
px = rng.uniform(2, ws - 3)
py = rng.uniform(2, hs - 3)
x = jnp.asarray(px * (2.0 ** octv), jnp.float32)
y = jnp.asarray(py * (2.0 ** octv), jnp.float32)
layer = jnp.asarray(rng.integers(1, L - 2, K), jnp.int32)
size = jnp.asarray(rng.uniform(1.6, 6.0, K) * (2.0 ** octv), jnp.float32)
angle = jnp.asarray(rng.uniform(0, 360, K), jnp.float32)
valid = jnp.asarray(rng.uniform(0, 1, K) > 0.1)
octv = jnp.asarray(octv)

# --- orientation ---
h_flat = O.orientation_histograms_flat(
    o_mag, o_ori, octv, x, y, layer, size, valid, cfg)
h_fused = O.orientation_histograms_fused(
    slab, octv, x, y, layer, size, valid, cfg, interpret=True)
d = np.abs(np.asarray(h_flat) - np.asarray(h_fused))
rel = d / (np.abs(np.asarray(h_flat)) + 1e-3)
print("ori: max abs diff", d.max(), "max rel", rel.max())

# --- descriptor ---
desc_f, n_f = D.compute_descriptors_flat(
    gradp, octv, x, y, layer, size, angle, valid, cfg)
desc_p, n_p = D.compute_descriptors_fused(
    slab, octv, x, y, layer, size, angle, valid, cfg, interpret=True)
qf = D.quantize_descriptor(desc_f, n_f, "opencv")
qp = D.quantize_descriptor(desc_p, n_p, "opencv")
dd = np.abs(np.asarray(qf) - np.asarray(qp))
print("desc: max quantized diff", dd.max(),
      "mean", dd.mean(), "frac>1:", (dd > 1).mean())
