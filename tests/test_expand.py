"""Direct gates for kernels/expand.py (round-4 advisor finding: the
kernel was wired into the production fused path with only transitive
coverage).  Bit-identity against the XLA concat-of-pad-slices
formulation it replaces (ops/flatpyr.stack_pyramid's expand_impl="xla"
path), over both tile paths:

* hs % EXPAND_TILE == 0  -> the 256-row tile path;
* hs % EXPAND_TILE != 0  -> the 8-row tile path.

The device (Mosaic-lowered) twin lives in
tests_tpu/test_device_kernels.py::test_expand_lane_copies_on_device.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sift_tpu.kernels.expand import EXPAND_TILE, LANES, expand_lane_copies


def xla_expand(base, copies):
    """The reference formulation: copy c = base lane-shifted LEFT by
    c * 128/copies with a zeroed tail."""
    hs, ws = base.shape
    step = LANES // copies
    outs = []
    for c in range(copies):
        s = c * step
        outs.append(jnp.pad(base[:, s:], ((0, 0), (0, s))))
    return jnp.concatenate(outs, axis=0)


@pytest.mark.parametrize("copies", [2, 4])
@pytest.mark.parametrize("hs,ws", [
    (EXPAND_TILE, 256),          # EXPAND_TILE path
    (2 * EXPAND_TILE, 384),      # EXPAND_TILE path, multiple tiles
    (40, 256),                   # 8-row tile path (hs % 256 != 0)
    (8, 128),                    # minimal 8-row tile
    (EXPAND_TILE, 2560),         # wide slab: VMEM-capped halved tile
])
def test_expand_matches_xla(copies, hs, ws):
    rng = np.random.default_rng(hs * 7 + ws + copies)
    base = jnp.asarray(rng.normal(0, 50, (hs, ws)).astype(np.float32))
    got = expand_lane_copies(base, copies, interpret=True)
    want = xla_expand(base, copies)
    assert got.shape == (copies * hs, ws)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_expand_copies_1_identity():
    base = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = expand_lane_copies(base, 1, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
