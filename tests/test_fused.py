"""Fused-Pallas kernel parity (kernels/fused_stages.py, interpret mode).

The production TPU path computes orientation histograms and descriptors
inside ONE Pallas kernel per stage (raw-window DMA + in-VMEM gradients and
histogram accumulation).  These tests gate that path — run through the
Pallas interpreter on CPU — against the flat XLA formulations, which are
themselves OpenCV-gated by test_pipeline.py.  Together the two hops give
the TPU path OpenCV parity without TPU hardware in CI (the strategy the
reference applies with its HostInterface replay, interface/HostInterface.cu).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sift_tpu.config import SiftConfig
from sift_tpu.core.types import build_plan
from sift_tpu.ops import descriptor as D
from sift_tpu.ops import orientation as O
from sift_tpu.kernels.window_gather import window_rows
from sift_tpu.ops.descriptor import max_descr_radius
from sift_tpu.ops.flatpyr import (dense_gradients_packed,
                                  dense_gradients_padded, pad_pyramid,
                                  shift_copies, stack_pyramid)
from sift_tpu.ops.orientation import max_ori_radius
from sift_tpu.pipeline.detector import build_detect_fn


@pytest.fixture(scope="module")
def fused_setup():
    rng = np.random.default_rng(0)
    cfg = SiftConfig(width=320, height=240, gather_impl="xla")
    L = cfg.num_octave_layers + 3
    blocks = []
    h, w = 240, 320
    for o in range(3):
        blocks.append(jnp.asarray(
            rng.normal(100, 40, (L, h >> o, w >> o)).astype(np.float32)))

    gauss = pad_pyramid(blocks)
    rmax = max(max_descr_radius(cfg), max_ori_radius(cfg))
    slab = stack_pyramid(blocks, extra_rows=window_rows(rmax), copies=4,
                         layer_lo=1, layer_hi=L - 2)

    K = 48
    octv = rng.integers(0, 3, K).astype(np.int32)
    hs = np.array([240, 120, 60])[octv]
    ws = np.array([320, 160, 80])[octv]
    px = rng.uniform(2, ws - 3)
    py = rng.uniform(2, hs - 3)
    # Sizes straddle the static window bound: the pipeline only emits
    # scl_octv <= sigma * 2^((L+.5)/L) (max_descr_radius), but the
    # kernels must stay sane past it — an out-of-contract keypoint's
    # masks rely on the uncapped par radius, which once let rolled
    # pack=1 windows pass wrapped lanes as far-off pixels (descriptor
    # max-abs error 39 quantized units vs the flat path's 7).
    kp = dict(
        octave=jnp.asarray(octv),
        x=jnp.asarray(px * (2.0 ** octv), jnp.float32),
        y=jnp.asarray(py * (2.0 ** octv), jnp.float32),
        layer=jnp.asarray(rng.integers(1, L - 2, K), jnp.int32),
        size=jnp.asarray(rng.uniform(1.6, 18.0, K) * (2.0 ** octv),
                         jnp.float32),
        angle=jnp.asarray(rng.uniform(0, 360, K), jnp.float32),
        valid=jnp.asarray(rng.uniform(0, 1, K) > 0.1),
    )
    # In-contract mask: descriptor radius within the static window bound.
    scl = np.asarray(kp["size"]) * 0.5 * (2.0 ** -octv.astype(np.float64))
    radius = np.round(3.0 * scl * np.sqrt(2.0) * 2.5)
    kp["in_contract"] = radius <= max_descr_radius(cfg)
    return cfg, gauss, slab, kp


def test_orientation_fused_matches_flat(fused_setup):
    cfg, gauss, slab, kp = fused_setup
    o_mag, o_ori = dense_gradients_padded(gauss)
    o_mag, o_ori = shift_copies(o_mag), shift_copies(o_ori)
    h_flat = O.orientation_histograms_flat(
        o_mag, o_ori, kp["octave"], kp["x"], kp["y"], kp["layer"],
        kp["size"], kp["valid"], cfg)
    h_fused = O.orientation_histograms_fused(
        slab, kp["octave"], kp["x"], kp["y"], kp["layer"],
        kp["size"], kp["valid"], cfg, interpret=True)
    a, b = np.asarray(h_flat), np.asarray(h_fused)
    # f32 accumulation-order noise only — for keypoints inside the
    # static radius bound.  Out-of-contract patches overflow their
    # lane-packing segment and truncate differently from the flat
    # window (unreachable from the pipeline); they only must stay
    # finite.
    inc = kp["in_contract"]
    rel = np.max(np.abs(a - b) / (np.abs(a) + 1e-3), axis=1)
    assert rel[inc].max() < 1e-4
    assert np.isfinite(b).all()


def test_descriptor_fused_matches_flat(fused_setup):
    cfg, gauss, slab, kp = fused_setup
    gradp = shift_copies(dense_gradients_packed(gauss))
    d_flat, n_flat = D.compute_descriptors_flat(
        gradp, kp["octave"], kp["x"], kp["y"], kp["layer"], kp["size"],
        kp["angle"], kp["valid"], cfg)
    d_fused, n_fused = D.compute_descriptors_fused(
        slab, kp["octave"], kp["x"], kp["y"], kp["layer"], kp["size"],
        kp["angle"], kp["valid"], cfg, interpret=True)
    qf = np.asarray(D.quantize_descriptor(d_flat, n_flat, "opencv"))
    qp = np.asarray(D.quantize_descriptor(d_fused, n_fused, "opencv"))
    # The flat path reads 10/14-bit packed gradients; fused recomputes
    # full-precision gradients in-kernel.  The reference's own descriptor
    # tolerance is +-1 quantized unit (HostInterface.cu:369-376).
    diff = np.abs(qf - qp).max(axis=1)
    inc = kp["in_contract"]
    assert diff[inc].max() <= 1.0
    # Out-of-contract keypoints (never produced by the pipeline) only
    # have to stay window-extent-close to the flat path; the rolled
    # pack=1 wrap bug scored 39 here.
    assert diff[~inc].max() <= 10.0
    assert (np.abs(qf - qp) > 0).mean() < 0.1


def test_detector_fused_end_to_end(test_image):
    """Full pipeline: production fused path (interpret) == flat path."""
    mk = lambda gi: SiftConfig(width=320, height=240, num_features=512,
                               gather_impl=gi)
    flat = build_detect_fn(build_plan(mk("xla")))
    fused = build_detect_fn(build_plan(mk("pallas_interpret")))
    img = jnp.asarray(test_image, jnp.float32)
    rf = flat(img)
    rp = fused(img)
    assert int(rf.count) == int(rp.count) > 50
    n = int(rf.count)
    np.testing.assert_allclose(np.asarray(rf.keypoints.x[:n]),
                               np.asarray(rp.keypoints.x[:n]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rf.keypoints.angle[:n]),
                               np.asarray(rp.keypoints.angle[:n]), atol=0.05)
    dd = np.abs(np.asarray(rf.descriptors[:n], np.int32)
                - np.asarray(rp.descriptors[:n], np.int32))
    assert dd.max() <= 1.0


def test_descriptor_fused_2copy_slab(fused_setup):
    """The 2-copy slab path (production for frames >= 256 lanes wide):
    unpacked big-radius patches ride rolled 256-lane windows.  Same
    tolerance as the 4-copy path vs the flat formulation."""
    cfg, gauss, slab4, kp = fused_setup
    import numpy as np
    from sift_tpu.kernels.window_gather import window_rows
    L = cfg.num_octave_layers + 3
    rmax = max(max_descr_radius(cfg), max_ori_radius(cfg))
    del slab4  # rebuild the stacked slab with 2 lane-shifted copies
    slab2 = stack_pyramid(
        [jnp.asarray(b) for b in _slab_source_blocks(fused_setup)],
        extra_rows=window_rows(rmax), copies=2, layer_lo=1,
        layer_hi=L - 2)
    gradp = shift_copies(dense_gradients_packed(gauss))
    d_flat, n_flat = D.compute_descriptors_flat(
        gradp, kp["octave"], kp["x"], kp["y"], kp["layer"], kp["size"],
        kp["angle"], kp["valid"], cfg)
    d_fused, n_fused = D.compute_descriptors_fused(
        slab2, kp["octave"], kp["x"], kp["y"], kp["layer"], kp["size"],
        kp["angle"], kp["valid"], cfg, interpret=True)
    qf = np.asarray(D.quantize_descriptor(d_flat, n_flat, "opencv"))
    qp = np.asarray(D.quantize_descriptor(d_fused, n_fused, "opencv"))
    diff = np.abs(qf - qp).max(axis=1)
    inc = kp["in_contract"]
    assert diff[inc].max() <= 1.0
    assert np.isfinite(qp).all()


def _slab_source_blocks(fused_setup):
    """Recreate the fixture's raw per-octave blocks (deterministic)."""
    import numpy as np
    rng = np.random.default_rng(0)
    cfg = fused_setup[0]
    L = cfg.num_octave_layers + 3
    blocks = []
    h, w = 240, 320
    for o in range(3):
        blocks.append(rng.normal(
            100, 40, (L, h >> o, w >> o)).astype(np.float32))
    return blocks
