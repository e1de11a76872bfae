"""Plane-layout record-field parity (ops/records.py +
kernels/fused_detect.py, interpret mode).

The production TPU path computes DoG + extrema + Newton records in ONE
Pallas pass per octave.  Gates: (a) the kernel's record field equals
the jnp reference layout on the valid interior, (b) candidates off the
flags peak bit equal ops/peaks.find_candidates, (c) the plane-layout
walk equals the stacked-record walk the replay/parity layer uses.
"""
import jax.numpy as jnp
import numpy as np

from sift_tpu.config import SIFT_IMG_BORDER, SiftConfig
from sift_tpu.core.types import build_plan
from sift_tpu.ops.peaks import find_candidates
from sift_tpu.ops.pyramid import dog_pyramid, gaussian_pyramid
from sift_tpu.ops.records import (candidates_from_records,
                                  detect_records, records_jnp,
                                  walk_records_all)
from sift_tpu.ops.refine_dense import refine_keypoints_dense_all


def _gauss(test_image, cfg):
    plan = build_plan(cfg)
    return plan, gaussian_pyramid(plan, jnp.asarray(test_image))


def test_pallas_records_match_jnp(test_image):
    h, w = test_image.shape
    cfg = SiftConfig(width=w, height=h)
    _, gauss = _gauss(test_image, cfg)
    for o in range(2):
        ref = records_jnp(gauss[o], cfg)
        fus = detect_records(gauss[o], cfg, "pallas_interpret")
        assert fus.values.shape[0] == ref.values.shape[0]
        ho, wo = ref.h, ref.w
        a = np.asarray(ref.values[:, :, 1:ho - 1, 1:wo - 1],
                       np.float64).astype(np.int64)
        b = np.asarray(fus.values[:, :, 1:ho - 1, 1:wo - 1],
                       np.float64).astype(np.int64)
        # All five decision bits of A (conv, div, edge, peak,
        # contrast_ok) must agree exactly — same f32 expressions in
        # both impls.
        np.testing.assert_array_equal(a[0] % 32, b[0] % 32,
                                      err_msg=f"octave {o} flag bits")
        # The rounded-step payloads and the B/C quantized payloads sit
        # one round() away from raw f32 values: Cramer-ratio
        # cancellation noise between the two impls can flip a
        # quantization step on rare ill-conditioned pixels (measured:
        # ~1e-4 of pixels, always by exactly one quantum).
        n = a[0].size
        assert (a[0] != b[0]).sum() <= max(3, n // 100_000)
        assert (a[1] != b[1]).sum() <= max(30, n // 5_000)
        assert (a[2] != b[2]).sum() <= max(80, n // 2_000)
        # On CONV pixels (the only places the walk consumes B/C as
        # values) any difference must be a single quantization step.
        # Non-conv pixels include near-singular Hessians where Cramer
        # cancellation amplifies f32 noise by orders of magnitude —
        # bounded in count above, unconstrained in size.
        conv = (a[0] % 2).astype(bool)
        for ch, quanta in ((1, (1, 2047, 2048, 2049)),
                           (2, (1, 1023, 1024, 1025))):
            d = np.abs(np.where(conv, a[ch] - b[ch], 0))
            bad = d[d > 0]
            assert np.isin(bad, quanta).all() or bad.size == 0, \
                f"octave {o} ch {ch}: non-unit quant diffs on conv"


def test_candidates_match_find_candidates(test_image):
    h, w = test_image.shape
    cfg = SiftConfig(width=w, height=h)
    plan, gauss = _gauss(test_image, cfg)
    dogs = dog_pyramid(gauss)
    total = 0
    for o in range(3):
        cap = plan.octaves[o].cand_cap
        ax, ay, al, av = find_candidates(dogs[o], cfg.peak_threshold,
                                         SIFT_IMG_BORDER, cap)
        rec = records_jnp(gauss[o], cfg)
        bx, by, bl, bv = candidates_from_records(rec, cap)
        np.testing.assert_array_equal(np.asarray(av), np.asarray(bv))
        m = np.asarray(av)
        total += int(m.sum())
        for name, pa, pb in (("x", ax, bx), ("y", ay, by), ("l", al, bl)):
            np.testing.assert_array_equal(
                np.asarray(pa)[m], np.asarray(pb)[m],
                err_msg=f"octave {o} {name}")
    assert total > 50


def test_plane_walk_matches_stacked_walk(test_image):
    h, w = test_image.shape
    cfg = SiftConfig(width=w, height=h)
    plan, gauss = _gauss(test_image, cfg)
    dogs = dog_pyramid(gauss)
    recs = [records_jnp(gauss[o], cfg) for o in range(cfg.num_octaves)]
    cands = [candidates_from_records(recs[o], plan.octaves[o].cand_cap)
             for o in range(cfg.num_octaves)]
    a, aoct = refine_keypoints_dense_all(dogs, cands, cfg)
    b, boct = walk_records_all(recs, cands, cfg)
    np.testing.assert_array_equal(np.asarray(aoct), np.asarray(boct))
    # Accept decisions are bit-identical (contrast_ok is decided at
    # full precision in the record pass; both walks clamp steps the
    # same way) — only the OUTPUT values carry the packing quantization
    # (x0/x1 at 1/2000 px in octave coords, x2 at 1/1000, response at
    # 1/8191).
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    m = np.asarray(a.valid)
    assert m.sum() > 30
    scale = 2.0 ** np.asarray(aoct, np.float64)[m]
    tol = {"x": scale * 6e-4, "y": scale * 6e-4, "layer": 0.0,
           "xi": 6e-4, "size": None, "response": 7e-5}
    for f in ("x", "y", "layer", "xi", "response"):
        d = np.abs(np.asarray(getattr(a, f), np.float64)[m]
                   - np.asarray(getattr(b, f), np.float64)[m])
        assert (d <= tol[f] + 1e-9).all(), (f, d.max())
    np.testing.assert_allclose(np.asarray(a.size)[m],
                               np.asarray(b.size)[m], rtol=2e-4)


def test_walk_global_candidate_cap(test_image):
    """The pre-walk global candidate compaction (active when the summed
    per-octave candidate capacity exceeds 2*num_features) is a pure
    capacity change: when the frame's raw candidate count fits the
    bound, survivors are identical to the uncapped walk."""
    h, w = test_image.shape
    big = SiftConfig(width=w, height=h, num_features=5000)
    plan, gauss = _gauss(test_image, big)
    recs = [records_jnp(gauss[o], big) for o in range(big.num_octaves)]
    cands = [candidates_from_records(recs[o], plan.octaves[o].cand_cap)
             for o in range(big.num_octaves)]
    n_raw = int(sum(np.asarray(cc[3]).sum() for cc in cands))
    total_cap = sum(cc[0].shape[0] for cc in cands)
    # Small feature budget but still above the frame's raw candidate
    # count: the capped walk must keep every live candidate.
    small = SiftConfig(width=w, height=h,
                       num_features=max(64, (n_raw + 1) // 2 + 1))
    assert 2 * small.num_features < total_cap, "cap path not exercised"
    assert 2 * small.num_features >= n_raw

    a, aoct = walk_records_all(recs, cands, big)       # uncapped
    b, boct = walk_records_all(recs, cands, small)     # capped walk
    ma = np.asarray(a.valid)
    mb = np.asarray(b.valid)
    assert ma.sum() == mb.sum() > 30
    # Survivor streams agree field-by-field (order is octave-major on
    # both sides; the capped walk just dropped dead padding rows).
    for f in ("x", "y", "layer", "xi", "size", "response"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f))[ma], np.asarray(getattr(b, f))[mb],
            err_msg=f)
    np.testing.assert_array_equal(np.asarray(aoct)[ma],
                                  np.asarray(boct)[mb])
