"""Dense-field refinement must reproduce the sparse reference
implementation decision-for-decision."""
import numpy as np
import jax.numpy as jnp

from sift_tpu.config import SIFT_IMG_BORDER, SiftConfig
from sift_tpu.core.types import build_plan
from sift_tpu.ops.peaks import find_candidates
from sift_tpu.ops.pyramid import dog_pyramid, gaussian_pyramid
from sift_tpu.ops.refine import refine_keypoints
from sift_tpu.ops.refine_dense import refine_keypoints_dense


def test_dense_matches_sparse(test_image):
    h, w = test_image.shape
    cfg = SiftConfig(width=w, height=h)
    plan = build_plan(cfg)
    gauss = gaussian_pyramid(plan, jnp.asarray(test_image))
    dogs = dog_pyramid(gauss)
    total = 0
    for o in range(min(4, cfg.num_octaves)):
        op = plan.octaves[o]
        cx, cy, cl, cv = find_candidates(
            dogs[o], cfg.peak_threshold, SIFT_IMG_BORDER, op.cand_cap)
        a = refine_keypoints(dogs[o], cx, cy, cl, cv, o, cfg)
        b = refine_keypoints_dense(dogs[o], cx, cy, cl, cv, o, cfg)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid), err_msg=f"o{o}")
        m = np.asarray(a.valid)
        total += int(m.sum())
        for f in ("x", "y", "layer", "xi", "size", "response"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, f))[m], np.asarray(getattr(b, f))[m],
                rtol=1e-4, atol=1e-4, err_msg=f"octave {o} field {f}")
    assert total > 30


def test_fused_all_octave_walk_matches_per_octave(test_image):
    """refine_keypoints_dense_all (one walk over every octave's
    candidates, the pipeline path) must equal the per-octave walks."""
    from sift_tpu.ops.refine_dense import refine_keypoints_dense_all

    h, w = test_image.shape
    cfg = SiftConfig(width=w, height=h)
    plan = build_plan(cfg)
    gauss = gaussian_pyramid(plan, jnp.asarray(test_image))
    dogs = dog_pyramid(gauss)
    cands = [find_candidates(dogs[o], cfg.peak_threshold, SIFT_IMG_BORDER,
                             plan.octaves[o].cand_cap)
             for o in range(cfg.num_octaves)]
    ref, octv = refine_keypoints_dense_all(dogs, cands, cfg)

    pos = 0
    for o, (cx, cy, cl, cv) in enumerate(cands):
        n = cx.shape[0]
        a = refine_keypoints_dense(dogs[o], cx, cy, cl, cv, o, cfg)
        sl = slice(pos, pos + n)
        np.testing.assert_array_equal(np.asarray(octv[sl]), o)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(ref.valid[sl]))
        m = np.asarray(a.valid)
        for f in ("x", "y", "layer", "xi", "size", "response"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, f))[m],
                np.asarray(getattr(ref, f)[sl])[m],
                rtol=1e-5, atol=1e-5, err_msg=f"octave {o} field {f}")
        pos += n
