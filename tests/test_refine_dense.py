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
