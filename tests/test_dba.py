"""Distributed BA on the 8-device virtual mesh: must match single-device
LM exactly (the psum-reduced normal equations are the same sums)."""
import numpy as np
import jax
import pytest

from sift_tpu.geometry.ba import lm_optimize
from sift_tpu.parallel.batched import make_mesh
from sift_tpu.parallel.dba import make_distributed_lm
from tests.test_ba import synthetic_ba


def test_distributed_matches_single_device():
    prob, rots_gt, _, _ = synthetic_ba(seed=0, n_cams=5, n_pts=96)
    single = jax.jit(lambda p: lm_optimize(p, iterations=10))(prob)

    mesh = make_mesh(8)
    fn, place = make_distributed_lm(mesh, iterations=10)
    dist = fn(place(prob))

    assert float(dist.cost) < 1e-4
    np.testing.assert_allclose(np.asarray(dist.cost),
                               np.asarray(single.cost), rtol=1e-2,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist.rotations),
                               np.asarray(single.rotations), atol=1e-4)


def test_distributed_handles_nondivisible_observations():
    prob, *_ = synthetic_ba(seed=1, n_cams=4, n_pts=37)  # 148 obs % 8 != 0
    mesh = make_mesh(8)
    fn, place = make_distributed_lm(mesh, iterations=8)
    out = fn(place(prob))
    assert float(out.cost) < 1e-4
