"""Golden-checkpoint capture + per-stage replay verification round-trip
(≙ tool/perf.cu over Detector::setDataGen output)."""
import numpy as np
import pytest

from sift_tpu.config import SiftConfig
from sift_tpu.perf.checkpoint import capture_golden, load_golden
from sift_tpu.perf.replay import Replayer


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    from tests.conftest import synthetic_image

    path = str(tmp_path_factory.mktemp("golden"))
    img = synthetic_image(height=120, width=160, seed=2, n_blobs=20)
    cfg = SiftConfig(width=160, height=120, num_features=500)
    capture_golden(cfg, img, path)
    return path


def test_roundtrip_and_replay_all(checkpoint):
    params, inputs, expected = load_golden(checkpoint)
    rep = Replayer(params, inputs, expected)
    results = rep.run_all()
    failures = {k: v for k, v in results.items() if not v[0]}
    assert not failures, f"stage replays failed: {failures}"


def test_checkpoint_files_exist(checkpoint):
    import os

    for f in ("params.npz", "input.npz", "expected.npz"):
        assert os.path.exists(os.path.join(checkpoint, f))


def test_replay_detects_corruption(checkpoint):
    """A corrupted golden output must fail verification."""
    params, inputs, expected = load_golden(checkpoint)
    expected = dict(expected)
    expected["dog0"] = expected["dog0"] + 1.0
    rep = Replayer(params, inputs, expected)
    ok, _ = rep.run_minus()
    assert not ok
