"""Multi-host execution: 2 processes x 4 CPU devices must produce results
identical to a single process (SURVEY §2.2 multi-device DP + comm backend;
the DCN-spanning layer, parallel/multihost.py).

The cluster runs in subprocesses (jax.distributed needs one controller per
process); the single-process reference runs in-test on the 8-device
virtual mesh.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for w in workers:
        out, _ = w.communicate(timeout=900)
        logs.append(out.decode(errors="replace"))
    assert all(w.returncode == 0 for w in workers), "\n".join(logs)

    got = np.load(tmp_path / "multihost_out.npz")

    # Single-process reference on the in-test 8-device CPU mesh.
    from sift_tpu.config import SiftConfig
    from sift_tpu.core.types import build_plan
    from sift_tpu.parallel.batched import make_mesh, make_sharded_pipeline
    from sift_tpu.parallel.dba import make_distributed_lm
    from tests.multihost_worker import det_frames
    from tests.test_ba import synthetic_ba

    cfg = SiftConfig(width=64, height=64, num_features=128,
                     max_candidates_per_octave=256)
    plan = build_plan(cfg)
    mesh = make_mesh(8)
    fn, shard = make_sharded_pipeline(plan, mesh)
    frames = det_frames(8, 64, 64)
    res, matches = fn(shard(frames))

    assert int(np.sum(got["count"])) > 0
    np.testing.assert_array_equal(got["count"], np.asarray(res.count))
    np.testing.assert_allclose(got["x"], np.asarray(res.keypoints.x),
                               atol=1e-5)
    np.testing.assert_array_equal(got["desc"], np.asarray(res.descriptors))
    np.testing.assert_array_equal(got["matches"], np.asarray(matches))

    prob, _, _, _ = synthetic_ba(seed=0, n_cams=5, n_pts=96)
    lm, place = make_distributed_lm(mesh, iterations=10)
    state = lm(place(prob))
    np.testing.assert_allclose(float(got["ba_cost"]), float(state.cost),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(got["ba_rot"], np.asarray(state.rotations),
                               atol=1e-5)
