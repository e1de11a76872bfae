"""Monocular odometry on a rendered synthetic 3D sequence, ATE-gated
(the hermetic stand-in for the TUM/KITTI gate — same metric, synthetic
ground truth)."""
import numpy as np
import pytest

from sift_tpu.config import SiftConfig
from sift_tpu.geometry.odometry import MonocularOdometry
from sift_tpu.geometry.trajectory import ate_rmse


W, H = 320, 240
FX = 0.9 * W


def render_sequence(n_frames=8, seed=5, n_pts=160):
    """Textured 3D blob cloud viewed from a smooth lateral+forward
    trajectory with slight yaw.  Returns (frames, gt_positions)."""
    import cv2

    rng = np.random.default_rng(seed)
    pts = rng.uniform([-4, -2.5, 6], [4, 2.5, 16], (n_pts, 3))
    radii = rng.uniform(0.06, 0.3, n_pts)
    vals = rng.uniform(60, 255, n_pts)

    frames, gt_pos = [], []
    for i in range(n_frames):
        ang = 0.01 * i
        c, s = np.cos(ang), np.sin(ang)
        r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        center = np.array([-0.22 * i, 0.03 * i, 0.12 * i])
        t = -r @ center
        img = np.zeros((H, W), np.float32)
        pc = pts @ r.T + t
        order = np.argsort(-pc[:, 2])
        for j in order:
            if pc[j, 2] <= 0.5:
                continue
            u = pc[j, 0] / pc[j, 2] * FX + W / 2
            v = pc[j, 1] / pc[j, 2] * FX + H / 2
            rad = max(2, int(radii[j] / pc[j, 2] * FX))
            cv2.circle(img, (int(u), int(v)), rad, float(vals[j]), -1)
        img += rng.normal(0, 3, (H, W)).astype(np.float32)
        frames.append(np.clip(img, 0, 255))
        gt_pos.append(center)
    return frames, np.stack(gt_pos)


@pytest.fixture(scope="module")
def sequence():
    return render_sequence()


def _run_odometry(frames, **kw):
    odo = MonocularOdometry(
        SiftConfig(width=W, height=H, num_features=800),
        fx=FX, fy=FX, cx=W / 2, cy=H / 2, **kw)
    for f in frames:
        odo.process(f)
    return odo


def test_odometry_ate(sequence):
    frames, gt = sequence
    odo = _run_odometry(frames)
    est = odo.result.positions()
    assert len(est) == len(gt)
    # tracked throughout, and PnP landmark tracking actually engaged
    # (bootstrap-only chains have no consistent scale)
    assert min(odo.result.n_inliers[1:]) >= 12
    assert odo.result.modes[1] == "bootstrap"
    assert all(m == "pnp" for m in odo.result.modes[2:]), odo.result.modes
    # monocular: align with scale; trajectory length ~3.2 units
    ate = ate_rmse(est, gt, with_scale=True)
    assert ate < 0.15, f"ATE {ate}"


def test_odometry_with_window_ba(sequence):
    frames, gt = sequence
    odo = _run_odometry(frames, ba_interval=3, ba_window=4)
    ate = ate_rmse(odo.result.positions(), gt, with_scale=True)
    assert ate < 0.15, f"ATE with BA {ate}"


def test_odometry_poses_consistent(sequence):
    frames, _ = sequence
    odo = _run_odometry(frames[:3])
    poses = odo.result.poses_cam_to_world()
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
    pos = odo.result.positions()
    np.testing.assert_allclose(pos[0], 0, atol=1e-6)
    # camera moves between frames
    assert np.linalg.norm(pos[2] - pos[1]) > 1e-3
