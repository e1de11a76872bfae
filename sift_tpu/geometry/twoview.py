"""Two-view geometry: batched 8-point essential/fundamental estimation,
vectorized RANSAC, pose recovery and triangulation.

New capability (BASELINE north star config #4; the reference stops at
descriptor matching).  TPU-first design: RANSAC is not a sequential
hypothesize-and-verify loop — ALL hypotheses are solved in one vmapped
batch (stacked 8x9 SVDs) and scored against all correspondences with one
[H, N] fused computation, then argmax.  No data-dependent control flow;
jit/vmap-safe end to end.  OpenCV (findEssentialMat/recoverPose) is the
test oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sift_tpu.geometry import se3


class TwoViewResult(NamedTuple):
    e_matrix: jnp.ndarray   # [3, 3] essential matrix
    rotation: jnp.ndarray   # [3, 3]
    translation: jnp.ndarray  # [3] unit norm
    inliers: jnp.ndarray    # [N] bool
    points3d: jnp.ndarray   # [N, 3] triangulated (in camera-1 frame)
    num_inliers: jnp.ndarray  # scalar int32


def pixels_to_normalized(pts: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """[N, 2] pixels -> normalized camera coordinates."""
    return jnp.stack([(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], -1)


def _epipolar_system(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 2] point pairs -> [..., N, 9] rows of the epipolar
    constraint x2^T E x1 = 0 (x = (u, v, 1))."""
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(u1)
    return jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2,
                      u1, v1, one], -1)


def eight_point(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Least-squares epipolar matrix from [..., N>=8, 2] normalized
    correspondences; returns [..., 3, 3] with essential-matrix singular
    values enforced (1, 1, 0)."""
    a = _epipolar_system(p1, p2)
    # Null vector: right-singular vector of smallest singular value.
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    e = vt[..., -1, :].reshape(*a.shape[:-2], 3, 3)
    u, _, vt2 = jnp.linalg.svd(e)
    s = jnp.asarray([1.0, 1.0, 0.0], e.dtype)
    return (u * s[..., None, :]) @ vt2


def sampson_error(e: jnp.ndarray, p1: jnp.ndarray,
                  p2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error, [..., N]."""
    one = jnp.ones_like(p1[..., :1])
    x1 = jnp.concatenate([p1, one], -1)
    x2 = jnp.concatenate([p2, one], -1)
    ex1 = x1 @ jnp.swapaxes(e, -1, -2)           # E @ x1, batched
    etx2 = x2 @ e                                 # E^T @ x2
    num = jnp.sum(x2 * ex1, -1) ** 2
    den = (ex1[..., 0] ** 2 + ex1[..., 1] ** 2
           + etx2[..., 0] ** 2 + etx2[..., 1] ** 2)
    return num / jnp.maximum(den, 1e-12)


def ransac_essential(p1: jnp.ndarray, p2: jnp.ndarray, valid: jnp.ndarray,
                     key: jax.Array, n_hypotheses: int = 256,
                     threshold: float = 1e-4) -> TwoViewResult:
    """Vectorized RANSAC over normalized correspondences.

    p1/p2: [N, 2]; valid: [N] bool; threshold on Sampson error in
    normalized coords ((px_err / f)^2 scale).
    All hypotheses are evaluated in parallel; the best-by-inlier-count is
    refit on its inliers (weighted least squares, no dynamic shapes).
    """
    n = p1.shape[0]
    w = valid.astype(jnp.float32)
    # Sample 8 correspondences per hypothesis, biased to valid entries
    # (invalid rows get ~zero probability).
    logits = jnp.where(valid, 0.0, -1e9)
    idx = jax.vmap(
        lambda k: jax.random.categorical(k, logits, shape=(8,)))(
        jax.random.split(key, n_hypotheses))          # [H, 8]
    h1 = jnp.take(p1, idx, axis=0)                     # [H, 8, 2]
    h2 = jnp.take(p2, idx, axis=0)
    es = eight_point(h1, h2)                           # [H, 3, 3]

    err = sampson_error(es, p1[None], p2[None])        # [H, N]
    inl = (err < threshold) & valid[None]
    scores = jnp.sum(inl, -1)
    best = jnp.argmax(scores)
    best_inl = inl[best]

    # Refit on the best hypothesis' inliers: weighted least squares via
    # eigen-decomposition of A^T W A (static shape, MXU-friendly).
    a = _epipolar_system(p1, p2)                       # [N, 9]
    wts = best_inl.astype(p1.dtype)[:, None]
    ata = (a * wts).T @ a
    evals, evecs = jnp.linalg.eigh(ata)
    e = evecs[:, 0].reshape(3, 3)
    u, _, vt = jnp.linalg.svd(e)
    e = (u * jnp.asarray([1.0, 1.0, 0.0], e.dtype)[None, :]) @ vt

    err2 = sampson_error(e, p1, p2)
    inliers = (err2 < threshold) & valid

    r, t, pts3d = recover_pose(e, p1, p2, inliers)
    return TwoViewResult(e_matrix=e, rotation=r, translation=t,
                         inliers=inliers, points3d=pts3d,
                         num_inliers=jnp.sum(inliers).astype(jnp.int32))


def triangulate(r: jnp.ndarray, t: jnp.ndarray, p1: jnp.ndarray,
                p2: jnp.ndarray) -> jnp.ndarray:
    """Linear (DLT) triangulation in camera-1 frame.  Camera 1 is
    [I | 0], camera 2 is [R | t]; p1/p2 normalized coords [..., N, 2].
    Closed-form 4x4 homogeneous solve via SVD, batched."""
    # Projection rows: for P = [I|0]: rows (2) u*P3 - P1, v*P3 - P2.
    n = p1.shape[-2]
    eye = jnp.broadcast_to(jnp.eye(3), (*p1.shape[:-1], 3, 3))

    def rows(proj_r, proj_t, p):
        p3 = jnp.concatenate([proj_r[..., 2, :], proj_t[..., 2:3]], -1)
        p1_ = jnp.concatenate([proj_r[..., 0, :], proj_t[..., 0:1]], -1)
        p2_ = jnp.concatenate([proj_r[..., 1, :], proj_t[..., 1:2]], -1)
        return (p[..., 0:1] * p3 - p1_, p[..., 1:2] * p3 - p2_)

    z = jnp.zeros((*p1.shape[:-1], 3))
    r1a, r1b = rows(eye, z, p1)
    rb = jnp.broadcast_to(r, (*p1.shape[:-1], 3, 3))
    tb = jnp.broadcast_to(t, (*p1.shape[:-1], 3))
    r2a, r2b = rows(rb, tb, p2)
    a = jnp.stack([r1a, r1b, r2a, r2b], -2)           # [..., 4, 4]
    _, _, vt = jnp.linalg.svd(a)
    x = vt[..., -1, :]
    return x[..., :3] / jnp.where(
        jnp.abs(x[..., 3:]) < 1e-12, 1e-12, x[..., 3:])


def recover_pose(e: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray,
                 inliers: jnp.ndarray):
    """Decompose E into the 4 candidate (R, t) and pick the one with the
    most points in front of both cameras (cheirality), vectorized
    (≙ cv2.recoverPose)."""
    u, _, vt = jnp.linalg.svd(e)
    # det(U), det(V) sign fix to keep rotations proper.
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    wmat = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                       e.dtype)
    r1 = u @ wmat @ vt
    r2 = u @ wmat.T @ vt
    tt = u[:, 2]
    cands = [(r1, tt), (r1, -tt), (r2, tt), (r2, -tt)]

    def score(rc, tc):
        x1 = triangulate(rc, tc, p1, p2)
        z1 = x1[..., 2]
        x2 = se3.transform(rc, tc, x1)
        z2 = x2[..., 2]
        ok = (z1 > 0) & (z2 > 0) & inliers
        return jnp.sum(ok), x1

    scores, pts = zip(*(score(rc, tc) for rc, tc in cands))
    scores = jnp.stack(scores)
    pts = jnp.stack(pts)
    rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    b = jnp.argmax(scores)
    return rs[b], ts[b], pts[b]
