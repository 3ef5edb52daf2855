"""Batched essential-matrix solving, triangulation, and pose recovery — the
device-side replacement for PoseLib/OpenCV findEssentialMat + recoverPose
(reference: gluefactory/robust_estimators/relative_pose/*.py, SURVEY.md §2.9).

All inputs are normalized camera coordinates (unit-plane rays)."""

from __future__ import annotations

import jax.numpy as jnp

from .epipolar import decompose_essential_matrix
from .utils import to_homogeneous


def eight_point_essential(
    x0: jnp.ndarray, x1: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Weighted 8-point algorithm: (..., N, 2|3) x2 -> (..., 3, 3) essential
    matrices with x1^T E x0 = 0, rank-2/equal-singular-value constraints
    enforced by SVD projection. Batches as one 9x9 eigendecomposition."""
    if x0.shape[-1] == 2:
        x0 = to_homogeneous(x0)
    if x1.shape[-1] == 2:
        x1 = to_homogeneous(x1)
    if weights is None:
        weights = jnp.ones(x0.shape[:-1], dtype=x0.dtype)
    # Row i: kron(x0_i, x1_i) so that A @ vec(E) = 0 with E in x1^T E x0.
    a = (x1[..., :, None] * x0[..., None, :]).reshape(*x0.shape[:-1], 9)
    AtA = jnp.einsum("...ni,...n,...nj->...ij", a, weights, a)
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[..., :, 0].reshape(*AtA.shape[:-2], 3, 3)
    # Project onto the essential manifold: singular values -> (1, 1, 0).
    U, s, Vt = jnp.linalg.svd(E)
    d = jnp.zeros_like(s).at[..., 0].set(1.0).at[..., 1].set(1.0)
    E = U @ (d[..., :, None] * Vt)
    return E


def sampson_distance(x0: jnp.ndarray, x1: jnp.ndarray, E: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error (..., N) in normalized coords."""
    if x0.shape[-1] == 2:
        x0 = to_homogeneous(x0)
    if x1.shape[-1] == 2:
        x1 = to_homogeneous(x1)
    Ex0 = jnp.einsum("...ij,...nj->...ni", E, x0)
    Etx1 = jnp.einsum("...ji,...nj->...ni", E, x1)
    x1Ex0 = jnp.einsum("...ni,...ni->...n", x1, Ex0)
    denom = Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2 + Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2
    return x1Ex0**2 / (denom + 1e-15)


def triangulate_depths(
    r0: jnp.ndarray, r1: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form two-view depths for rays r0 (view 0) and r1 (view 1) under
    x1 = R x0 + t: solve min ||s*R r0 + t - u*r1||^2 for (s, u) via the 2x2
    normal equations. Returns (s, u), each (..., N)."""
    Rr0 = jnp.einsum("...ij,...nj->...ni", R, r0)
    a = jnp.sum(Rr0 * Rr0, axis=-1)
    b = -jnp.sum(Rr0 * r1, axis=-1)
    c = jnp.sum(r1 * r1, axis=-1)
    d = -jnp.sum(Rr0 * t[..., None, :], axis=-1)
    e = jnp.sum(r1 * t[..., None, :], axis=-1)
    # Normal equations: [a b; b c] [s; u] = [d; e], solved by Cramer's rule
    # (a = |R r0|^2, b = -R r0 . r1, c = |r1|^2, d = -R r0 . t, e = r1 . t).
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (d * c - b * e) / det
    u = (a * e - b * d) / det
    return s, u


def recover_pose_from_essential(
    E: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    valid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Choose the (R, t) candidate with maximal cheirality support
    (≙ cv2.recoverPose; reference relative_pose/opencv.py:10-40).

    E (3, 3); x0/x1 (N, 2|3) normalized coords; valid (N,).
    Returns (R (3, 3), t (3,))."""
    if x0.shape[-1] == 2:
        x0 = to_homogeneous(x0)
    if x1.shape[-1] == 2:
        x1 = to_homogeneous(x1)
    Rs, t = decompose_essential_matrix(E)  # (2, 3, 3), (3,)
    cands_R = jnp.stack([Rs[0], Rs[0], Rs[1], Rs[1]], axis=0)  # (4, 3, 3)
    cands_t = jnp.stack([t, -t, t, -t], axis=0)  # (4, 3)
    s, u = triangulate_depths(x0[None], x1[None], cands_R, cands_t)  # (4, N)
    support = jnp.sum((s > 0) & (u > 0) & valid[None], axis=-1)  # (4,)
    best = jnp.argmax(support)
    return cands_R[best], cands_t[best]
