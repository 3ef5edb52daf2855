"""Homography sampling, solving, warping, and errors
(reference: gluefactory/geometry/homography.py).

Host-side sampling (dataset augmentation) is numpy; everything on the compute
path (DLT solve, warps, errors) is batched jnp. The DLT solve uses the
normalized 8-point system reduced to a 9x9 symmetric eigenproblem — `eigh` of
A^T A batches far better on TPU than per-matrix SVD of (2N, 9) and supports
inlier weights for iteratively-reweighted local optimization inside RANSAC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .utils import from_homogeneous, to_homogeneous

# ---------------------------------------------------------------------------
# Host-side random homography sampling (data augmentation / GT generation).
# ---------------------------------------------------------------------------


def _cross2d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _convex(quad: np.ndarray) -> bool:
    d = np.roll(quad, -1, axis=0) - quad
    cross = _cross2d(d, np.roll(d, -1, axis=0))
    return bool(np.all(cross > 0) or np.all(cross < 0))


def sample_homography_corners(
    shape: tuple,
    patch_shape: tuple,
    difficulty: float = 0.8,
    translation: float = 0.3,
    max_angle: float = 60.0,
    n_angles: int = 10,
    min_convexity: float = 0.05,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Sample a random homography mapping image coords -> patch coords
    (reference geometry/homography.py:40-108, re-derived).

    Returns (H, coords) where ``coords`` (4, 2) is the source quad in image
    pixels whose content lands on the corners of the (w, h) patch.
    """
    rng = rng or np.random.default_rng()
    w, h = shape
    pw, ph = patch_shape
    # Unit-square corners, clockwise from top-left (image y-down).
    base = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    center = np.array([0.5, 0.5])
    # 1) random convex perturbation of the corners, amplitude ∝ difficulty.
    amp = 0.5 * difficulty
    for _ in range(20):
        quad = base + rng.uniform(-amp, amp, size=(4, 2)) * np.abs(base - center) * 2.0
        quad = center + (quad - center) * (1.0 - amp * rng.uniform(0.0, 1.0, size=(4, 1)))
        quad = np.clip(quad, 0.0, 1.0)
        if _convex(quad) and _min_convexity(quad) > min_convexity:
            break
    else:
        quad = base.copy()
    # 2) random rotation among n_angles candidates that keep the quad in bounds.
    angles = np.linspace(-np.deg2rad(max_angle), np.deg2rad(max_angle), n_angles)
    rng.shuffle(angles)
    angles = np.concatenate([[0.0], angles])
    for ang in angles[::-1]:  # try random ones first, fall back to 0
        ca, sa = np.cos(ang), np.sin(ang)
        rot = (quad - center) @ np.array([[ca, -sa], [sa, ca]]).T + center
        if rot.min() >= 0.0 and rot.max() <= 1.0:
            quad = rot
            break
    # 3) random translation within the remaining margin.
    mn, mx = quad.min(axis=0), quad.max(axis=0)
    lo, hi = -np.minimum(mn, 1.0), np.maximum(1.0 - mx, 0.0)
    hi = np.maximum(hi, lo)  # degenerate margin -> no translation
    t = rng.uniform(lo, hi) * translation
    quad = quad + t
    # Scale to image pixels; target = patch corners.
    coords = quad * np.array([w, h])
    target = base * np.array([pw, ph])
    H = compute_homography_np(coords, target)
    return H.astype(np.float32), coords.astype(np.float32)


def _min_convexity(quad: np.ndarray) -> float:
    d = np.roll(quad, -1, axis=0) - quad
    cross = np.abs(_cross2d(d, np.roll(d, -1, axis=0)))
    norms = np.linalg.norm(d, axis=-1)
    return float(np.min(cross / (norms * np.roll(norms, -1) + 1e-8)))


def compute_homography_np(pts0: np.ndarray, pts1: np.ndarray) -> np.ndarray:
    """Exact numpy DLT from >=4 correspondences (pure host-side — data
    pipelines call this per sample; routing it through the device would put
    a device round-trip in every worker)."""
    pts0 = np.asarray(pts0, np.float64)
    pts1 = np.asarray(pts1, np.float64)
    n = pts0.shape[0]
    x0, y0 = pts0[:, 0], pts0[:, 1]
    x1, y1 = pts1[:, 0], pts1[:, 1]
    z, o = np.zeros(n), np.ones(n)
    r1 = np.stack([-x0, -y0, -o, z, z, z, x1 * x0, x1 * y0, x1], axis=-1)
    r2 = np.stack([z, z, z, -x0, -y0, -o, y1 * x0, y1 * y0, y1], axis=-1)
    A = np.concatenate([r1, r2], axis=0)
    _, _, Vt = np.linalg.svd(A)
    H = Vt[-1].reshape(3, 3)
    return (H / (H[2, 2] + 1e-12)).astype(np.float32)


# ---------------------------------------------------------------------------
# Batched DLT solve (device).
# ---------------------------------------------------------------------------


def _normalize_pts(pts: jnp.ndarray, weights: jnp.ndarray):
    """Hartley normalization: zero mean, mean norm sqrt(2). Returns (pts_n, T)."""
    wsum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-8
    mean = jnp.sum(pts * weights[..., None], axis=-2, keepdims=True) / wsum[..., None]
    centered = pts - mean
    scale = jnp.sqrt(2.0) / (
        jnp.sum(jnp.linalg.norm(centered, axis=-1) * weights, axis=-1, keepdims=True) / wsum
        + 1e-8
    )
    s = scale[..., None]
    pts_n = centered * s
    T = jnp.zeros((*pts.shape[:-2], 3, 3), dtype=pts.dtype)
    T = T.at[..., 0, 0].set(scale[..., 0])
    T = T.at[..., 1, 1].set(scale[..., 0])
    T = T.at[..., 2, 2].set(1.0)
    T = T.at[..., 0, 2].set((-mean[..., 0, 0] * scale[..., 0]))
    T = T.at[..., 1, 2].set((-mean[..., 0, 1] * scale[..., 0]))
    return pts_n, T


def compute_homography(
    pts0: jnp.ndarray, pts1: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Weighted normalized DLT: (..., N, 2) x2 -> (..., 3, 3) with H @ pts0 ~ pts1
    (reference geometry/homography.py:110-131). Weights (inlier mask or IRLS
    weights) make this the local-optimization step of RANSAC."""
    dtype = jnp.promote_types(pts0.dtype, jnp.float32)
    pts0, pts1 = pts0.astype(dtype), pts1.astype(dtype)
    n = pts0.shape[-2]
    if weights is None:
        weights = jnp.ones(pts0.shape[:-1], dtype=dtype)
    weights = weights.astype(dtype)
    p0n, T0 = _normalize_pts(pts0, weights)
    p1n, T1 = _normalize_pts(pts1, weights)
    x0, y0 = p0n[..., 0], p0n[..., 1]
    x1, y1 = p1n[..., 0], p1n[..., 1]
    z = jnp.zeros_like(x0)
    o = jnp.ones_like(x0)
    # Rows of the 2N x 9 DLT system.
    r1 = jnp.stack([-x0, -y0, -o, z, z, z, x1 * x0, x1 * y0, x1], axis=-1)
    r2 = jnp.stack([z, z, z, -x0, -y0, -o, y1 * x0, y1 * y0, y1], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2N, 9)
    w2 = jnp.concatenate([weights, weights], axis=-1)
    AtA = jnp.einsum("...ni,...n,...nj->...ij", A, w2, A)
    # Smallest eigenvector of the 9x9 normal matrix.
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]
    Hn = h.reshape(*h.shape[:-1], 3, 3)
    H = jnp.linalg.inv(T1) @ Hn @ T0
    return H / (H[..., 2:3, 2:3] + 1e-12)


# ---------------------------------------------------------------------------
# Warps & errors.
# ---------------------------------------------------------------------------


def warp_points(points: jnp.ndarray, H: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Warp (..., N, 2) points by (..., 3, 3) homographies
    (reference geometry/homography.py:161-183)."""
    M = jnp.linalg.inv(H) if inverse else H
    hp = to_homogeneous(points)
    wp = jnp.einsum("...ij,...nj->...ni", M, hp)
    return from_homogeneous(wp)


def warp_points_np(points: np.ndarray, H: np.ndarray, inverse: bool = False) -> np.ndarray:
    M = np.linalg.inv(H) if inverse else H
    hp = np.concatenate([points, np.ones_like(points[..., :1])], axis=-1)
    wp = hp @ M.swapaxes(-1, -2) if M.ndim > 2 else hp @ M.T
    return wp[..., :-1] / (wp[..., -1:] + 1e-8)


def warp_lines(
    lines: jnp.ndarray, H: jnp.ndarray, image_size: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Warp line segments (..., L, 2, 2) and clip them to the image with a
    vectorized Liang-Barsky parametric clip
    (reference warp_lines_torch + shrink_segs_to_img,
    geometry/homography.py:211-318). Returns (lines, valid)."""
    shp = lines.shape
    pts = warp_points(lines.reshape(*shp[:-3], -1, 2), H).reshape(shp)
    p0, p1 = pts[..., 0, :], pts[..., 1, :]
    d = p1 - p0
    w = image_size[..., None, 0] - 1.0
    h = image_size[..., None, 1] - 1.0
    zero = jnp.zeros_like(p0[..., 0])
    one = jnp.ones_like(zero)

    def clip_axis(t0, t1, p, q):
        # p*t <= q form; update the parametric interval.
        safe_p = jnp.where(jnp.abs(p) < 1e-9, jnp.where(p >= 0, 1e-9, -1e-9), p)
        r = q / safe_p
        t0 = jnp.where(p < 0, jnp.maximum(t0, r), t0)
        t1 = jnp.where(p > 0, jnp.minimum(t1, r), t1)
        inside = jnp.where(jnp.abs(p) < 1e-9, q >= 0, jnp.ones_like(q, dtype=bool))
        return t0, t1, inside

    t0, t1 = zero, one
    ok = jnp.ones_like(zero, dtype=bool)
    for p, q in (
        (-d[..., 0], p0[..., 0] - 0.0),
        (d[..., 0], w - p0[..., 0]),
        (-d[..., 1], p0[..., 1] - 0.0),
        (d[..., 1], h - p0[..., 1]),
    ):
        t0, t1, inside = clip_axis(t0, t1, p, q)
        ok = ok & inside
    valid = ok & (t0 < t1)
    new0 = p0 + t0[..., None] * d
    new1 = p0 + t1[..., None] * d
    clipped = jnp.stack([new0, new1], axis=-2)
    clipped = jnp.where(valid[..., None, None], clipped, jnp.zeros_like(clipped))
    return clipped, valid


def sym_homography_error(kpts0: jnp.ndarray, kpts1: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """Mean of forward / backward reprojection distances (..., N)
    (reference geometry/homography.py:319-339)."""
    err0 = jnp.linalg.norm(warp_points(kpts0, H) - kpts1, axis=-1)
    err1 = jnp.linalg.norm(warp_points(kpts1, H, inverse=True) - kpts0, axis=-1)
    return 0.5 * (err0 + err1)


def sym_homography_error_all(kpts0: jnp.ndarray, kpts1: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """All-pairs symmetric error (..., N, M) for GT assignment building."""
    w0 = warp_points(kpts0, H)  # (..., N, 2)
    w1 = warp_points(kpts1, H, inverse=True)  # (..., M, 2)
    d0 = jnp.linalg.norm(w0[..., :, None, :] - kpts1[..., None, :, :], axis=-1)
    d1 = jnp.linalg.norm(kpts0[..., :, None, :] - w1[..., None, :, :], axis=-1)
    return 0.5 * (d0 + d1)


def homography_corner_error(H_est: jnp.ndarray, H_gt: jnp.ndarray, image_size) -> jnp.ndarray:
    """Mean displacement of the warped image corners (...,)
    (reference geometry/homography.py:341-347)."""
    image_size = jnp.asarray(image_size)
    w = image_size[..., 0]
    h = image_size[..., 1]
    zeros = jnp.zeros_like(w)
    corners = jnp.stack(
        [
            jnp.stack([zeros, zeros], -1),
            jnp.stack([w, zeros], -1),
            jnp.stack([w, h], -1),
            jnp.stack([zeros, h], -1),
        ],
        axis=-2,
    )  # (..., 4, 2)
    pts_est = warp_points(corners, H_est)
    pts_gt = warp_points(corners, H_gt)
    return jnp.linalg.norm(pts_est - pts_gt, axis=-1).mean(axis=-1)


# ---------------------------------------------------------------------------
# Batched in-jit homography sampling (device data engine).
# ---------------------------------------------------------------------------


def _convexity_jax(quad: jnp.ndarray) -> jnp.ndarray:
    """True where the (B, 4, 2) quad is strictly convex."""
    d = jnp.roll(quad, -1, axis=-2) - quad
    d2 = jnp.roll(d, -1, axis=-2)
    cross = d[..., 0] * d2[..., 1] - d[..., 1] * d2[..., 0]
    return jnp.all(cross > 1e-4, axis=-1) | jnp.all(cross < -1e-4, axis=-1)


def sample_homography_batch(
    key: jax.Array,
    batch: int,
    shape: tuple[int, int],
    patch_shape: tuple[int, int],
    difficulty: float = 0.7,
    translation: float = 0.3,
    max_angle: float = 45.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device analogue of :func:`sample_homography_corners`: sample ``batch``
    random homographies mapping source pixel coords (w, h = ``shape``) onto a
    (pw, ph = ``patch_shape``) canvas, entirely inside jit (no host RNG, no
    rejection loops — non-convex draws fall back to milder perturbations via
    two lax selects).

    Returns (H, coords): H (B, 3, 3) source->canvas, coords (B, 4, 2) the
    sampled source quads in pixels.
    """
    w, h = shape
    pw, ph = patch_shape
    base = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], jnp.float32)
    k_pert, k_shrink, k_ang, k_trans = jax.random.split(key, 4)
    amp = 0.5 * difficulty
    # corner perturbation, amplitude largest away from the center
    pert = jax.random.uniform(k_pert, (batch, 4, 2), minval=-amp, maxval=amp)
    pert = pert * jnp.abs(base - 0.5) * 2.0
    shrink = jax.random.uniform(k_shrink, (batch, 4, 1), maxval=amp)
    quad = 0.5 + (base + pert - 0.5) * (1.0 - shrink)
    quad = jnp.clip(quad, 0.0, 1.0)
    # convexity fallbacks (rare): half perturbation, then the base square
    half = 0.5 * (quad + base)
    quad = jnp.where(_convexity_jax(quad)[:, None, None], quad, half)
    quad = jnp.where(_convexity_jax(quad)[:, None, None], quad, base)
    # rotation about the quad center, rescaled to stay within [0, 1]
    ang = jax.random.uniform(
        k_ang, (batch,), minval=-jnp.deg2rad(max_angle), maxval=jnp.deg2rad(max_angle)
    )
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    rot = jnp.stack([jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], -2)  # (B,2,2)
    center = jnp.mean(quad, axis=-2, keepdims=True)
    quad_r = jnp.einsum("bij,bnj->bni", rot, quad - center) + center
    ext = jnp.max(jnp.abs(quad_r - center), axis=(-2, -1), keepdims=True)
    room = jnp.minimum(center, 1.0 - center)  # distance from center to borders
    scale = jnp.minimum(
        1.0, jnp.min(room, axis=-1, keepdims=True) / jnp.maximum(ext, 1e-6)
    )
    quad_r = center + (quad_r - center) * scale
    # translation within the remaining margin
    mn = jnp.min(quad_r, axis=-2)
    mx = jnp.max(quad_r, axis=-2)
    t_lo, t_hi = -mn, jnp.maximum(1.0 - mx, -mn)
    u = jax.random.uniform(k_trans, (batch, 2))
    t = (t_lo + u * (t_hi - t_lo)) * translation
    quad_t = quad_r + t[:, None, :]
    coords = quad_t * jnp.array([w, h], jnp.float32)
    target = jnp.broadcast_to(base * jnp.array([pw, ph], jnp.float32), (batch, 4, 2))
    H = compute_homography(coords, target)
    return H, coords
