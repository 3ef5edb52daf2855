"""Low-level batched geometry ops (reference: gluefactory/geometry/utils.py).

All functions are pure jnp, batched over arbitrary leading dims, and safe under
jit/vmap/grad. Distortion uses the Brown radial(+tangential) model with
analytic Jacobians (reference geometry/utils.py:90-154).
"""

from __future__ import annotations

import jax.numpy as jnp


def to_homogeneous(points: jnp.ndarray) -> jnp.ndarray:
    """(..., N, D) -> (..., N, D+1) with a trailing 1."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def from_homogeneous(points: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """(..., N, D+1) -> (..., N, D); divides by the last coordinate."""
    return points[..., :-1] / (points[..., -1:] + eps)


def batched_eye_like(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(n, dtype=x.dtype), (*x.shape[:-1], n, n))


def skew_symmetric(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix [v]x
    (reference geometry/utils.py:44-56)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            z, -v[..., 2], v[..., 1],
            v[..., 2], z, -v[..., 0],
            -v[..., 1], v[..., 0], z,
        ],
        axis=-1,
    ).reshape(*v.shape[:-1], 3, 3)


def so3exp_map(w: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) via Rodrigues
    (reference geometry/utils.py:72-87). Taylor-guarded near zero so the map
    stays differentiable at the identity."""
    # Safe norm: never sqrt near zero so gradients stay finite at the identity.
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # (..., 1, 1)
    small = theta2 < eps**2
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(theta2_safe)
    # R = I + a*W + b*W^2 with a = sin(t)/t, b = (1-cos(t))/t^2; Taylor near 0.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = skew_symmetric(w)
    I = batched_eye_like(w, 3)
    return I + a * W + b * (W @ W)


def so3log_map(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    theta = jnp.arccos(cos)
    w_hat = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    sin = jnp.sin(theta)
    scale = jnp.where(theta[..., None] < eps, 0.5, theta[..., None] / (2.0 * jnp.where(jnp.abs(sin[..., None]) < eps, 1.0, sin[..., None])))
    return w_hat * scale


def distort_points(pts: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Brown distortion of normalized 2D points (..., N, 2); ``dist``
    (..., K) with K in {1, 2, 4+}: k1, k2[, p1, p2, ...]
    (reference geometry/utils.py:90-117)."""
    dist = dist[..., None, :]  # broadcast over N
    ndist = dist.shape[-1]
    x, y = pts[..., 0], pts[..., 1]
    r2 = x**2 + y**2
    radial = dist[..., 0] * r2
    if ndist >= 2:
        radial = radial + dist[..., 1] * r2**2
    out = pts * (1.0 + radial)[..., None]
    if ndist > 2:
        p12 = dist[..., 2:4]
        p21 = p12[..., ::-1]
        xy = x * y
        uv = jnp.stack([x, y], axis=-1)
        out = out + 2.0 * p12 * xy[..., None] + p21 * (r2[..., None] + 2.0 * uv**2)
    return out


def J_distort_points(pts: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Jacobian (..., N, 2, 2) of ``distort_points`` w.r.t. the points
    (reference geometry/utils.py:120-154)."""
    dist = dist[..., None, :]
    ndist = dist.shape[-1]
    x, y = pts[..., 0], pts[..., 1]
    r2 = x**2 + y**2
    radial = dist[..., 0] * r2
    dradial = 2.0 * dist[..., 0]
    if ndist >= 2:
        radial = radial + dist[..., 1] * r2**2
        dradial = dradial + 4.0 * dist[..., 1] * r2
    J_diag = 1.0 + radial
    J_off = x * y * dradial
    J = jnp.stack(
        [J_diag + x**2 * dradial, J_off, J_off, J_diag + y**2 * dradial], axis=-1
    ).reshape(*pts.shape[:-1], 2, 2)
    if ndist > 2:
        p1, p2 = dist[..., 2], dist[..., 3]
        J_tan = jnp.stack(
            [
                2.0 * p1 * y + 6.0 * p2 * x,
                2.0 * p1 * x + 2.0 * p2 * y,
                2.0 * p1 * x + 2.0 * p2 * y,
                6.0 * p1 * y + 2.0 * p2 * x,
            ],
            axis=-1,
        ).reshape(*pts.shape[:-1], 2, 2)
        J = J + J_tan
    return J


def get_image_coords(shape: tuple, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center coordinate grid (..., H, W, 2) in (x, y) order with the
    COLMAP +0.5 corner convention (reference geometry/utils.py:156-168)."""
    h, w = shape[-2], shape[-1]
    ys = jnp.arange(h, dtype=dtype) + 0.5
    xs = jnp.arange(w, dtype=dtype) + 0.5
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    return grid
