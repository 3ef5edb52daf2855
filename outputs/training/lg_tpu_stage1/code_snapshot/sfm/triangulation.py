"""Batched triangulation (new back-end component; two-view depth formula
shared with geometry/essential.py).

``triangulate_linear`` solves the homogeneous DLT system for N-view tracks as
one batched 4x4 symmetric eigendecomposition — P points x V views at once,
masked for missing observations."""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.essential import triangulate_depths
from ..geometry.wrappers import Camera, Pose


def triangulate_two_view(
    rays0: jnp.ndarray, rays1: jnp.ndarray, T_0to1: Pose
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Midpoint-free closed form: depths along both rays, 3D point in frame 0.
    Returns (points (..., N, 3), valid (..., N) by positive depth)."""
    s, u = triangulate_depths(rays0, rays1, T_0to1.R, T_0to1.t)
    pts = rays0 * s[..., None]
    return pts, (s > 0) & (u > 0)


def triangulate_linear(
    poses: Pose,
    cameras: Camera,
    observations: jnp.ndarray,
    obs_mask: jnp.ndarray,
) -> jnp.ndarray:
    """N-view linear (DLT) triangulation of P tracks.

    poses: Pose with batch shape (V,) — world->cam;
    cameras: Camera with batch shape (V,);
    observations (P, V, 2): pixel coords of track p in view v;
    obs_mask (P, V): validity.
    Returns points_world (P, 3).
    """
    V = poses.R.shape[0]
    # normalized rays per observation
    rays = cameras.image2cam(observations.transpose(1, 0, 2))  # (V, P, 3)
    rays = rays.transpose(1, 0, 2)  # (P, V, 3)
    # projection rows: x * (p3 . X) - (p1 . X) = 0 etc. with P = [R | t]
    P_mat = jnp.concatenate([poses.R, poses.t[..., None]], axis=-1)  # (V, 3, 4)
    x = rays[..., 0]
    y = rays[..., 1]
    r1 = x[..., None] * P_mat[None, :, 2, :] - P_mat[None, :, 0, :]  # (P, V, 4)
    r2 = y[..., None] * P_mat[None, :, 2, :] - P_mat[None, :, 1, :]
    A = jnp.concatenate([r1, r2], axis=1)  # (P, 2V, 4)
    w = jnp.concatenate([obs_mask, obs_mask], axis=1).astype(A.dtype)
    AtA = jnp.einsum("pni,pn,pnj->pij", A, w, A)
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., :, 0]
    return X[..., :3] / (X[..., 3:4] + 1e-12)
