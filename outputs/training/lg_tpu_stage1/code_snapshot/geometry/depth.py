"""Depth sampling and two-view reprojection (reference: gluefactory/geometry/depth.py)."""

from __future__ import annotations

import jax.numpy as jnp

from .wrappers import Camera, Pose


def sample_depth(pts: jnp.ndarray, depth: jnp.ndarray, eps: float = 1e-5):
    """Bilinear depth sampling with nearest-neighbor fallback at invalid pixels
    (reference depth.py:20-35). pts (..., N, 2) pixel coords, depth (..., H, W).
    Returns (depth_at_pts (..., N), valid (..., N))."""
    h, w = depth.shape[-2], depth.shape[-1]
    x = jnp.clip(pts[..., 0], 0.0, w - 1.0)
    y = jnp.clip(pts[..., 1], 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    x1, y1 = x0 + 1, y0 + 1
    fx, fy = x - x0, y - y0

    def gather(yy, xx):
        return jnp.take_along_axis(
            depth.reshape(*depth.shape[:-2], -1), yy * w + xx, axis=-1
        )

    d00, d01 = gather(y0, x0), gather(y0, x1)
    d10, d11 = gather(y1, x0), gather(y1, x1)
    corners = jnp.stack([d00, d01, d10, d11], axis=-1)
    weights = jnp.stack(
        [(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy], axis=-1
    )
    corner_valid = corners > eps
    wsum = jnp.sum(weights * corner_valid, axis=-1)
    bilinear = jnp.sum(weights * corners * corner_valid, axis=-1) / (wsum + 1e-12)
    all_valid = jnp.all(corner_valid, axis=-1)
    # NN fallback: value of the highest-weight valid corner.
    nn_idx = jnp.argmax(weights * corner_valid, axis=-1)
    nn = jnp.take_along_axis(corners, nn_idx[..., None], axis=-1)[..., 0]
    any_valid = jnp.any(corner_valid, axis=-1)
    out = jnp.where(all_valid, bilinear, nn)
    in_img = (
        (pts[..., 0] >= 0) & (pts[..., 0] <= w - 1) & (pts[..., 1] >= 0) & (pts[..., 1] <= h - 1)
    )
    valid = any_valid & in_img
    return jnp.where(valid, out, jnp.zeros_like(out)), valid


def project(
    kpi: jnp.ndarray,
    di: jnp.ndarray,
    depthj: jnp.ndarray | None,
    camera_i: Camera,
    camera_j: Camera,
    T_itoj: Pose,
    valid_i: jnp.ndarray,
    ccth: float | None = None,
):
    """Reproject keypoints of view i into view j using their depth
    (reference depth.py:37-88). Optional cycle-consistency check against the
    depth map of view j with relative threshold ``ccth``.

    Returns (kpi_j (..., N, 2), valid (..., N))."""
    kpi_3d = camera_i.image2cam(kpi) * di[..., None]
    kpi_3d_j = T_itoj.transform(kpi_3d)
    kpi_j, visible = camera_j.cam2image(kpi_3d_j)
    valid = valid_i & visible
    if ccth is not None and depthj is not None:
        dj, valid_j = sample_depth(kpi_j, depthj)
        z_j = kpi_3d_j[..., -1]
        consistent = jnp.abs(dj - z_j) < ccth * jnp.minimum(jnp.abs(dj), jnp.abs(z_j))
        valid = valid & valid_j & consistent
    return kpi_j, valid


def dense_warp_consistency(
    depthi: jnp.ndarray,
    depthj: jnp.ndarray,
    T_itoj: Pose,
    camerai: Camera,
    cameraj: Camera,
    ccth: float = 0.05,
):
    """Dense version over full depth maps: returns per-pixel warped coords and
    validity (reference depth.py, dense variant)."""
    h, w = depthi.shape[-2], depthi.shape[-1]
    ys = jnp.arange(h, dtype=depthi.dtype)
    xs = jnp.arange(w, dtype=depthi.dtype)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
    grid = jnp.broadcast_to(grid, (*depthi.shape[:-2], h * w, 2))
    di = depthi.reshape(*depthi.shape[:-2], -1)
    valid_i = di > 0
    warped, valid = project(grid, di, depthj, camerai, cameraj, T_itoj, valid_i, ccth)
    return warped.reshape(*depthi.shape[:-2], h, w, 2), valid.reshape(*depthi.shape)
