"""Patch extraction around keypoints (reference: gluefactory/utils/patches.py:4-33).

Batched bilinear gather of k x k patches centered on each keypoint — used by
SDDH-style descriptor heads and patch-based losses."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.interpolate import bilinear_sample


def extract_patches(fmap: jnp.ndarray, keypoints: jnp.ndarray, k: int) -> jnp.ndarray:
    """fmap (B, H, W, C); keypoints (B, N, 2) pixel coords ->
    patches (B, N, k, k, C)."""
    b, n = keypoints.shape[:2]
    r = (k - 1) / 2.0
    dy, dx = jnp.meshgrid(
        jnp.linspace(-r, r, k), jnp.linspace(-r, r, k), indexing="ij"
    )
    grid = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (k*k, 2)
    pts = keypoints[:, :, None, :] + grid[None, None]
    out = bilinear_sample(fmap, pts.reshape(b, n * k * k, 2))
    return out.reshape(b, n, k, k, fmap.shape[-1])


def batch_extract_patches(fmaps, keypoints_list, k: int):
    """Convenience over a list of (fmap, keypoints) pairs."""
    return [extract_patches(f[None], kp[None], k)[0] for f, kp in zip(fmaps, keypoints_list)]
