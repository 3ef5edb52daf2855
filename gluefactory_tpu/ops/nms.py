"""Keypoint non-maximum suppression and top-k selection
(reference: gluefactory_nonfree/superpoint.py:60-80 simple_nms + top-k).

Iterated max-pool NMS is already ideal for TPU: reduce_window maps straight to
the VPU with perfect fusion; the selection step is a single global top_k with
validity masking instead of the reference's per-image dynamic-shape loop
(superpoint.py:262-317), keeping everything static-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool_2d(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sliding max with window (2r+1)^2, 'same' padding; x (..., H, W)."""
    k = 2 * radius + 1
    nd = x.ndim
    dims = (1,) * (nd - 2) + (k, k)
    strides = (1,) * nd
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, "SAME"
    )


def simple_nms(scores: jnp.ndarray, radius: int, iterations: int = 2) -> jnp.ndarray:
    """Fast iterative NMS (reference superpoint.py:60-80): keep local maxima,
    suppress their neighbourhoods, allow second-round maxima to surface."""
    if radius <= 0:
        return scores
    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool_2d(scores, radius)
    for _ in range(iterations):
        supp_mask = max_pool_2d(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool_2d(supp_scores, radius)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


def select_top_k_keypoints(
    scores: jnp.ndarray,
    k: int,
    threshold: float = 0.0,
    border: int = 0,
    image_size: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape keypoint selection from a dense score map.

    scores (B, H, W) -> (keypoints (B, k, 2) xy pixel-center coords,
    kp_scores (B, k), valid (B, k)). Slots below ``threshold`` (or in the
    border / padding region) are masked invalid with position (0, 0).
    (replaces reference superpoint.py:231-317 dynamic selection)
    """
    b, h, w = scores.shape
    masked = scores
    if border > 0:
        ys = jnp.arange(h)
        xs = jnp.arange(w)
        inb = (
            (ys[:, None] >= border) & (ys[:, None] < h - border)
            & (xs[None, :] >= border) & (xs[None, :] < w - border)
        )
        masked = jnp.where(inb, masked, -jnp.inf)
    if image_size is not None:
        ys = jnp.arange(h)[None, :, None]
        xs = jnp.arange(w)[None, None, :]
        inside = (xs < image_size[:, None, None, 0] - border) & (
            ys < image_size[:, None, None, 1] - border
        )
        masked = jnp.where(inside, masked, -jnp.inf)
    flat = masked.reshape(b, -1)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    keypoints = jnp.stack([xs, ys], axis=-1)
    valid = top_scores > threshold
    keypoints = jnp.where(valid[..., None], keypoints, 0.0)
    kp_scores = jnp.where(valid, top_scores, 0.0)
    return keypoints, kp_scores, valid


def com_refinement(
    keypoints: jnp.ndarray, scores: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Center-of-mass sub-pixel refinement: weights proportional to the
    (noise-floor-subtracted) heatmap values in a (2r+1)^2 window.

    Unlike the low-temperature softmax of ``soft_argmax_refinement`` —
    which approaches hard argmax and cannot express fractional positions —
    linear weighting reads a bilinearly-splat peak back EXACTLY: a detector
    trained with soft bilinear cell labels (extractors/superpoint
    cell_labels=soft) stores the sub-pixel corner position as mass shared
    between neighboring pixels, and the window CoM recovers it."""
    b, k, _ = keypoints.shape
    h, w = scores.shape[-2:]
    win = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(win, win, indexing="ij")
    offsets = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (W2, 2)
    pos = keypoints[:, :, None, :] + offsets[None, None]
    xi = jnp.clip(pos[..., 0], 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(pos[..., 1], 0, h - 1).astype(jnp.int32)
    flat_idx = (yi * w + xi).reshape(b, -1)
    vals = jnp.take_along_axis(scores.reshape(b, -1), flat_idx, axis=-1)
    vals = vals.reshape(b, k, -1)
    vals = jnp.maximum(vals - jnp.min(vals, axis=-1, keepdims=True), 0.0)
    weights = vals / jnp.maximum(jnp.sum(vals, axis=-1, keepdims=True), 1e-12)
    delta = jnp.sum(weights[..., None] * offsets[None, None], axis=-2)
    return keypoints + delta


def soft_argmax_refinement(
    keypoints: jnp.ndarray, scores: jnp.ndarray, radius: int, temperature: float = 0.1
) -> jnp.ndarray:
    """Sub-pixel refinement: softmax-weighted expectation of positions in a
    (2r+1)^2 window around each keypoint (reference extractors/aliked.py DKD
    soft-argmax, aliked.py:73-240). Static gather over a fixed window."""
    b, k, _ = keypoints.shape
    h, w = scores.shape[-2:]
    win = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(win, win, indexing="ij")
    offsets = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (W2, 2)
    pos = keypoints[:, :, None, :] + offsets[None, None]  # (B, K, W2, 2)
    xi = jnp.clip(pos[..., 0], 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(pos[..., 1], 0, h - 1).astype(jnp.int32)
    flat_idx = (yi * w + xi).reshape(b, -1)
    vals = jnp.take_along_axis(scores.reshape(b, -1), flat_idx, axis=-1)
    vals = vals.reshape(b, k, -1)
    weights = jax.nn.softmax(vals / temperature, axis=-1)
    delta = jnp.sum(weights[..., None] * offsets[None, None], axis=-2)
    return keypoints + delta
