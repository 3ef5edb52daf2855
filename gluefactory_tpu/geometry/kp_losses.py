"""Keypoint heatmap losses beyond plain CE
(reference: gluefactory/geometry/kp_losses.py:8-461 — ALIKE peaky loss,
soft-argmax localization losses; the focal/weighted-BCE heatmap losses live
with their consumer in models/extractors/joint_point_line_extractor.py).

All losses here are fully batched over (B, K) keypoint slots with validity
masks and fixed window radii — no per-keypoint Python loops (the reference
unfolds patches per image)."""

from __future__ import annotations

import jax.numpy as jnp


def _windows(heatmap: jnp.ndarray, keypoints: jnp.ndarray, radius: int):
    """Gather (2r+1)^2 windows around integer keypoint centers.

    heatmap (B, H, W); keypoints (B, K, 2) xy. Returns (vals (B, K, W2),
    dx (W2,), dy (W2,)) with out-of-image taps clamped."""
    b, h, w = heatmap.shape
    r = radius
    cx = jnp.clip(jnp.round(keypoints[..., 0]).astype(jnp.int32), r, w - 1 - r)
    cy = jnp.clip(jnp.round(keypoints[..., 1]).astype(jnp.int32), r, h - 1 - r)
    offs = jnp.arange(-r, r + 1)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    dx = dx.reshape(-1)
    dy = dy.reshape(-1)
    xx = cx[..., None] + dx  # (B, K, W2)
    yy = cy[..., None] + dy
    flat = heatmap.reshape(b, h * w)
    vals = jnp.take_along_axis(
        flat, (yy * w + xx).reshape(b, -1), axis=1
    ).reshape(*keypoints.shape[:2], -1)
    return vals, dx.astype(jnp.float32), dy.astype(jnp.float32), cx, cy


def peaky_loss(
    heatmap: jnp.ndarray,
    keypoints: jnp.ndarray,
    valid: jnp.ndarray,
    radius: int = 2,
) -> jnp.ndarray:
    """ALIKE-style peakiness: 1 - (max - mean) inside the local window —
    minimized when the detector response is a sharp peak at each keypoint
    (reference kp_losses.py:get_peaky_loss:117). Returns (B,)."""
    vals, _, _, _, _ = _windows(heatmap, keypoints, radius)
    peak = jnp.max(vals, axis=-1) - jnp.mean(vals, axis=-1)
    loss = 1.0 - peak
    w = valid.astype(heatmap.dtype)
    return jnp.sum(loss * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)


def gt_anchored_loc_loss(
    heatmap: jnp.ndarray,
    gt_keypoints: jnp.ndarray,
    valid: jnp.ndarray,
    radius: int = 2,
    argmax_radius: int = 1,
    temperature: float = 0.1,
    mode: str = "softargmax",
) -> jnp.ndarray:
    """Sub-pixel localization supervised AT THE GT CORNERS: find the local
    heatmap argmax within ``argmax_radius`` of each GT corner (= the pixel
    NMS would detect), refine a ``radius`` window around it, and pull the
    refined position onto the float GT.

    ``mode='softargmax'`` mirrors ops/nms.soft_argmax_refinement;
    ``mode='com'`` mirrors ops/nms.com_refinement (center of mass after
    noise-floor subtraction — the readout matching soft bilinear labels).

    Anchoring at GT instead of at detections keeps the loss clean when most
    detections are texture/noise points with no corner nearby — the
    detection-anchored variant (below) plateaus at the coincidental-nearest-
    GT noise floor in that regime. Returns (B,)."""
    b, h, w = heatmap.shape
    # local argmax around the (rounded) GT corner
    vals, dx, dy, cx, cy = _windows(heatmap, gt_keypoints, argmax_radius)
    best = jnp.argmax(vals, axis=-1)
    ax = cx + jnp.take(dx, best).astype(jnp.int32)
    ay = cy + jnp.take(dy, best).astype(jnp.int32)
    anchors = jnp.stack([ax, ay], axis=-1).astype(jnp.float32)
    vals, dx, dy, cx, cy = _windows(heatmap, anchors, radius)
    if mode == "com":
        vals = jnp.maximum(vals - jnp.min(vals, axis=-1, keepdims=True), 0.0)
        p = vals / jnp.maximum(jnp.sum(vals, axis=-1, keepdims=True), 1e-12)
    else:
        p = jnp.exp(vals / temperature)
        p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-12)
    sx = cx.astype(jnp.float32) + jnp.sum(p * dx, axis=-1)
    sy = cy.astype(jnp.float32) + jnp.sum(p * dy, axis=-1)
    refined = jnp.stack([sx, sy], axis=-1)
    d = jnp.sqrt(jnp.sum((refined - gt_keypoints) ** 2, axis=-1) + 1e-12)
    wgt = valid.astype(heatmap.dtype)
    return jnp.sum(d * wgt, axis=-1) / jnp.maximum(jnp.sum(wgt, axis=-1), 1.0)


def soft_argmax_loc_loss(
    heatmap: jnp.ndarray,
    keypoints: jnp.ndarray,
    gt_keypoints: jnp.ndarray,
    valid: jnp.ndarray,
    radius: int = 3,
    temperature: float = 0.1,
    max_dist: float = 8.0,
) -> jnp.ndarray:
    """Sub-pixel localization supervision: the soft-argmax of the heatmap in
    a window around each detection should land on the (matched) GT corner
    (reference kp_losses.py:soft_argmax_loss:60). GT farther than
    ``max_dist`` px is ignored. Returns (B,)."""
    vals, dx, dy, cx, cy = _windows(heatmap, keypoints, radius)
    p = jnp.exp(vals / temperature)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-12)
    sx = cx.astype(jnp.float32) + jnp.sum(p * dx, axis=-1)
    sy = cy.astype(jnp.float32) + jnp.sum(p * dy, axis=-1)
    refined = jnp.stack([sx, sy], axis=-1)
    # eps-smoothed: norm has a NaN gradient at exactly-zero residual, which
    # a masked (0-weight) slot still propagates through 0*NaN
    d = jnp.sqrt(jnp.sum((refined - gt_keypoints) ** 2, axis=-1) + 1e-12)
    ok = valid & (jnp.linalg.norm(keypoints - gt_keypoints, axis=-1) < max_dist)
    w = ok.astype(heatmap.dtype)
    return jnp.sum(d * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)
