"""Batched on-device homography image warping
(device analogue of cv2.warpPerspective in
gluefactory/datasets/homographies.py:_warp_view; see also
geometry/homography_adaptation.py which warps dense score fields).

dst(p) = src(H^-1 p) with bilinear sampling and zero fill outside the source
— one gather-heavy XLA program, differentiable w.r.t. the source image, and
the core of the on-device homography data engine
(datasets/homographies_ondevice.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from .interpolate import bilinear_sample


def warp_image(
    images: jnp.ndarray,
    H: jnp.ndarray,
    out_size: tuple[int, int],
    fill: float = 0.0,
) -> jnp.ndarray:
    """Warp (B, Hs, Ws, C) images by (B, 3, 3) homographies mapping source
    pixel coords -> destination pixel coords (cv2.warpPerspective semantics:
    integer coordinates index pixel centers). Returns (B, h, w, C)."""
    b, hs, ws, c = images.shape
    h, w = out_size
    Hinv = jnp.linalg.inv(H.astype(jnp.float32))
    ys, xs = jnp.mgrid[0:h, 0:w]
    grid = jnp.stack([xs, ys], axis=-1).astype(jnp.float32).reshape(1, h * w, 2)
    ones = jnp.ones((1, h * w, 1), jnp.float32)
    pts_h = jnp.concatenate([grid, ones], axis=-1)  # (1, hw, 3)
    src = jnp.einsum("bij,pnj->bni", Hinv, pts_h)
    src = src[..., :2] / (src[..., 2:3] + 1e-12)
    vals = bilinear_sample(images, src)  # (B, hw, C) — border-clamped
    inside = (
        (src[..., 0] >= 0.0)
        & (src[..., 0] <= ws - 1.0)
        & (src[..., 1] >= 0.0)
        & (src[..., 1] <= hs - 1.0)
    )
    vals = jnp.where(inside[..., None], vals, fill)
    return vals.reshape(b, h, w, c)
