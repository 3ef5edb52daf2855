"""Homography adaptation: aggregate model predictions over random warps
(reference: gluefactory/geometry/homography_adaptation.py:33-218 and
gluefactory/models/extractors/superpoint.py:422-495).

Used to generate pseudo-ground-truth heatmaps / distance fields for detector
training: warp the image with K random homographies, run the model on every
warp, unwarp the dense predictions, and aggregate with a masked mean/max.
Fully batched over (B, K) on device — the reference loops over homographies."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interpolate import bilinear_sample
from .homography import sample_homography_corners, warp_points


def sample_homographies_np(k: int, shape: tuple, rng: np.random.Generator,
                           difficulty: float = 0.8) -> np.ndarray:
    """K random homographies mapping the image onto itself (numpy host)."""
    w, h = shape
    Hs = [np.eye(3, dtype=np.float32)]
    for _ in range(k - 1):
        H, _ = sample_homography_corners((w, h), (w, h), difficulty=difficulty, rng=rng)
        Hs.append(H)
    return np.stack(Hs)


def warp_dense(field: jnp.ndarray, H: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse-warp a dense field (B, H, W[, C]) by homographies (B, 3, 3):
    output(x) = field(H^-1 x). Returns (warped, valid_mask)."""
    squeeze = field.ndim == 3
    if squeeze:
        field = field[..., None]
    b, h, w, c = field.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys], -1).reshape(-1, 2)[None].repeat(b, axis=0)
    src = warp_points(grid, H, inverse=True)  # (B, HW, 2)
    valid = (
        (src[..., 0] >= 0) & (src[..., 0] <= w - 1)
        & (src[..., 1] >= 0) & (src[..., 1] <= h - 1)
    ).reshape(b, h, w)
    out = bilinear_sample(field, src).reshape(b, h, w, c)
    if squeeze:
        out = out[..., 0]
    return out, valid


def homography_adaptation(
    image: jnp.ndarray,
    Hs: jnp.ndarray,
    forward_fn,
    field_keys: tuple = ("heatmap",),
    aggregation: str = "mean",
) -> dict:
    """image (B, H, W, C); Hs (K, 3, 3); forward_fn(images)->dict of dense
    (N, H, W[, C]) fields. Returns aggregated fields + counts.

    All K warps of all B images run as ONE model batch of size B*K."""
    b = image.shape[0]
    k = Hs.shape[0]
    H_rep = jnp.tile(Hs, (b, 1, 1))  # (B*K, 3, 3): per image, all warps
    img_rep = jnp.repeat(image, k, axis=0)
    warped_imgs, _ = warp_dense(img_rep, H_rep)
    preds = forward_fn(warped_imgs)
    out = {}
    for key in field_keys:
        field = preds[key]  # (B*K, H, W[, ...])
        unwarped, valid = warp_dense(field, jnp.linalg.inv(H_rep))
        vshape = valid.shape + (1,) * (unwarped.ndim - valid.ndim)
        v = valid.reshape(vshape).astype(unwarped.dtype)
        unwarped = unwarped.reshape(b, k, *unwarped.shape[1:])
        v = v.reshape(b, k, *v.shape[1:])
        if aggregation == "mean":
            agg = jnp.sum(unwarped * v, axis=1) / jnp.maximum(jnp.sum(v, axis=1), 1.0)
        elif aggregation == "max":
            agg = jnp.max(jnp.where(v > 0, unwarped, -jnp.inf), axis=1)
            agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
        elif aggregation == "min":  # for distance fields
            agg = jnp.min(jnp.where(v > 0, unwarped, jnp.inf), axis=1)
            agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
        else:
            raise ValueError(aggregation)
        out[key] = agg
        out[f"{key}_count"] = jnp.sum(v, axis=1)
    return out
