"""Bilinear sampling of dense feature maps at sparse locations
(reference: torch.nn.functional.grid_sample usage in
gluefactory_nonfree/superpoint.py:117-149 and extractors/aliked.py SDDH).

Implemented as four static gathers + lerp — on TPU this compiles to vector
gathers with no dynamic shapes, and is differentiable w.r.t. both the feature
map and the sampling locations.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(
    fmap: jnp.ndarray, points: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Sample fmap (B, H, W, C) at pixel coords points (B, N, 2) in (x, y).

    Coordinates follow the pixel-center convention: (0, 0) is the center of
    the top-left pixel (align_corners=True semantics on the pixel grid).
    Out-of-bounds coordinates are clamped (border padding).
    Returns (B, N, C).
    """
    b, h, w, c = fmap.shape
    x = jnp.clip(points[..., 0], 0.0, w - 1.0)
    y = jnp.clip(points[..., 1], 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    x1, y1 = x0 + 1, y0 + 1
    fx = (x - x0.astype(x.dtype))[..., None]
    fy = (y - y0.astype(y.dtype))[..., None]
    flat = fmap.reshape(b, h * w, c)

    def gather(yy, xx):
        idx = (yy * w + xx)[..., None]
        return jnp.take_along_axis(flat, idx, axis=1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def sample_descriptors(
    descriptor_map: jnp.ndarray,
    keypoints: jnp.ndarray,
    stride: int = 8,
    normalized: bool = True,
    mode: str = "center",
) -> jnp.ndarray:
    """Interpolate L2-normalized descriptors at keypoint locations
    (reference superpoint.py:117-149 'fixed' sampling variant).

    descriptor_map (B, H/s, W/s, C); keypoints (B, N, 2) in full-res pixel
    coords (pixel-center convention). Returns (B, N, C).

    mode 'center' places descriptor cell i's center at stride/2 - 0.5 + s*i
    in image space (geometrically the center of its receptive cell). The
    reference's sample_descriptors_fix_sampling maps kp/s - 0.5
    (align_corners=False grid_sample), a constant 0.5 full-res-px offset;
    use mode='torch' for exact parity when importing official torch weights.
    """
    if mode == "torch":
        pts = keypoints / stride - 0.5
    else:
        # cell centers sit at (stride/2 - 0.5) + stride * i in image space
        pts = (keypoints - (stride / 2.0 - 0.5)) / stride
    desc = bilinear_sample(descriptor_map, pts)
    if normalized:
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
    return desc


def grid_sample_nchw_like(fmap: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch-style normalized-grid sampling for [-1, 1] grids
    (align_corners=False): fmap (B, H, W, C), grid (B, N, 2) -> (B, N, C)."""
    h, w = fmap.shape[1:3]
    x = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    y = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5
    return bilinear_sample(fmap, jnp.stack([x, y], axis=-1))


# --------------------------------------------------------------------------
# torch grid_sample parity samplers (padding_mode="zeros")
# --------------------------------------------------------------------------
# These replicate torch.nn.functional.grid_sample tap-for-tap — out-of-bounds
# taps contribute zero, nearest rounds half-to-even, bicubic uses the Keys
# cubic-convolution kernel with A=-0.75 — so official-checkpoint compat
# graphs (e.g. XFeat, reference extractors/xfeat.py:20-49) can match the
# torch outputs bit-closely. Points are *unnormalized* pixel coords in the
# feature map (callers apply their own [-1,1]-grid unnormalization).


def _gather_zeros(flat, yy, xx, h, w):
    """Gather flat (B, H*W, C) at integer (yy, xx), 0 outside the map."""
    inb = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
    idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
    vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return vals * inb[..., None]


def nearest_sample_zeros(fmap: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """grid_sample mode='nearest': round-half-to-even, zeros padding.
    fmap (B, H, W, C), points (B, N, 2) as (x, y) -> (B, N, C)."""
    b, h, w, c = fmap.shape
    xx = jnp.round(points[..., 0]).astype(jnp.int32)
    yy = jnp.round(points[..., 1]).astype(jnp.int32)
    return _gather_zeros(fmap.reshape(b, h * w, c), yy, xx, h, w)


def bilinear_sample_zeros(fmap: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """grid_sample mode='bilinear' with padding_mode='zeros' (each of the 4
    taps contributes zero outside the map). Same signature as above."""
    b, h, w, c = fmap.shape
    x, y = points[..., 0], points[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    flat = fmap.reshape(b, h * w, c)
    out = 0.0
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            out = out + _gather_zeros(flat, y0 + dy, x0 + dx, h, w) * wy * wx
    return out


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Keys cubic-convolution weights for taps at offsets -1..2 given the
    fractional position t in [0, 1) (torch's upsample/grid_sample kernel)."""

    def k1(x):  # |x| <= 1
        return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0

    def k2(x):  # 1 < |x| < 2
        return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a

    return (k2(t + 1.0), k1(t), k1(1.0 - t), k2(2.0 - t))


def bicubic_sample_zeros(fmap: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """grid_sample mode='bicubic' with padding_mode='zeros' (16 taps, Keys
    kernel A=-0.75). Same signature as above."""
    b, h, w, c = fmap.shape
    x, y = points[..., 0], points[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wxs = _cubic_weights((x - x0)[..., None])
    wys = _cubic_weights((y - y0)[..., None])
    flat = fmap.reshape(b, h * w, c)
    out = 0.0
    for dy in range(-1, 3):
        row = 0.0
        for dx in range(-1, 3):
            row = row + _gather_zeros(flat, y0 + dy, x0 + dx, h, w) * wxs[dx + 1]
        out = out + row * wys[dy + 1]
    return out


def cell_logits_to_heatmap(logits, cell: int = 8, dustbin: bool = True):
    """Decode SuperPoint/XFeat-style per-cell logits into a full-resolution
    probability heatmap: softmax over the cell**2 (+ dustbin) channels, drop
    the dustbin, pixel-unshuffle. logits (B, Hc, Wc, cell*cell [+1]) ->
    (B, Hc*cell, Wc*cell)."""
    import jax

    b, hc, wc, _ = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    if dustbin:
        probs = probs[..., :-1]
    heat = probs.reshape(b, hc, wc, cell, cell).transpose(0, 1, 3, 2, 4)
    return heat.reshape(b, hc * cell, wc * cell)
