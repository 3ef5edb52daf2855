"""KeyNet detector + (optional) AffNet shape + HardNet descriptor
(reference: gluefactory/models/extractors/keynet_affnet_hardnet.py:8-77,
a kornia.feature.KeyNetHardNet wrapper that loops over the batch).

TPU-first re-design — everything is batched and static-shape:

- **KeyNet response** (official topology): a handcrafted 10-channel
  derivative block feeding three 5x5 conv blocks, evaluated over a 3-level
  inner pyramid (factor 1.2), upsampled, concatenated, and combined by a
  final 1x1 conv + ReLU.
- **Multi-scale detection**: the response runs over a static outer pyramid
  (one up level at sqrt(2), then ``pyramid_levels`` down levels at factor
  1/sqrt(2) — the kornia MultiResolutionDetector recipe); per level NMS +
  top-k with area-proportional slot allocation, then one global top-k.
  All levels are merged on device; no per-image loops (the reference
  wrapper runs images one by one, :33-35).
- **LAFs**: (B, N, 2, 3) affine frames. Orientation comes from a batched
  dominant-gradient histogram (36 bins, circular smoothing, parabolic
  peak refinement — LAFOrienter semantics); ``affine_shape: true`` adds an
  AffNet-style shape head (det-1 lower-triangular residual).
- **HardNet**: the official 7-conv topology on 32x32 patches, run once on
  the full (B*N, 32, 32, 1) patch batch — an MXU-shaped matmul stream
  instead of kornia's chunked per-image loop.

``hardnet_weight_converter`` maps the official HardNet checkpoint layout
(bias-free convs + BatchNorm2d(affine=False), ``features.{i}.*``) onto the
``norm: none`` param tree by folding each BN into its conv, same recipe as
the XFeat/ALIKED converters. Native training uses GroupNorm (``norm:
group``), which is batch-independent and shards cleanly over a mesh.
"""

from __future__ import annotations

import math
from typing import ClassVar

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ...ops.interpolate import bilinear_sample
from ...ops.nms import select_top_k_keypoints, simple_nms
from ..base_model import BaseModel


# ---------------------------------------------------------------------------
# fixed filters


def _sobel_kernels() -> tuple[jnp.ndarray, jnp.ndarray]:
    kx = jnp.asarray(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]
    ) / 8.0
    return kx, kx.T


def _conv2d_fixed(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'same' convolution of (B, H, W, 1) with a 2-D kernel."""
    k4 = k[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x, k4, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def handcrafted_features(x: jnp.ndarray) -> jnp.ndarray:
    """KeyNet's handcrafted block: 10 derivative maps
    [gx, gy, gx^2, gy^2, gx*gy, gxy, gxy^2, gxx, gyy, gxx*gyy]
    from a grayscale image (B, H, W, 1) -> (B, H, W, 10)."""
    kx, ky = _sobel_kernels()
    gx = _conv2d_fixed(x, kx)
    gy = _conv2d_fixed(x, ky)
    gxx = _conv2d_fixed(gx, kx)
    gxy = _conv2d_fixed(gx, ky)
    gyy = _conv2d_fixed(gy, ky)
    return jnp.concatenate(
        [gx, gy, gx * gx, gy * gy, gx * gy, gxy, gxy * gxy, gxx, gyy,
         gxx * gyy],
        axis=-1,
    )


def _gaussian_blur(x: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """Separable 5-tap gaussian blur of (B, H, W, C)."""
    t = np.arange(-2, 3, dtype=np.float32)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k = jnp.asarray(k / k.sum())
    c = x.shape[-1]
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, c))
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "SAME", dimension_numbers=dn, feature_group_count=c
    )


# ---------------------------------------------------------------------------
# learnable modules


class ConvBlock(nn.Module):
    """Conv -> norm -> ReLU. ``norm='none'`` hosts folded-BN checkpoints
    (the conv carries the folded bias); ``'group'`` is the native trainable
    path."""

    features: int
    kernel: int = 5
    stride: int = 1
    norm: str = "group"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel,) * 2, strides=(self.stride,) * 2,
            padding=[(p, p), (p, p)], use_bias=self.use_bias, name="conv",
        )(x)
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=min(4, self.features), name="gn")(x)
        return nn.relu(x)


class KeyNetResponse(nn.Module):
    """KeyNet scoring network: handcrafted block + 3 learnable 5x5 conv
    blocks shared across a ``levels``-deep inner pyramid (factor 1.2),
    features upsampled back to full res, fused by a 1x1 conv + ReLU."""

    num_filters: int = 8
    levels: int = 3
    kernel: int = 5
    norm: str = "group"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (B, H, W, 1) grayscale -> response (B, H, W)."""
        b, h, w, _ = x.shape
        blocks = [
            ConvBlock(self.num_filters, self.kernel, norm=self.norm,
                      name=f"block{i}")
            for i in range(3)
        ]

        def extract(img):
            f = handcrafted_features(img)
            for blk in blocks:
                f = blk(f)
            return f

        feats = [extract(x)]
        cur = x
        for lvl in range(1, self.levels):
            nh = max(8, int(round(h / (1.2 ** lvl))))
            nw = max(8, int(round(w / (1.2 ** lvl))))
            cur = _gaussian_blur(cur, sigma=0.6)
            cur = jax.image.resize(cur, (b, nh, nw, 1), "bilinear")
            f = extract(cur)
            feats.append(
                jax.image.resize(
                    f, (b, h, w, self.num_filters), "bilinear"
                )
            )
        fused = jnp.concatenate(feats, axis=-1)
        score = nn.Conv(1, (1, 1), name="last_conv")(fused)
        return nn.relu(score)[..., 0]


class HardNet(nn.Module):
    """Official HardNet topology on 32x32 patches -> 128-d unit descriptors.

    Layout (bias-free conv + BN(affine=False) + ReLU in the original;
    ``norm='none'`` expects the converter to have folded the BN stats into
    conv biases): 32-32-64/2-64-128/2-128 convs (3x3) then an 8x8 'fc' conv
    and L2 normalization. Per-patch input whitening (mean/std, ddof=1)."""

    norm: str = "group"

    @nn.compact
    def __call__(self, p: jnp.ndarray) -> jnp.ndarray:
        n = p.shape[0]
        flat = p.reshape(n, -1)
        mu = jnp.mean(flat, axis=1)
        sd = jnp.std(flat, axis=1, ddof=1) + 1e-7
        x = (p - mu[:, None, None, None]) / sd[:, None, None, None]
        spec = [(32, 1), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1)]
        for i, (f, s) in enumerate(spec):
            x = ConvBlock(
                f, kernel=3, stride=s, norm=self.norm, name=f"conv{i}"
            )(x)
        x = nn.Conv(
            128, (8, 8), padding="VALID", use_bias=True, name="fc"
        )(x)
        d = x.reshape(n, 128)
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                               1e-8)


class AffNet(nn.Module):
    """AffNet-style affine-shape head on 32x32 patches -> det-1
    lower-triangular shape matrices (B*N, 2, 2)."""

    norm: str = "group"

    @nn.compact
    def __call__(self, p: jnp.ndarray) -> jnp.ndarray:
        n = p.shape[0]
        mu = jnp.mean(p.reshape(n, -1), axis=1)
        x = p - mu[:, None, None, None]
        spec = [(16, 1), (16, 1), (32, 2), (32, 1), (64, 2), (64, 1)]
        for i, (f, s) in enumerate(spec):
            x = ConvBlock(
                f, kernel=3, stride=s, norm=self.norm, name=f"conv{i}"
            )(x)
        x = nn.Conv(3, (8, 8), padding="VALID", use_bias=True, name="fc")(x)
        raw = x.reshape(n, 3) * 0.1  # residual around identity
        a = jnp.exp(raw[:, 0])
        c = jnp.exp(raw[:, 2])
        l = jnp.stack(
            [jnp.stack([a, jnp.zeros_like(a)], -1),
             jnp.stack([raw[:, 1], c], -1)],
            axis=1,
        )
        det = jnp.sqrt(jnp.maximum(a * c, 1e-8))
        return l / det[:, None, None]


# ---------------------------------------------------------------------------
# LAF machinery (batched; kornia laf.py semantics on (B, N, 2, 3) frames)


def laf_from_center_scale_ori(
    centers: jnp.ndarray, scales: jnp.ndarray, oris: jnp.ndarray
) -> jnp.ndarray:
    """centers (B, N, 2) xy, scales (B, N), oris (B, N) radians ->
    LAFs (B, N, 2, 3) with A = scale * R(ori)."""
    c, s = jnp.cos(oris), jnp.sin(oris)
    rot = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )
    a = rot * scales[..., None, None]
    return jnp.concatenate([a, centers[..., None]], axis=-1)


def extract_laf_patches(
    image: jnp.ndarray, lafs: jnp.ndarray, patch: int = 32
) -> jnp.ndarray:
    """Sample (B, N, patch, patch, 1) patches: pixel = A @ [u, v] + t for
    (u, v) on a [-1, 1] grid (one batched gather for all keypoints)."""
    b, n = lafs.shape[:2]
    t = jnp.linspace(-1.0, 1.0, patch)
    vv, uu = jnp.meshgrid(t, t, indexing="ij")
    grid = jnp.stack([uu.ravel(), vv.ravel()], axis=-1)  # (P*P, 2) xy
    pts = (
        jnp.einsum("bnij,pj->bnpi", lafs[..., :2], grid)
        + lafs[..., 2][:, :, None, :]
    )
    out = bilinear_sample(image, pts.reshape(b, n * patch * patch, 2))
    return out.reshape(b, n, patch, patch, image.shape[-1])


def dominant_orientation(patches: jnp.ndarray, bins: int = 36) -> jnp.ndarray:
    """Dominant gradient orientation per patch (LAFOrienter semantics):
    gaussian-weighted 36-bin magnitude histogram, circular [1,4,6,4,1]
    smoothing, parabolic peak refinement. patches (M, P, P, 1) -> (M,)."""
    m, p = patches.shape[0], patches.shape[1]
    kx, ky = _sobel_kernels()
    gx = _conv2d_fixed(patches, kx)[..., 0]
    gy = _conv2d_fixed(patches, ky)[..., 0]
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]
    t = jnp.linspace(-1.0, 1.0, p)
    g = jnp.exp(-0.5 * (t / 0.6) ** 2)
    win = g[:, None] * g[None, :]
    wmag = (mag * win).reshape(m, p * p)
    idx = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * bins).astype(jnp.int32)
    idx = jnp.clip(idx, 0, bins - 1).reshape(m, p * p)
    hist = jnp.einsum(
        "mp,mpb->mb", wmag, jax.nn.one_hot(idx, bins, dtype=wmag.dtype)
    )
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    for _ in range(2):
        hist = sum(
            k[j] * jnp.roll(hist, j - 2, axis=1) for j in range(5)
        )
    peak = jnp.argmax(hist, axis=1)
    hl = hist[jnp.arange(m), (peak - 1) % bins]
    hc = hist[jnp.arange(m), peak]
    hr = hist[jnp.arange(m), (peak + 1) % bins]
    denom = hl - 2.0 * hc + hr
    off = jnp.where(
        jnp.abs(denom) > 1e-8, 0.5 * (hl - hr) / jnp.where(
            jnp.abs(denom) > 1e-8, denom, 1.0), 0.0)
    frac = peak.astype(jnp.float32) + 0.5 + jnp.clip(off, -0.5, 0.5)
    return frac / bins * 2 * jnp.pi - jnp.pi


# ---------------------------------------------------------------------------
# the extractor


class KeyNetAffNetHardNet(BaseModel):
    default_conf: ClassVar[dict] = {
        "max_num_keypoints": 1024,
        "detection_threshold": 1e-5,
        "nms_radius": 7,  # kornia nms_size 15
        "pyramid_levels": 4,
        "up_levels": 1,
        "scale_factor": math.sqrt(2.0),
        "s_mult": 22.0,  # patch extent in level pixels (kornia s_mult)
        "upright": False,
        "affine_shape": False,  # reference uses KeyNetHardNet (no AffNet)
        "desc_dim": 128,
        "patch_size": 32,
        "norm": "group",  # 'none' for converted official HardNet weights
        "keynet_levels": 3,
        "num_filters": 8,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        self.response = KeyNetResponse(
            num_filters=int(self.conf.num_filters),
            levels=int(self.conf.keynet_levels),
            norm=self.conf.norm,
            name="keynet",
        )
        self.descriptor = HardNet(norm=self.conf.norm, name="hardnet")
        if self.conf.affine_shape:
            self.affnet = AffNet(norm=self.conf.norm, name="affnet")

    def _detect(self, gray: jnp.ndarray, image_size):
        """Multi-resolution detection -> merged (kp, score, scale, valid)."""
        b, h, w, _ = gray.shape
        k = int(self.conf.max_num_keypoints)
        sf = float(self.conf.scale_factor)
        level_scales = [
            sf ** u for u in range(int(self.conf.up_levels), 0, -1)
        ] + [sf ** -l for l in range(int(self.conf.pyramid_levels))]
        areas = [min(s, 1.0) ** 2 * h * w for s in level_scales]
        tot = sum(areas)

        kps, scs, vls, sls = [], [], [], []
        for s, a in zip(level_scales, areas):
            nh, nw = max(16, int(round(h * s))), max(16, int(round(w * s)))
            img_l = gray if s == 1.0 else jax.image.resize(
                gray, (b, nh, nw, 1), "bilinear"
            )
            resp = self.response(img_l)
            resp = simple_nms(resp, int(self.conf.nms_radius))
            k_l = min(k, max(32, int(round(k * a / tot))))
            size_l = None
            if image_size is not None:
                size_l = jnp.minimum(
                    jnp.round(image_size * s), jnp.asarray([nw, nh])
                )
            kp, sc, valid = select_top_k_keypoints(
                resp, k=k_l,
                threshold=float(self.conf.detection_threshold),
                border=int(2 * self.conf.nms_radius * min(s, 1.0)) + 1,
                image_size=size_l,
            )
            # back to full-res pixel-center coords, using the ACTUAL
            # per-axis resize ratios (nh/h differs from s after rounding)
            ratio = jnp.asarray([w / nw, h / nh], jnp.float32)
            kp = (kp + 0.5) * ratio - 0.5
            kps.append(kp)
            scs.append(sc)
            vls.append(valid)
            sls.append(
                jnp.full(sc.shape, float(self.conf.s_mult) / s / 2.0)
            )

        kp = jnp.concatenate(kps, axis=1)
        sc = jnp.concatenate(scs, axis=1)
        valid = jnp.concatenate(vls, axis=1)
        scale = jnp.concatenate(sls, axis=1)
        order = jnp.where(valid, sc, -jnp.inf)
        top, idx = jax.lax.top_k(order, k)
        take = jax.vmap(lambda arr, i: arr[i])
        return (
            take(kp, idx), take(sc, idx), take(scale, idx),
            take(valid, idx),
        )

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        gray = image if image.shape[-1] == 1 else (
            image[..., :3] @ jnp.asarray([0.299, 0.587, 0.114])
        )[..., None]
        b = gray.shape[0]
        k = int(self.conf.max_num_keypoints)
        p = int(self.conf.patch_size)

        kp, sc, scale, valid = self._detect(gray, data.get("image_size"))
        kp = jnp.where(valid[..., None], kp, 0.0)
        scale = jnp.where(valid, scale, 1.0)
        oris = jnp.zeros((b, k))
        lafs = laf_from_center_scale_ori(kp, scale, oris)

        if self.conf.affine_shape:
            patches = extract_laf_patches(gray, lafs, p)
            shapes = self.affnet(patches.reshape(b * k, p, p, 1))
            a = jnp.einsum(
                "bnij,bnjk->bnik", lafs[..., :2],
                shapes.reshape(b, k, 2, 2),
            )
            lafs = jnp.concatenate([a, lafs[..., 2:]], axis=-1)

        if not self.conf.upright:
            patches = extract_laf_patches(gray, lafs, p)
            oris = dominant_orientation(
                patches.reshape(b * k, p, p, 1)
            ).reshape(b, k)
            c, s = jnp.cos(oris), jnp.sin(oris)
            rot = jnp.stack(
                [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
            )
            a = jnp.einsum("bnij,bnjk->bnik", lafs[..., :2], rot)
            lafs = jnp.concatenate([a, lafs[..., 2:]], axis=-1)

        patches = extract_laf_patches(gray, lafs, p)
        desc = self.descriptor(patches.reshape(b * k, p, p, 1))
        desc = desc.reshape(b, k, -1)

        return {
            "keypoints": kp,
            "keypoint_scores": jnp.where(valid, sc, 0.0),
            "keypoint_valid": valid,
            "scales": scale,
            "oris": oris,
            "lafs": lafs,
            "descriptors": jnp.where(valid[..., None], desc, 0.0),
        }

    def loss(self, pred, data):
        raise NotImplementedError  # parity: reference :76-77


def hardnet_weight_converter(state_dict: dict) -> dict:
    """Map the official HardNet checkpoint (``features.{i}.*``: bias-free
    3x3 convs at 0,3,6,9,12,15, BN(affine=False) at 1,4,7,10,13,16, and the
    8x8 'fc' conv at 19 with BN at 20) onto the ``norm: none`` HardNet param
    tree, folding each BN's running stats into the conv."""
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}
    params = {}

    def fold(dst, conv_i, bn_i, has_bias=False):
        w = sd[f"features.{conv_i}.weight"]
        mean = sd[f"features.{bn_i}.running_mean"]
        var = sd[f"features.{bn_i}.running_var"]
        s = np.sqrt(var + 1e-5)
        kern = (w / s[:, None, None, None]).transpose(2, 3, 1, 0)
        bias = -mean / s
        if has_bias and f"features.{conv_i}.bias" in sd:
            bias = bias + sd[f"features.{conv_i}.bias"] / s
        params[dst] = {"conv": {"kernel": kern, "bias": bias}} if \
            dst.startswith("conv") else {"kernel": kern, "bias": bias}

    for i, (conv_i, bn_i) in enumerate(
        [(0, 1), (3, 4), (6, 7), (9, 10), (12, 13), (15, 16)]
    ):
        fold(f"conv{i}", conv_i, bn_i)
    fold("fc", 19, 20)
    return {"params": {"hardnet": jax.tree.map(jnp.asarray, params)}}


__main_model__ = KeyNetAffNetHardNet
