"""ALIKED keypoint detector + deformable descriptor
(reference: gluefactory/models/extractors/aliked.py:73-906 — re-designed
TPU-first).

Architecture kept from the reference:
  - conv encoder with strided stages, the deeper stages using *deformable*
    convolutions (reference uses torchvision DCNv2);
  - multi-scale aggregation: every stage is upsampled to 1/dilation of full
    resolution and fused into one dense feature map (extract_dense_map,
    aliked.py:833-864);
  - SMH score-map head (aliked.py:890);
  - DKD differentiable keypoint detection: NMS -> top-k -> soft-argmax
    sub-pixel refinement (DKD, aliked.py:73-240);
  - SDDH deformable descriptor head: per-keypoint offset regression -> M
    sampled positions -> learned aggregation (SDDH, aliked.py:557-688).

TPU translation:
  - deformable convolution = predict K offsets per output pixel, gather input
    features with batched bilinear sampling (ops/interpolate), then a dense
    mixing layer — no custom CUDA op, just gathers + matmuls that XLA fuses;
  - the SDDH per-image loop (aliked.py:619-660) becomes one batched gather
    over all keypoints at once (static `max_num_keypoints` slots);
  - all shapes static; NHWC layout.
"""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.interpolate import bilinear_sample_zeros, bilinear_sample
from ...ops.nms import select_top_k_keypoints, simple_nms, soft_argmax_refinement
from ..base_model import BaseModel

ALIKED_CFGS = {
    # c1, c2, c3, c4, dim, K (SDDH sample count), M (SDDH M)
    "aliked-t16": (8, 16, 32, 64, 64, 3, 16),
    "aliked-n16": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n16rot": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n32": (16, 32, 64, 128, 128, 3, 32),
}


# zero-padded bilinear sampling lives in ops.interpolate.bilinear_sample_zeros
# (torchvision deform_conv2d / grid_sample(padding_mode='zeros') semantics,
# reference aliked.py:419-426,660-662)

def _resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch nn.Upsample semantics,
    reference aliked.py:793-804) as two dense interpolation matmuls — MXU
    friendly, exactly separable."""

    def interp_matrix(n_out, n_in):
        if n_in == 1:
            return jnp.ones((n_out, 1), jnp.float32)
        src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 2)
        frac = src - i0
        m = jnp.zeros((n_out, n_in), jnp.float32)
        rows = jnp.arange(n_out)
        m = m.at[rows, i0].add(1.0 - frac)
        m = m.at[rows, i0 + 1].add(frac)
        return m

    wy = interp_matrix(out_h, x.shape[1])
    wx = interp_matrix(out_w, x.shape[2])
    return jnp.einsum("Hh,bhwc,Ww->bHWc", wy, x, wx)


class CompatDCN(nn.Module):
    """Official DeformableConv2d semantics with eval-mode BN folded in
    (reference aliked.py:369-427): 3x3 offset conv (bias), offsets clamped to
    +-max(h, w)/4, torchvision (dy, dx)-interleaved channel layout, zero-pad
    bilinear gather, then the regular-conv weights applied as one dense mix
    (carrying the folded BN scale/bias)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.kernel
        kk = k * k
        off = nn.Conv(2 * kk, (k, k), padding="SAME", name="offset")(x)
        off = jnp.clip(off, -max(h, w) / 4.0, max(h, w) / 4.0)
        # torchvision layout: channel 2*i = dy_i, 2*i + 1 = dx_i (row-major i)
        off = off.reshape(b, h, w, kk, 2)[..., ::-1]  # -> (dx, dy)
        r = (k - 1) / 2.0
        dy, dx = jnp.meshgrid(
            jnp.linspace(-r, r, k), jnp.linspace(-r, r, k), indexing="ij"
        )
        base = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (kk, 2)
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=x.dtype),
                              jnp.arange(w, dtype=x.dtype), indexing="ij")
        centers = jnp.stack([xs, ys], axis=-1)[None, :, :, None, :]
        pos = centers + base + off  # (b, h, w, kk, 2)
        sampled = bilinear_sample_zeros(x, pos.reshape(b, h * w * kk, 2))
        sampled = sampled.reshape(b, h, w, kk * c)
        return nn.Dense(self.features, name="mix")(sampled)


class CompatConvBlock(nn.Module):
    """conv3x3 -> BN -> SELU twice, BN folded (reference aliked.py:464-493)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.selu(nn.Conv(self.features, (3, 3), padding="SAME",
                            name="conv1")(x))
        x = nn.selu(nn.Conv(self.features, (3, 3), padding="SAME",
                            name="conv2")(x))
        return x


class CompatResBlock(nn.Module):
    """Official ResBlock: conv-bn-selu, conv-bn, +1x1-downsample(x), selu
    (reference aliked.py:497-554); BN folded into the conv biases."""

    features: int
    deformable: bool = False

    @nn.compact
    def __call__(self, x):
        conv = (lambda name: CompatDCN(self.features, name=name)) if \
            self.deformable else (
                lambda name: nn.Conv(self.features, (3, 3), padding="SAME",
                                     name=name))
        y = nn.selu(conv("conv1")(x))
        y = conv("conv2")(y)
        identity = nn.Conv(self.features, (1, 1), name="downsample")(x)
        return nn.selu(y + identity)


class CompatSDDH(nn.Module):
    """Official SDDH semantics (reference aliked.py:557-688), batched:
    integer KxK patch at truncated keypoint position (corner clamped to
    [0, w-1-K] — a reference quirk kept for parity), valid KxK offset conv +
    SELU + 1x1 conv, clamp, zero-pad bilinear feature sampling at
    keypoint + offset, 1x1 sf_conv + SELU, learned (M, C, dim) aggregation,
    L2 normalization."""

    dim: int
    k: int = 3
    M: int = 16

    @nn.compact
    def __call__(self, fmap, keypoints):
        # fmap (B, H, W, C); keypoints (B, N, 2) in (x, y) pixel coords
        b, h, w, c = fmap.shape
        n = keypoints.shape[1]
        k, M = self.k, self.M
        kp_int = jnp.floor(keypoints).astype(jnp.int32)
        corner = kp_int - (k - 1) // 2  # == (kp - k/2 + 1).long() for k odd
        corner = jnp.clip(
            corner,
            jnp.zeros((2,), jnp.int32),
            jnp.array([w - 1 - k, h - 1 - k], jnp.int32),
        )
        ii, jj = jnp.meshgrid(jnp.arange(k), jnp.arange(k), indexing="ij")
        px = corner[:, :, None, 0] + jj.ravel()[None, None]  # (B, N, kk)
        py = corner[:, :, None, 1] + ii.ravel()[None, None]
        flat = fmap.reshape(b, h * w, c)
        patch = jnp.take_along_axis(
            flat, (py * w + px).reshape(b, n * k * k, 1), axis=1
        ).reshape(b, n, k * k * c)  # (i, j, c) ordering
        hidden = nn.selu(nn.Dense(2 * M, name="offset1")(patch))
        offs = nn.Dense(2 * M, name="offset2")(hidden)
        offs = jnp.clip(offs, -max(h, w) / 4.0, max(h, w) / 4.0)
        # official layout: view(N, 2, M) -> first M channels = x offsets
        offs = offs.reshape(b, n, 2, M).transpose(0, 1, 3, 2)  # (B, N, M, 2)
        pos = keypoints[:, :, None, :] + offs
        feats = bilinear_sample_zeros(fmap, pos.reshape(b, n * M, 2))
        feats = feats.reshape(b, n, M, c)
        feats = nn.selu(nn.Dense(c, use_bias=False, name="sf_conv")(feats))
        agg_w = self.param("agg", nn.initializers.normal(0.02),
                           (M, c, self.dim))
        desc = jnp.einsum("bnmc,mcd->bnd", feats, agg_w)
        return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", name="conv1")(x)
        x = nn.selu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(x)
        x = nn.selu(x)
        return x


class DeformableConv(nn.Module):
    """DCN as offsets + bilinear gather + dense mix (reference: torchvision
    deform_conv2d used by aliked.py ResBlocks)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.kernel
        kk = k * k
        offsets = nn.Conv(2 * kk, (3, 3), padding="SAME",
                          kernel_init=nn.initializers.zeros, name="offset")(x)
        offsets = offsets.reshape(b, h, w, kk, 2)
        # base sampling grid: k x k neighborhood around each pixel
        r = (k - 1) / 2.0
        dy, dx = jnp.meshgrid(
            jnp.linspace(-r, r, k), jnp.linspace(-r, r, k), indexing="ij"
        )
        base = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (kk, 2)
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=x.dtype),
                              jnp.arange(w, dtype=x.dtype), indexing="ij")
        centers = jnp.stack([xs, ys], axis=-1)[None, :, :, None, :]  # (1,h,w,1,2)
        pos = centers + base + offsets  # (b, h, w, kk, 2)
        sampled = bilinear_sample(x, pos.reshape(b, h * w * kk, 2))
        sampled = sampled.reshape(b, h, w, kk * c)
        out = nn.Dense(self.features, name="mix")(sampled)
        return out


class ResBlock(nn.Module):
    features: int
    deformable: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        if x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), name="proj")(x)
        if self.deformable:
            y = DeformableConv(self.features, name="dcn1")(x)
        else:
            y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(x)
        y = nn.selu(y)
        if self.deformable:
            y = DeformableConv(self.features, name="dcn2")(y)
        else:
            y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(y)
        return nn.selu(y + identity)


class SDDH(nn.Module):
    """Sparse deformable descriptor head (reference aliked.py:557-688):
    per-keypoint offset regression over a k x k patch, M sampled positions,
    learned channel aggregation."""

    dim: int
    k: int = 3
    M: int = 16

    @nn.compact
    def __call__(self, fmap, keypoints):
        # fmap (B, H, W, C) at full feature stride; keypoints (B, N, 2) px
        b, h, w, c = fmap.shape
        n = keypoints.shape[1]
        k, M = self.k, self.M
        # patch features around each keypoint
        r = (k - 1) / 2.0
        dy, dx = jnp.meshgrid(jnp.linspace(-r, r, k), jnp.linspace(-r, r, k),
                              indexing="ij")
        grid = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (kk, 2)
        pos = keypoints[:, :, None, :] + grid[None, None]
        patch = bilinear_sample(fmap, pos.reshape(b, n * k * k, 2))
        patch = patch.reshape(b, n, k * k * c)
        # offset regression: M positions per keypoint
        offs = nn.Dense(2 * M, kernel_init=nn.initializers.zeros, name="offset")(
            nn.selu(nn.Dense(c, name="offset_hidden")(patch))
        ).reshape(b, n, M, 2)
        sample_pos = keypoints[:, :, None, :] + offs * (k * 2.0)
        feats = bilinear_sample(fmap, sample_pos.reshape(b, n * M, 2))
        feats = feats.reshape(b, n, M, c)
        # learned aggregation over the M samples (conv weights einsum,
        # reference aliked.py:676-683)
        agg_w = self.param("agg", nn.initializers.normal(0.02), (M, c, self.dim))
        desc = jnp.einsum("bnmc,mcd->bnd", feats, agg_w)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        return desc


class ALIKED(BaseModel):
    default_conf: ClassVar[dict] = {
        "model_name": "aliked-n16",
        "max_num_keypoints": 1024,
        "detection_threshold": 0.0002,
        "nms_radius": 2,
        "refinement_radius": 2,
        "dense_outputs": False,
        "weights": None,
        # exact official-checkpoint compute graph (stride layout /1,/2,/8,/32,
        # folded BN, per-branch gating, raw score head, DKD + official SDDH) —
        # use with torch_weight_converter() output
        "compat": False,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        c1, c2, c3, c4, dim, k, M = ALIKED_CFGS[self.conf.model_name]
        self.dim = dim
        if self.conf.compat:
            self.block1 = CompatConvBlock(c1, name="block1")
            self.block2 = CompatResBlock(c2, name="block2")
            self.block3 = CompatResBlock(c3, deformable=True, name="block3")
            self.block4 = CompatResBlock(c4, deformable=True, name="block4")
            self.conv1 = nn.Conv(dim // 4, (1, 1), use_bias=False,
                                 name="agg_conv1")
            self.conv2 = nn.Conv(dim // 4, (1, 1), use_bias=False,
                                 name="agg_conv2")
            self.conv3 = nn.Conv(dim // 4, (1, 1), use_bias=False,
                                 name="agg_conv3")
            self.conv4 = nn.Conv(dim // 4, (1, 1), use_bias=False,
                                 name="agg_conv4")
            self.score_head = nn.Sequential(
                [
                    nn.Conv(8, (1, 1), use_bias=False, name="sh1"), nn.selu,
                    nn.Conv(4, (3, 3), padding="SAME", use_bias=False,
                            name="sh2"), nn.selu,
                    nn.Conv(4, (3, 3), padding="SAME", use_bias=False,
                            name="sh3"), nn.selu,
                    nn.Conv(1, (3, 3), padding="SAME", use_bias=False,
                            name="sh4"),
                ]
            )
            self.desc_head = CompatSDDH(dim, k=k, M=M, name="desc_head")
            return
        self.block1 = ConvBlock(c1, name="block1")
        self.block2 = ConvBlock(c2, stride=2, name="block2")
        self.block3 = ResBlock(c3, deformable=True, name="block3")
        self.block4 = ResBlock(c4, deformable=True, name="block4")
        self.pool2 = lambda x: nn.avg_pool(x, (2, 2), strides=(2, 2))
        self.conv1 = nn.Conv(dim // 4, (1, 1), name="agg_conv1")
        self.conv2 = nn.Conv(dim // 4, (1, 1), name="agg_conv2")
        self.conv3 = nn.Conv(dim // 4, (1, 1), name="agg_conv3")
        self.conv4 = nn.Conv(dim // 4, (1, 1), name="agg_conv4")
        # SMH score head (reference aliked.py:890)
        self.score_head = nn.Sequential(
            [
                nn.Conv(8, (1, 1), name="sh1"), nn.selu,
                nn.Conv(4, (3, 3), padding="SAME", name="sh2"), nn.selu,
                nn.Conv(4, (3, 3), padding="SAME", name="sh3"), nn.selu,
                nn.Conv(1, (3, 3), padding="SAME", name="sh4"),
            ]
        )
        self.desc_head = SDDH(dim, k=k, M=M, name="desc_head")

    def extract_dense_map_compat(self, image):
        """Official graph (reference aliked.py:833-864): replicate-pad to /32,
        pool2/pool4/pool4 between blocks, per-branch 1x1+SELU then
        align_corners=True upsampling, raw score head, L2-normalized feature
        map, unpad."""
        b, h0, w0, _ = image.shape
        div = 32
        pad_h = (-h0) % div
        pad_w = (-w0) % div
        pads = (pad_h // 2, pad_h - pad_h // 2, pad_w // 2, pad_w - pad_w // 2)
        if pad_h or pad_w:
            image = jnp.pad(
                image,
                ((0, 0), (pads[0], pads[1]), (pads[2], pads[3]), (0, 0)),
                mode="edge",
            )
        h, w = image.shape[1:3]
        pool2 = lambda x: nn.avg_pool(x, (2, 2), strides=(2, 2))  # noqa: E731
        pool4 = lambda x: nn.avg_pool(x, (4, 4), strides=(4, 4))  # noqa: E731
        x1 = self.block1(image)
        x2 = self.block2(pool2(x1))  # 1/2
        x3 = self.block3(pool4(x2))  # 1/8
        x4 = self.block4(pool4(x3))  # 1/32
        f1 = nn.selu(self.conv1(x1))
        f2 = _resize_align_corners(nn.selu(self.conv2(x2)), h, w)
        f3 = _resize_align_corners(nn.selu(self.conv3(x3)), h, w)
        f4 = _resize_align_corners(nn.selu(self.conv4(x4)), h, w)
        x1234 = jnp.concatenate([f1, f2, f3, f4], axis=-1)
        score_map = self.score_head(x1234)[..., 0]
        feature_map = x1234 / (
            jnp.linalg.norm(x1234, axis=-1, keepdims=True) + 1e-12
        )
        sl_h = slice(pads[0], pads[0] + h0)
        sl_w = slice(pads[2], pads[2] + w0)
        return feature_map[:, sl_h, sl_w], score_map[:, sl_h, sl_w]

    def _forward_compat(self, data: dict) -> dict:
        """Official DKD top-k detection + SDDH (reference aliked.py:106-240,
        866-884), static shapes: top-k slots with validity mask."""
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.tile(image, (1, 1, 1, 3))
        b, h, w, _ = image.shape
        feature_map, score_map = self.extract_dense_map_compat(image)
        radius = int(self.conf.nms_radius)
        k = int(self.conf.max_num_keypoints)
        nms = simple_nms(score_map, radius)
        ys = jnp.arange(h)[None, :, None]
        xs = jnp.arange(w)[None, None, :]
        border = (
            (ys >= radius) & (xs >= radius)
            & (ys < h - radius) & (xs < w - radius)
        )
        if data.get("image_size") is not None:
            isz = data["image_size"]
            border = border & (xs < isz[:, None, None, 0] - radius) & (
                ys < isz[:, None, None, 1] - radius
            )
        nms = jnp.where(border, nms, 0.0)
        top_scores, top_idx = jax.lax.top_k(nms.reshape(b, -1), k)
        valid = top_scores > float(self.conf.detection_threshold)
        kp_nms = jnp.stack(
            [(top_idx % w).astype(jnp.float32),
             (top_idx // w).astype(jnp.float32)], axis=-1
        )  # (B, K, 2) integer nms positions
        # DKD soft-argmax over the raw (2r+1)^2 patch, temperature 0.1
        win = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        dyy, dxx = jnp.meshgrid(win, win, indexing="ij")
        grid = jnp.stack([dxx.ravel(), dyy.ravel()], axis=-1)  # (W2, 2) (x,y)
        pos = kp_nms[:, :, None, :] + grid[None, None]
        pxi = pos[..., 0].astype(jnp.int32)
        pyi = pos[..., 1].astype(jnp.int32)
        inb = (pxi >= 0) & (pxi < w) & (pyi >= 0) & (pyi < h)
        idx = jnp.where(inb, pyi * w + pxi, 0).reshape(b, -1)
        patch = jnp.take_along_axis(score_map.reshape(b, -1), idx, axis=-1)
        patch = patch.reshape(b, k, -1) * inb  # zero-pad like unfold
        max_v = jnp.max(patch, axis=-1, keepdims=True)
        x_exp = jnp.exp((patch - max_v) / 0.1)
        denom = jnp.sum(x_exp, axis=-1, keepdims=True)
        residual = jnp.einsum("bkp,pt->bkt", x_exp, grid) / denom
        dist2 = jnp.sum(
            ((grid[None, None] - residual[:, :, None]) / radius) ** 2, axis=-1
        )
        dispersity = jnp.sum(x_exp * dist2, axis=-1) / denom[..., 0]
        kp_px = kp_nms + residual
        kp_scores = bilinear_sample(
            score_map[..., None], kp_px
        )[..., 0]  # grid_sample align_corners=True == pixel coords
        desc = self.desc_head(feature_map, kp_px)
        # official output convention: wh * (normalized + 1) / 2
        # (reference aliked.py:879 — normalization uses w-1, output uses w)
        wh1 = jnp.array([w - 1.0, h - 1.0])
        keypoints = kp_px / wh1 * jnp.array([float(w), float(h)])
        keypoints = jnp.where(valid[..., None], keypoints, 0.0)
        pred = {
            "keypoints": keypoints,
            "keypoint_scores": jnp.where(valid, kp_scores, 0.0),
            "keypoint_valid": valid,
            "score_dispersity": dispersity,
            "descriptors": desc,
        }
        if self.conf.dense_outputs:
            pred["descriptors_dense"] = feature_map
            pred["score_map"] = score_map
        return pred

    def extract_dense_map(self, image):
        """(reference aliked.py:833-864)"""
        x1 = self.block1(image)  # full res
        x2 = self.block2(x1)  # 1/2
        x3 = self.block3(self.pool2(x2))  # 1/4
        x4 = self.block4(self.pool2(x3))  # 1/8
        h, w = image.shape[1:3]
        f1 = self.conv1(x1)
        f2 = jax.image.resize(self.conv2(x2), (x2.shape[0], h, w, f1.shape[-1]),
                              method="bilinear")
        f3 = jax.image.resize(self.conv3(x3), (x3.shape[0], h, w, f1.shape[-1]),
                              method="bilinear")
        f4 = jax.image.resize(self.conv4(x4), (x4.shape[0], h, w, f1.shape[-1]),
                              method="bilinear")
        feature_map = nn.selu(jnp.concatenate([f1, f2, f3, f4], axis=-1))
        score_map = nn.sigmoid(self.score_head(feature_map)[..., 0])
        return feature_map, score_map

    def _forward(self, data: dict) -> dict:
        if self.conf.compat:
            return self._forward_compat(data)
        image = data["image"]
        feature_map, score_map = self.extract_dense_map(image)
        heat = simple_nms(score_map, int(self.conf.nms_radius))
        keypoints, scores, valid = select_top_k_keypoints(
            heat,
            k=int(self.conf.max_num_keypoints),
            threshold=float(self.conf.detection_threshold),
            border=2,
            image_size=data.get("image_size"),
        )
        if self.conf.refinement_radius > 0:
            keypoints = soft_argmax_refinement(
                keypoints, score_map, int(self.conf.refinement_radius)
            )
        desc = self.desc_head(feature_map, keypoints)
        pred = {
            "keypoints": keypoints + 0.5,
            "keypoint_scores": scores,
            "keypoint_valid": valid,
            "descriptors": desc,
        }
        if self.conf.dense_outputs:
            pred["descriptors_dense"] = feature_map
            pred["score_map"] = score_map
        return pred

    def loss(self, pred, data):
        raise NotImplementedError("ALIKED is used pretrained / as a teacher")


__main_model__ = ALIKED


def torch_weight_converter(state_dict: dict) -> dict:
    """Map an official ALIKED checkpoint (Shiaoming/ALIKED ``*.pth``, the one
    the reference downloads at aliked.py:700,826-831) onto the ``compat: true``
    param tree. Eval-mode BatchNorms (eps 1e-5) are folded into the preceding
    conv weights/biases; DCN regular-conv weights become the dense ``mix``
    kernel; layouts follow torchvision conventions (documented in CompatDCN /
    CompatSDDH). Input: name -> numpy array dict."""
    import numpy as np

    eps = 1e-5
    sd = {k: np.asarray(v, np.float64) for k, v in state_dict.items()}

    def bn_fold(prefix):
        a = sd[f"{prefix}.weight"] / np.sqrt(sd[f"{prefix}.running_var"] + eps)
        return a, sd[f"{prefix}.bias"] - a * sd[f"{prefix}.running_mean"]

    def f32(tree):
        return {k: (v.astype(np.float32) if isinstance(v, np.ndarray)
                    else f32(v)) for k, v in tree.items()}

    def conv_bn(conv_prefix, bn_prefix):
        """3x3/1x1 conv (bias=False) + folded BN -> flax Conv params."""
        a, b = bn_fold(bn_prefix)
        w = sd[f"{conv_prefix}.weight"] * a[:, None, None, None]
        return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}

    def plain_conv(prefix, bias=True):
        p = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            p["bias"] = sd[f"{prefix}.bias"]
        return p

    def dcn(conv_prefix, bn_prefix):
        a, b = bn_fold(bn_prefix)
        w = sd[f"{conv_prefix}.regular_conv.weight"] * a[:, None, None, None]
        cout, cin, kh, kw = w.shape
        mix = w.transpose(2, 3, 1, 0).reshape(kh * kw * cin, cout)
        return {
            "offset": plain_conv(f"{conv_prefix}.offset_conv"),
            "mix": {"kernel": mix, "bias": b},
        }

    params: dict = {
        "block1": {
            "conv1": conv_bn("block1.conv1", "block1.bn1"),
            "conv2": conv_bn("block1.conv2", "block1.bn2"),
        }
    }
    for name, deform in [("block2", False), ("block3", True),
                         ("block4", True)]:
        mk = dcn if deform else conv_bn
        params[name] = {
            "conv1": mk(f"{name}.conv1", f"{name}.bn1"),
            "conv2": mk(f"{name}.conv2", f"{name}.bn2"),
            "downsample": plain_conv(f"{name}.downsample"),
        }
    for i in range(1, 5):
        params[f"agg_conv{i}"] = plain_conv(f"conv{i}", bias=False)
    for i, idx in enumerate([0, 2, 4, 6]):
        params[f"sh{i + 1}"] = plain_conv(f"score_head.{idx}", bias=False)
    w_off1 = sd["desc_head.offset_conv.0.weight"]  # (2M, C, K, K)
    m2, c, kh, kw = w_off1.shape
    params["desc_head"] = {
        "offset1": {
            "kernel": w_off1.transpose(2, 3, 1, 0).reshape(kh * kw * c, m2),
            "bias": sd["desc_head.offset_conv.0.bias"],
        },
        "offset2": {
            "kernel": sd["desc_head.offset_conv.2.weight"][:, :, 0, 0].T,
            "bias": sd["desc_head.offset_conv.2.bias"],
        },
        "sf_conv": {"kernel": sd["desc_head.sf_conv.weight"][:, :, 0, 0].T},
        "agg": sd["desc_head.agg_weights"],
    }
    return {"params": f32(params)}
