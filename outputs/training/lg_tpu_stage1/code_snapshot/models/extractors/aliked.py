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

from ...ops.interpolate import bilinear_sample
from ...ops.nms import select_top_k_keypoints, simple_nms, soft_argmax_refinement
from ..base_model import BaseModel

ALIKED_CFGS = {
    # c1, c2, c3, c4, dim, K (SDDH sample count), M (SDDH M)
    "aliked-t16": (8, 16, 32, 64, 64, 3, 16),
    "aliked-n16": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n16rot": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n32": (16, 32, 64, 128, 128, 3, 32),
}


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
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        c1, c2, c3, c4, dim, k, M = ALIKED_CFGS[self.conf.model_name]
        self.dim = dim
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
