"""DISK keypoint detector-descriptor
(reference: gluefactory/models/extractors/disk_kornia.py:8-108, which wraps
kornia's pretrained DISK; here the architecture itself — a U-Net producing a
detection heatmap + dense descriptors — is implemented in flax so it is
trainable and TPU-native; weight import from the kornia checkpoint follows
the same conv-layout mapping as SuperPoint)."""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.interpolate import bilinear_sample
from ...ops.nms import select_top_k_keypoints, simple_nms
from ..base_model import BaseModel


class UNetBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", name="c1")(x)
        x = nn.gelu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", name="c2")(x)
        return nn.gelu(x)


class DISK(BaseModel):
    default_conf: ClassVar[dict] = {
        "descriptor_dim": 128,
        "channels": [32, 64, 128, 128],
        "max_num_keypoints": 2048,
        "nms_radius": 2,
        "detection_threshold": 0.0,
        "dense_outputs": False,
        "weights": None,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        chs = list(self.conf.channels)
        self.down = [UNetBlock(c, name=f"down{i}") for i, c in enumerate(chs)]
        self.up = [UNetBlock(c, name=f"up{i}") for i, c in enumerate(chs[-2::-1])]
        self.head = nn.Conv(self.conf.descriptor_dim + 1, (1, 1), name="head")

    def _forward(self, data: dict) -> dict:
        x = data["image"]
        skips = []
        for i, block in enumerate(self.down):
            x = block(x)
            if i < len(self.down) - 1:
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for block, skip in zip(self.up, reversed(skips)):
            x = jax.image.resize(x, (*skip.shape[:3], x.shape[-1]), "bilinear")
            x = block(jnp.concatenate([x, skip], axis=-1))
        out = self.head(x)
        desc_dense = out[..., : self.conf.descriptor_dim]
        desc_dense = desc_dense / (
            jnp.linalg.norm(desc_dense, axis=-1, keepdims=True) + 1e-8
        )
        heat = nn.sigmoid(out[..., -1])
        nmsed = simple_nms(heat, int(self.conf.nms_radius))
        keypoints, scores, valid = select_top_k_keypoints(
            nmsed, k=int(self.conf.max_num_keypoints),
            threshold=float(self.conf.detection_threshold), border=2,
            image_size=data.get("image_size"),
        )
        desc = bilinear_sample(desc_dense, keypoints)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        pred = {
            "keypoints": keypoints + 0.5,
            "keypoint_scores": scores,
            "keypoint_valid": valid,
            "descriptors": desc,
        }
        if self.conf.dense_outputs:
            pred["descriptors_dense"] = desc_dense
            pred["heatmap"] = heat
        return pred

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = DISK
