"""ALIKED-light: encoder + SDDH only, computing descriptors at GIVEN
keypoints — the on-the-fly descriptor TEACHER for JPLDD distillation
(reference: gluefactory/models/extractors/aliked_light.py:34-203)."""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..base_model import BaseModel
from .aliked import ALIKED_CFGS, ConvBlock, ResBlock, SDDH


class ALIKEDLight(BaseModel):
    default_conf: ClassVar[dict] = {
        "model_name": "aliked-n16",
        "trainable": False,
    }
    required_data_keys: ClassVar[list] = ["image", "keypoints"]

    def setup(self):
        c1, c2, c3, c4, dim, k, M = ALIKED_CFGS[self.conf.model_name]
        self.block1 = ConvBlock(c1, name="block1")
        self.block2 = ConvBlock(c2, stride=2, name="block2")
        self.block3 = ResBlock(c3, deformable=True, name="block3")
        self.block4 = ResBlock(c4, deformable=True, name="block4")
        self.conv1 = nn.Conv(dim // 4, (1, 1), name="agg_conv1")
        self.conv2 = nn.Conv(dim // 4, (1, 1), name="agg_conv2")
        self.conv3 = nn.Conv(dim // 4, (1, 1), name="agg_conv3")
        self.conv4 = nn.Conv(dim // 4, (1, 1), name="agg_conv4")
        self.desc_head = SDDH(dim, k=k, M=M, name="desc_head")

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        x1 = self.block1(image)
        x2 = self.block2(x1)
        x3 = self.block3(nn.avg_pool(x2, (2, 2), strides=(2, 2)))
        x4 = self.block4(nn.avg_pool(x3, (2, 2), strides=(2, 2)))
        h, w = image.shape[1:3]
        f1 = self.conv1(x1)
        f2 = jax.image.resize(self.conv2(x2), (x2.shape[0], h, w, f1.shape[-1]), "bilinear")
        f3 = jax.image.resize(self.conv3(x3), (x3.shape[0], h, w, f1.shape[-1]), "bilinear")
        f4 = jax.image.resize(self.conv4(x4), (x4.shape[0], h, w, f1.shape[-1]), "bilinear")
        fmap = nn.selu(jnp.concatenate([f1, f2, f3, f4], axis=-1))
        desc = self.desc_head(fmap, data["keypoints"] - 0.5)
        return {"descriptors": desc}

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = ALIKEDLight
