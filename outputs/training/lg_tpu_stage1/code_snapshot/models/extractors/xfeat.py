"""XFeat: accelerated lightweight keypoint detector-descriptor
(reference: gluefactory/models/extractors/xfeat.py:223-431 — the verlab XFeat
CNN re-designed in flax/NHWC).

Structure kept: a cheap stem + residual blocks to 1/8 resolution with 64-d
features; a 65-channel cell-logit keypoint head (SuperPoint-style pixel
unshuffle); a reliability heatmap head; descriptors bilinearly sampled from
the 1/8 feature map. Sparse and dense output modes."""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from ...ops.interpolate import sample_descriptors
from ...ops.nms import select_top_k_keypoints, simple_nms
from ..base_model import BaseModel


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", name="c1")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=True, name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="c2")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2, name="proj")(x)
        return nn.relu(x + y)


class XFeat(BaseModel):
    default_conf: ClassVar[dict] = {
        "max_num_keypoints": 4096,
        "detection_threshold": 0.05,
        "nms_radius": 2,
        "descriptor_dim": 64,
        "dense_outputs": False,
        "weights": None,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        d = self.conf.descriptor_dim
        self.stem = [
            BasicBlock(4, name="b1"), BasicBlock(8, stride=2, name="b2"),
            BasicBlock(8, name="b3"), BasicBlock(24, stride=2, name="b4"),
            BasicBlock(24, name="b5"), BasicBlock(64, stride=2, name="b6"),
            BasicBlock(64, name="b7"),
        ]
        self.desc_proj = nn.Conv(d, (1, 1), name="desc_proj")
        self.kp_head = nn.Conv(65, (1, 1), name="kp_head")
        self.rel_head = nn.Conv(1, (1, 1), name="rel_head")

    def _forward(self, data: dict) -> dict:
        x = data["image"]
        if x.shape[-1] == 3:
            x = jnp.mean(x, axis=-1, keepdims=True)
        for block in self.stem:
            x = block(x)
        feats = self.desc_proj(x)  # (B, H/8, W/8, d)
        feats_n = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
        b, hc, wc, _ = feats.shape
        logits = self.kp_head(x)
        probs = nn.softmax(logits, axis=-1)[..., :-1]
        heat = probs.reshape(b, hc, wc, 8, 8).transpose(0, 1, 3, 2, 4)
        heat = heat.reshape(b, hc * 8, wc * 8)
        reliability = nn.sigmoid(self.rel_head(x)[..., 0])
        heat = simple_nms(heat, int(self.conf.nms_radius))
        keypoints, scores, valid = select_top_k_keypoints(
            heat, k=int(self.conf.max_num_keypoints),
            threshold=float(self.conf.detection_threshold), border=4,
            image_size=data.get("image_size"),
        )
        desc = sample_descriptors(feats_n, keypoints, stride=8)
        pred = {
            "keypoints": keypoints + 0.5,
            "keypoint_scores": scores,
            "keypoint_valid": valid,
            "descriptors": desc,
        }
        if self.conf.dense_outputs:
            pred["descriptors_dense"] = feats_n
            pred["reliability"] = reliability
        return pred

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = XFeat
