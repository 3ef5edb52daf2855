"""DeepLSD-style line detector: CNN distance/angle fields -> line segments
(reference: gluefactory/models/lines/deeplsd.py:10-161 +
models/deeplsd_inference.py — the reference wraps the pip DeepLSD package
whose field-to-segment step is C++/numpy; here the fields come from a
trainable flax UNet and the segment extraction is the batched POLD2
candidate filter seeded by local minima of the distance field, all on
device)."""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.nms import select_top_k_keypoints, simple_nms
from ..base_model import BaseModel, make_submodel


class UNetDown(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME", name="c2")(x)
        return nn.relu(x)


class DeepLSD(BaseModel):
    default_conf: ClassVar[dict] = {
        "channels": [16, 32, 64],
        "line_neighborhood": 5.0,
        "max_num_candidates": 256,  # local DF minima used as endpoints
        "extract_lines": True,
        "line_extractor": {
            "name": "lines.pold2_extractor",
            "max_num_points": 256,
            "max_num_lines": 512,
        },
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        chs = list(self.conf.channels)
        self.down = [UNetDown(c, name=f"down{i}") for i, c in enumerate(chs)]
        self.up = [UNetDown(c, name=f"up{i}") for i, c in enumerate(chs[-2::-1])]
        self.df_head = nn.Conv(1, (3, 3), padding="SAME", name="df_head")
        self.af_head = nn.Conv(2, (3, 3), padding="SAME", name="af_head")
        if self.conf.extract_lines:
            self.line_extractor = make_submodel(self.conf.line_extractor)

    def _fields(self, image):
        x = image
        skips = []
        for i, block in enumerate(self.down):
            x = block(x)
            if i < len(self.down) - 1:
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for block, skip in zip(self.up, reversed(skips)):
            x = jax.image.resize(x, (*skip.shape[:3], x.shape[-1]), "bilinear")
            x = block(jnp.concatenate([x, skip], axis=-1))
        r = self.conf.line_neighborhood
        df_norm = nn.sigmoid(self.df_head(x)[..., 0])
        df = (1.0 - df_norm) * r
        sc = self.af_head(x)
        angle = (0.5 * jnp.arctan2(sc[..., 0], sc[..., 1])) % jnp.pi
        return df, df_norm, angle, sc

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        df, df_norm, angle, sincos = self._fields(image)
        pred = {
            "distance_field": df,
            "distance_field_norm": df_norm,
            "angle_field": angle,
            "angle_field_sincos": sincos,
        }
        if self.conf.extract_lines:
            # candidate endpoints: local maxima of -df (= DF minima)
            sal = simple_nms(1.0 / (1.0 + df), radius=2)
            cands, scores, valid = select_top_k_keypoints(
                sal, k=int(self.conf.max_num_candidates), threshold=0.0, border=2,
                image_size=data.get("image_size"),
            )
            line_pred = self.line_extractor(
                {
                    "keypoints": cands,
                    "keypoint_valid": valid,
                    "distance_field": df,
                    "angle_field": angle,
                }
            )
            pred.update(line_pred)
        return pred

    def loss(self, pred: dict, data: dict):
        r = self.conf.line_neighborhood
        losses = {}
        total = 0
        if "gt_distance_field" in data:
            gt_norm = 1.0 - jnp.clip(data["gt_distance_field"], 0.0, r) / r
            df_loss = jnp.mean(jnp.abs(pred["distance_field_norm"] - gt_norm), axis=(1, 2))
            losses["df"] = df_loss
            total = total + df_loss
        if "gt_angle_field" in data:
            near = data["gt_distance_field"] < r
            gt_a = data["gt_angle_field"]
            target = jnp.stack([jnp.sin(2 * gt_a), jnp.cos(2 * gt_a)], axis=-1)
            err = jnp.sum(jnp.abs(pred["angle_field_sincos"] - target), axis=-1)
            af_loss = jnp.sum(err * near, axis=(1, 2)) / jnp.maximum(
                near.sum(axis=(1, 2)), 1.0
            )
            losses["af"] = af_loss
            total = total + af_loss
        losses["total"] = total
        return losses, {}


__main_model__ = DeepLSD
