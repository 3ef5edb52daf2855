"""POLD2 learned line-candidate classifier
(reference: gluefactory/models/extractors/pold2.py MLP filter +
datasets/pold2_mlp_dataset.py:*).

A small MLP scoring a candidate segment from the DF (and optionally AF
alignment) sampled along it; trained on positive (true segment) / negative
(random endpoint pair) examples. At inference it can replace the
hand-tuned inlier-ratio tests of lines/pold2_extractor.py."""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from ...ops.interpolate import bilinear_sample
from ..base_model import BaseModel


def candidate_features(df, af, p0, p1, n_samples: int, use_af: bool):
    """Sample DF (+AF alignment) along segments: (B, C, S[*2]) features."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    pts = p0[:, :, None, :] + t[None, None, :, None] * (p1 - p0)[:, :, None, :]
    b, c, s, _ = pts.shape
    feats = bilinear_sample(df[..., None], pts.reshape(b, c * s, 2))[..., 0]
    feats = feats.reshape(b, c, s)
    if use_af and af is not None:
        ang = bilinear_sample(af[..., None], pts.reshape(b, c * s, 2))[..., 0]
        ang = ang.reshape(b, c, s)
        seg_ang = jnp.arctan2((p1 - p0)[..., 1], (p1 - p0)[..., 0])[..., None] % jnp.pi
        diff = jnp.abs(ang % jnp.pi - seg_ang)
        diff = jnp.minimum(diff, jnp.pi - diff)
        feats = jnp.concatenate([feats, diff], axis=-1)
    return feats


class POLD2MLP(BaseModel):
    default_conf: ClassVar[dict] = {
        "n_samples": 24,
        "use_angle_field": True,
        "hidden": [128, 64],
        "loss": {},
    }
    required_data_keys: ClassVar[list] = ["distance_field", "candidates0", "candidates1"]

    @nn.compact
    def _forward(self, data: dict) -> dict:
        conf = self.conf
        feats = candidate_features(
            data["distance_field"], data.get("angle_field"),
            data["candidates0"], data["candidates1"],
            int(conf.n_samples), bool(conf.use_angle_field),
        )
        x = feats
        for i, h in enumerate(list(conf.hidden)):
            x = nn.relu(nn.Dense(h, name=f"fc{i}")(x))
        logits = nn.Dense(1, name="out")(x)[..., 0]
        return {"line_logits": logits, "line_probs": nn.sigmoid(logits)}

    def loss(self, pred: dict, data: dict):
        labels = data["gt_labels"].astype(jnp.float32)
        logits = pred["line_logits"]
        bce = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )
        mask = data.get("candidate_valid", jnp.ones_like(labels)).astype(jnp.float32)
        loss = jnp.sum(bce * mask, axis=-1) / jnp.maximum(mask.sum(-1), 1.0)
        correct = ((pred["line_probs"] > 0.5) == (labels > 0.5)).astype(jnp.float32)
        acc = jnp.sum(correct * mask, axis=-1) / jnp.maximum(mask.sum(-1), 1.0)
        return {"total": loss, "bce": loss}, {"accuracy": acc}


__main_model__ = POLD2MLP
