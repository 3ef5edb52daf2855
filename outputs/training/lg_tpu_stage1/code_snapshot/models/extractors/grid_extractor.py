"""Regular-grid "keypoints" (reference: gluefactory/models/extractors/grid_extractor.py:20-60).

Useful for dense matching baselines and as a deterministic extractor in
integration tests (grid + GT oracle matcher => exact geometry recovery)."""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp

from ..base_model import BaseModel


class GridExtractor(BaseModel):
    default_conf: ClassVar[dict] = {"cell_size": 14, "trainable": False}
    required_data_keys: ClassVar[list] = ["image"]

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        b, h, w, _ = image.shape
        cs = int(self.conf.cell_size)
        ys = jnp.arange(cs // 2, h, cs, dtype=jnp.float32)
        xs = jnp.arange(cs // 2, w, cs, dtype=jnp.float32)
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
        kpts = jnp.broadcast_to(grid, (b, *grid.shape))
        valid = jnp.ones(kpts.shape[:-1], dtype=bool)
        size = data.get("image_size")
        if size is not None:
            valid = jnp.all(kpts < size[:, None, :], axis=-1)
        scores = jnp.ones(kpts.shape[:-1], dtype=jnp.float32)
        # descriptor = normalized position + local mean color (deterministic)
        pos = kpts / jnp.asarray([w, h], jnp.float32)
        desc = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        return {
            "keypoints": kpts + 0.0,
            "keypoint_scores": scores,
            "keypoint_valid": valid,
            "descriptors": desc,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = GridExtractor
