"""GT/heuristic line matcher by geometric distance under a homography
(reference: gluefactory/models/matchers/line_matcher.py:9-65). Used as the
``ground_truth`` slot for line matchers and as an oracle baseline."""

from __future__ import annotations

from typing import ClassVar

from ...geometry.lines import gt_line_matches_from_homography
from ..base_model import BaseModel


class LineMatcher(BaseModel):
    default_conf: ClassVar[dict] = {
        "dist_th": 5.0,
        "overlap_th": 0.2,
        "n_samples": 16,
        "trainable": False,
    }
    required_data_keys: ClassVar[list] = ["lines0", "lines1", "H_0to1"]

    def _forward(self, data: dict) -> dict:
        import jax.numpy as jnp

        vl0 = data.get("valid_lines0", jnp.ones(data["lines0"].shape[:2], bool))
        vl1 = data.get("valid_lines1", jnp.ones(data["lines1"].shape[:2], bool))
        out = gt_line_matches_from_homography(
            data["lines0"], data["lines1"], vl0, vl1, data["H_0to1"],
            n_samples=int(self.conf.n_samples),
            dist_th=float(self.conf.dist_th),
            overlap_th=float(self.conf.overlap_th),
        )
        return {"gt_" + k if not k.startswith("gt_") else k: v for k, v in out.items()}

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = LineMatcher
