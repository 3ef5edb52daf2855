"""GT oracle matcher from a known homography — used as the ``ground_truth``
slot of the pipeline (reference: gluefactory/models/matchers/homography_matcher.py:8-66)."""

from __future__ import annotations

from typing import ClassVar

from ...geometry.gt_generation import gt_matches_from_homography
from ..base_model import BaseModel


class HomographyMatcher(BaseModel):
    default_conf: ClassVar[dict] = {
        "use_points": True,
        "use_lines": False,  # GT matches for detected lines (reference :40-60)
        "th_positive": 3.0,
        "th_negative": 6.0,
        "line_dist_th": 5.0,
        "line_overlap_th": 0.2,
    }
    required_data_keys: ClassVar[list] = ["H_0to1", "keypoints0", "keypoints1"]

    def _forward(self, data: dict) -> dict:
        pred = {}
        if self.conf.use_points:
            result = gt_matches_from_homography(
                data["keypoints0"],
                data["keypoints1"],
                data["H_0to1"],
                image_size0=data.get("view0", {}).get("image_size"),
                image_size1=data.get("view1", {}).get("image_size"),
                valid0=data.get("keypoint_valid0"),
                valid1=data.get("keypoint_valid1"),
                pos_th=self.conf.th_positive,
                neg_th=self.conf.th_negative,
            )
            pred.update({"gt_" + k: v for k, v in result.items()})
        if self.conf.use_lines and "lines0" in data:
            import jax.numpy as jnp

            from ...geometry.lines import gt_line_matches_from_homography

            vl0 = data.get("valid_lines0", jnp.ones(data["lines0"].shape[:2], bool))
            vl1 = data.get("valid_lines1", jnp.ones(data["lines1"].shape[:2], bool))
            lres = gt_line_matches_from_homography(
                data["lines0"], data["lines1"], vl0, vl1, data["H_0to1"],
                dist_th=float(self.conf.line_dist_th),
                overlap_th=float(self.conf.line_overlap_th),
            )
            pred.update({"gt_" + k: v for k, v in lres.items()})
        return pred

    def loss(self, pred: dict, data: dict):
        raise NotImplementedError


__main_model__ = HomographyMatcher
