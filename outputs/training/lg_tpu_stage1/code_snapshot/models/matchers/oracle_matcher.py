"""Oracle matcher: outputs GT matches as predictions — an upper-bound /
debugging matcher for benchmarks (composite of the reference's GT oracles
used as pipeline matchers, reference matchers/homography_matcher.py +
depth_matcher.py)."""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp

from ...geometry.gt_generation import gt_matches_from_homography, gt_matches_from_pose_depth
from ..base_model import BaseModel


class OracleMatcher(BaseModel):
    default_conf: ClassVar[dict] = {
        "source": "homography",  # homography | depth
        "th_positive": 3.0,
        "trainable": False,
    }
    required_data_keys: ClassVar[list] = ["keypoints0", "keypoints1"]

    def _forward(self, data: dict) -> dict:
        if self.conf.source == "homography":
            out = gt_matches_from_homography(
                data["keypoints0"], data["keypoints1"], data["H_0to1"],
                valid0=data.get("keypoint_valid0"),
                valid1=data.get("keypoint_valid1"),
                pos_th=self.conf.th_positive,
            )
        else:
            out = gt_matches_from_pose_depth(
                data["keypoints0"], data["keypoints1"],
                data["view0"]["depth"], data["view1"]["depth"],
                data["view0"]["camera"], data["view1"]["camera"], data["T_0to1"],
                valid0=data.get("keypoint_valid0"),
                valid1=data.get("keypoint_valid1"),
                pos_th=self.conf.th_positive,
            )
        m0 = jnp.where(out["matches0"] >= 0, out["matches0"], -1)
        m1 = jnp.where(out["matches1"] >= 0, out["matches1"], -1)
        return {
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": (m0 >= 0).astype(jnp.float32),
            "matching_scores1": (m1 >= 0).astype(jnp.float32),
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = OracleMatcher
