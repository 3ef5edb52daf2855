"""GT oracle matcher from depth + relative pose
(reference: gluefactory/models/matchers/depth_matcher.py:10-82)."""

from __future__ import annotations

from typing import ClassVar

from ...geometry.gt_generation import gt_matches_from_pose_depth
from ..base_model import BaseModel


class DepthMatcher(BaseModel):
    default_conf: ClassVar[dict] = {
        "use_points": True,
        "th_positive": 3.0,
        "th_negative": 5.0,
        "th_epi": None,
    }
    required_data_keys: ClassVar[list] = ["view0", "view1", "T_0to1"]

    def _forward(self, data: dict) -> dict:
        pred = {}
        if self.conf.use_points:
            result = gt_matches_from_pose_depth(
                data["keypoints0"],
                data["keypoints1"],
                data["view0"]["depth"],
                data["view1"]["depth"],
                data["view0"]["camera"],
                data["view1"]["camera"],
                data["T_0to1"],
                valid0=data.get("keypoint_valid0"),
                valid1=data.get("keypoint_valid1"),
                pos_th=self.conf.th_positive,
                neg_th=self.conf.th_negative,
            )
            pred.update({"gt_" + k: v for k, v in result.items()})
        return pred

    def loss(self, pred: dict, data: dict):
        raise NotImplementedError


__main_model__ = DepthMatcher
