"""Composite two-view pipeline
(reference: gluefactory/models/two_view_pipeline.py:21-114).

Slots: ``extractor -> matcher -> filter -> solver -> ground_truth``; each is
an optional named sub-model built from its conf sub-dict. The extractor runs
per view (shared weights) on ``view0``/``view1``; predictions are flattened
into ``*0``/``*1`` keys for the matcher. ``run_gt_in_forward`` moves GT
generation inside the jitted forward so supervision is computed on device.
"""

from __future__ import annotations

from typing import ClassVar

from .base_model import BaseModel, make_submodel

TO_CTX = ["keypoints", "keypoint_scores", "descriptors", "keypoint_valid",
          "lines", "line_scores", "valid_lines"]


class TwoViewPipeline(BaseModel):
    default_conf: ClassVar[dict] = {
        "extractor": {"name": None},
        "matcher": {"name": None},
        "filter": {"name": None},
        "solver": {"name": None},
        "ground_truth": {"name": None},
        "allow_no_extract": False,
        "run_gt_in_forward": False,
    }
    required_data_keys: ClassVar[list] = ["view0", "view1"]
    components: ClassVar[list] = ["extractor", "matcher", "filter", "solver", "ground_truth"]

    def setup(self):
        for comp in self.components:
            sub = self.conf.get(comp)
            if sub is not None and sub.get("name") is not None:
                setattr(self, comp, make_submodel(sub))
            else:
                setattr(self, comp, None)

    def extract_view(self, data: dict, i: str) -> dict:
        """(reference two_view_pipeline.py:62-70)"""
        data_i = data[f"view{i}"]
        pred_i = data_i.get("cache", {})
        skip_extract = len(pred_i) > 0 and self.conf.allow_no_extract
        if self.extractor is not None and not skip_extract:
            pred_i = {**self.extractor({**data_i, **pred_i}), **pred_i}
        return pred_i

    def _forward(self, data: dict) -> dict:
        pred0 = self.extract_view(data, "0")
        pred1 = self.extract_view(data, "1")
        pred = {
            **{k + "0": v for k, v in pred0.items()},
            **{k + "1": v for k, v in pred1.items()},
        }
        if self.matcher is not None:
            pred = {**pred, **self.matcher({**data, **pred})}
        if self.filter is not None:
            pred = {**pred, **self.filter({**data, **pred})}
        if self.solver is not None:
            pred = {**pred, **self.solver({**data, **pred})}
        if self.ground_truth is not None and self.conf.run_gt_in_forward:
            gt_pred = self.ground_truth({**data, **pred})
            pred.update({f"gt_{k}" if not k.startswith("gt_") else k: v for k, v in gt_pred.items()})
        return pred

    def loss(self, pred: dict, data: dict):
        """Aggregate sub-model losses (reference two_view_pipeline.py:92-114)."""
        losses = {}
        metrics = {}
        total = 0
        if self.ground_truth is not None and not self.conf.run_gt_in_forward:
            gt_pred = self.ground_truth({**data, **pred})
            pred.update({f"gt_{k}" if not k.startswith("gt_") else k: v for k, v in gt_pred.items()})
        for comp in ["extractor", "matcher", "filter", "solver"]:
            model = getattr(self, comp)
            if model is None:
                continue
            if not model.conf.get("trainable", True):
                continue
            try:
                losses_i, metrics_i = model.loss(pred, {**pred, **data})
            except NotImplementedError:
                continue
            losses = {**losses, **losses_i}
            metrics = {**metrics, **metrics_i}
            total = losses_i["total"] + total
        losses["total"] = total
        return losses, metrics


__main_model__ = TwoViewPipeline
