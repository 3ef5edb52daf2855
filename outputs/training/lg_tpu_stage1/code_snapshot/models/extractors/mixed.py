"""Mixed extractor: separate detector + descriptor sub-models
(reference: gluefactory/models/extractors/mixed.py:10-76).

The detector contributes keypoints; descriptors are interpolated from the
descriptor model's dense field at those keypoints."""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp

from ...ops.interpolate import bilinear_sample, sample_descriptors
from ..base_model import BaseModel, make_submodel


class MixedExtractor(BaseModel):
    default_conf: ClassVar[dict] = {
        "detector": {"name": None},
        "descriptor": {"name": None},
        "interpolate_descriptors_from": "descriptors_dense",
        "descriptor_stride": 1,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        self.detector = make_submodel(self.conf.detector)
        self.descriptor = make_submodel(self.conf.descriptor)

    def _forward(self, data: dict) -> dict:
        pred_det = self.detector(data)
        pred_desc = self.descriptor(data)
        pred = {**pred_desc, **pred_det}
        dense = pred_desc.get(self.conf.interpolate_descriptors_from)
        if dense is not None:
            stride = int(self.conf.descriptor_stride)
            if stride > 1:
                desc = sample_descriptors(dense, pred["keypoints"] - 0.5, stride=stride)
            else:
                desc = bilinear_sample(dense, pred["keypoints"] - 0.5)
                desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
            pred["descriptors"] = desc
        return pred

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = MixedExtractor
