"""Estimator contract (reference: gluefactory/robust_estimators/base_estimator.py:6-34).

dict in (``m_kpts0``, ``m_kpts1``, optionally ``valid``/``camera0``/``camera1``)
-> dict out (``success``, ``M_0to1``, ``inliers``). All TPU estimators are
batched over hypotheses internally and jittable end-to-end; unlike the
reference's external C++ wheels (PoseLib/OpenCV/pycolmap), RANSAC runs on
device (SURVEY.md §2.9)."""

from __future__ import annotations

from ..core.config import Config


class BaseEstimator:
    default_conf: dict = {"ransac_th": 3.0}

    def __init__(self, conf: Config | dict | None = None):
        merged: dict = {}
        for klass in reversed(type(self).__mro__):
            dc = klass.__dict__.get("default_conf")
            if dc:
                merged = Config(merged).merge(dc).to_dict()
        self.conf = Config(merged).merge(conf or {}).freeze()

    def __call__(self, data: dict) -> dict:
        return self._forward(data)

    def _forward(self, data: dict) -> dict:
        raise NotImplementedError
