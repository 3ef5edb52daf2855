"""SuperPoint-open: the rpautrat TF-port variant with configurable VGG
channels (reference: gluefactory/models/extractors/superpoint_open.py:78-220).

Architecturally identical to extractors.superpoint here (that module already
exposes ``channels``/``head_channels``); this subclass pins the open-source
release's defaults and its weight-name mapping."""

from __future__ import annotations

from typing import ClassVar

from .superpoint import SuperPoint


class SuperPointOpen(SuperPoint):
    default_conf: ClassVar[dict] = {
        "detection_threshold": 0.015,
        "nms_radius": 4,
        "channels": [64, 64, 64, 64, 128, 128, 128, 128],
        "head_channels": 256,
        "descriptor_dim": 256,
    }


__main_model__ = SuperPointOpen
