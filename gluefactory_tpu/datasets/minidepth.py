"""MiniDepth (MegaDepth subset) single-view training set with cached GT
(reference: gluefactory/datasets/minidepth.py:18-506).

Thin preset over cached_gt_dataset (see scripts/generate_gt.py for producing
the field cache)."""

from typing import ClassVar

from .cached_gt_dataset import CachedGTDataset


class MiniDepthDataset(CachedGTDataset):
    default_conf: ClassVar[dict] = {
        "name": "minidepth",
        "images": "minidepth/images",
        "gt_file": "minidepth/gt_fields.h5",
        "preprocessing": {"resize": 480, "side": "long", "square_pad": True},
    }


__main_dataset__ = MiniDepthDataset
