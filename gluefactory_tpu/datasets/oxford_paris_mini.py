"""Oxford-Paris mini single-view subsets (reference:
gluefactory/datasets/oxford_paris_mini.py + oxford_paris_mini_1view_jpldd.py:18
— 1-view images serving cached heatmap/DF/AF GT for JPLDD training).

Preset over cached_gt_dataset; for zero-download training use
datasets/synthetic_shapes.py instead (exact analytic GT)."""

from typing import ClassVar

from .cached_gt_dataset import CachedGTDataset


class OxfordParisMiniDataset(CachedGTDataset):
    default_conf: ClassVar[dict] = {
        "name": "oxford_paris_mini",
        "images": "revisitop1m",
        "gt_file": "revisitop1m/gt_fields.h5",
        "preprocessing": {"resize": 320, "side": "long", "square_pad": True},
    }


__main_dataset__ = OxfordParisMiniDataset
