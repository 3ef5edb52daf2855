"""ScanNet single-view training subset with cached pseudo-GT
(reference: gluefactory/datasets/scannet.py:21-620 — 12k indoor images with
cached SuperPoint-HA heatmaps + DeepLSD DF/AF).

Thin preset over cached_gt_dataset: point ScanNet images + a GT cache made by
scripts/generate_gt.py at the expected locations."""

from typing import ClassVar

from .cached_gt_dataset import CachedGTDataset


class ScanNetDataset(CachedGTDataset):
    default_conf: ClassVar[dict] = {
        "name": "scannet",
        "images": "scannet/images",
        "gt_file": "scannet/gt_fields.h5",
        "preprocessing": {"resize": 480, "side": "long", "square_pad": True},
    }


__main_dataset__ = ScanNetDataset
