"""MiniDepth (MegaDepth subset) single-view training set with cached GT
(reference: gluefactory/datasets/minidepth.py:18-506).

Preset over cached_gt_dataset (see scripts/generate_gt.py for producing the
field cache). Scene-list splits (reference train/val_scenes_file_path) are
supported via ``train_scenes_file``/``val_scenes_file`` — point them at txt
files of MegaDepth scene dirs to reproduce the reference's
megadepth1500-excluded split."""

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
