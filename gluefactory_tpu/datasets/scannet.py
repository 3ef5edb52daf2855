"""ScanNet single-view training subset with cached pseudo-GT
(reference: gluefactory/datasets/scannet.py:21-620 — indoor scene folders
``<scene>/color/*.jpg`` with cached SuperPoint-HA heatmaps + DeepLSD DF/AF,
equidistant per-scene frame sampling and a multiscale-learning option).

Beyond the cached-GT serving (cached_gt_dataset), this adds:
  - scene-structured sampling: scenes split between train/val, a budget of
    ``num_images`` frames drawn EQUIDISTANTLY from each scene's frame
    sequence (reference _sample_with_equi_distance:187-211) so the subset
    spans every trajectory instead of clustering at its start;
  - multiscale learning (reference scannet.py:509-598 changes the resize
    mid-epoch): TPU-compatible variant — the resize cycles through
    ``multiscale_sizes`` PER EPOCH via the loader's set_epoch hook, so each
    epoch still compiles exactly one static shape."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import numpy as np

from .. import logger
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor
from .cached_gt_dataset import CachedGTDataset, _CachedSplit


class ScanNetDataset(CachedGTDataset):
    default_conf: ClassVar[dict] = {
        "name": "scannet",
        "images": "scannet/images",  # <root>/<scene>/color/*.jpg
        "gt_file": "scannet/gt_fields.h5",
        "num_images": 12000,  # total frame budget across scenes
        "val_scene_frac": 0.1,
        "multiscale_sizes": None,  # e.g. [320, 480, 640]: cycle per epoch
        "preprocessing": {"resize": 480, "side": "long", "square_pad": True},
    }

    def _init(self, conf):
        super()._init(conf)
        # group frames by scene (parent of 'color', else first path part)
        scenes: dict[str, list] = {}
        for p in self.paths:
            rel = p.relative_to(self.root)
            scene = rel.parts[0] if len(rel.parts) > 1 else "_flat"
            scenes.setdefault(scene, []).append(p)
        names = sorted(scenes)
        n_val = max(1, int(len(names) * float(conf.val_scene_frac))) if len(names) > 1 else 0
        self.val_scenes = set(names[:n_val])
        self.train_scenes = set(names[n_val:]) or set(names)
        budget = int(conf.num_images)
        per_scene = max(1, budget // max(len(self.train_scenes), 1))
        self.scene_frames: dict[str, list] = {}
        for scene, frames in scenes.items():
            frames = sorted(frames)
            k = per_scene
            if len(frames) > k:
                # equidistant subsample across the trajectory
                sel = np.linspace(0, len(frames) - 1, k).round().astype(int)
                frames = [frames[i] for i in sorted(set(sel.tolist()))]
            self.scene_frames[scene] = frames
        logger.info(
            "[scannet] %d train scenes / %d val scenes, ~%d frames/scene",
            len(self.train_scenes), len(self.val_scenes), per_scene,
        )

    def get_dataset(self, split: str):
        return _ScanNetSplit(self, split)


class _ScanNetSplit(_CachedSplit):
    def __init__(self, parent: ScanNetDataset, split: str):
        self.parent = parent
        self.conf = parent.conf
        self.split = split
        scenes = parent.val_scenes if split == "val" else parent.train_scenes
        self.paths = [p for s in sorted(scenes) for p in parent.scene_frames[s]]
        self._file = None
        self._epoch_preprocessor = None

    def set_epoch(self, epoch: int):
        sizes = self.conf.multiscale_sizes
        if sizes:
            size = int(list(sizes)[epoch % len(list(sizes))])
            pp = dict(self.conf.preprocessing.to_dict())
            pp["resize"] = size
            # consumed by _CachedSplit.getitem (thread-safe: no shared
            # parent state is mutated)
            self._epoch_preprocessor = ImagePreprocessor(pp)
            logger.info("[scannet] epoch %d resize=%d", epoch, size)



__main_dataset__ = ScanNetDataset
