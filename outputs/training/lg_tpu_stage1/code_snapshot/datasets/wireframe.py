"""Wireframe dataset: images with GT junctions + line segments
(reference: gluefactory/datasets/wireframe.py:47-160).

Expects the ShanghaiTech Wireframe release preprocessed into npz files:
``<root>/{train,test}/*.npz`` each holding ``image`` (H, W, 3 uint8) or a
sibling image file, ``junctions`` (J, 2), ``lines`` (L, 2) junction-index
pairs. Static shapes via max_junctions/max_lines + validity masks."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import numpy as np

from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor
from .base_dataset import BaseDataset


class WireframeDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "wireframe",
        "data_dir": "wireframe",
        "max_junctions": 512,
        "max_lines": 512,
        "preprocessing": {"resize": 512, "side": "long", "square_pad": True},
        "train_batch_size": 4,
    }

    def _init(self, conf):
        root = Path(conf.data_dir)
        if not root.is_absolute():
            root = DATA_PATH / conf.data_dir
        if not root.exists():
            raise FileNotFoundError(f"wireframe data not found at {root}")
        self.root = root
        self.preprocessor = ImagePreprocessor(conf.preprocessing.to_dict())

    def get_dataset(self, split: str):
        split_dir = self.root / ("test" if split in ("test", "val") else "train")
        files = sorted(split_dir.glob("*.npz"))
        if not files:
            raise FileNotFoundError(f"no npz files under {split_dir}")
        return _WireframeSplit(self, files)


class _WireframeSplit:
    def __init__(self, parent: WireframeDataset, files):
        self.parent = parent
        self.conf = parent.conf
        self.files = files

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        conf = self.conf
        blob = np.load(self.files[idx], allow_pickle=True)
        image = blob["image"]
        if image.dtype != np.uint8:
            image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        view = self.parent.preprocessor(image)
        junctions = blob["junctions"].astype(np.float32) * view["scales"]
        line_idx = blob["lines"].astype(np.int64)
        segments = junctions[line_idx]  # (L, 2, 2)
        J, L = int(conf.max_junctions), int(conf.max_lines)
        out_j = np.zeros((J, 2), np.float32)
        jv = np.zeros((J,), bool)
        nj = min(len(junctions), J)
        out_j[:nj], jv[:nj] = junctions[:nj], True
        out_l = np.zeros((L, 2, 2), np.float32)
        lv = np.zeros((L,), bool)
        nl = min(len(segments), L)
        out_l[:nl], lv[:nl] = segments[:nl], True
        return {
            **view,
            "gt_junctions": out_j,
            "gt_junction_valid": jv,
            "gt_segments": out_l,
            "gt_segment_valid": lv,
            "idx": np.int32(idx),
            "name": self.files[idx].stem,
        }


__main_dataset__ = WireframeDataset
