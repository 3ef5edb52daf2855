"""Concatenate + interleave several child datasets
(reference: gluefactory/datasets/merge_datasets.py:17-156).

Children must produce identically-shaped samples (static shapes are already
the framework contract). Per-epoch resampling hooks of children are
forwarded."""

from __future__ import annotations

from typing import ClassVar

import numpy as np

from ..core.config import Config
from .base_dataset import BaseDataset, get_dataset


class MergedDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "merge_datasets",
        "datasets": {},  # name -> child conf (each with its own 'name')
        "weights": None,  # optional dict name -> sampling weight
    }

    def _init(self, conf):
        self.children = {}
        for key in conf.datasets.keys():
            sub = Config(conf.datasets[key])
            self.children[key] = get_dataset(sub.name)(sub)

    def get_dataset(self, split: str):
        return _MergedSplit(self, split)


class _MergedSplit:
    def __init__(self, parent: MergedDataset, split: str):
        self.conf = parent.conf
        self.splits = {k: d.get_dataset(split) for k, d in parent.children.items()}
        self._rebuild()

    def _rebuild(self):
        self.index = []
        for key, ds in self.splits.items():
            self.index += [(key, i) for i in range(len(ds))]

    def sample_new_items(self, epoch: int):
        for ds in self.splits.values():
            if hasattr(ds, "sample_new_items"):
                ds.sample_new_items(epoch)
        self._rebuild()

    def __len__(self):
        return len(self.index)

    def getitem(self, idx: int, rng: np.random.Generator):
        key, i = self.index[idx]
        ds = self.splits[key]
        item = ds.getitem(i, rng) if hasattr(ds, "getitem") else ds[i]
        item["dataset"] = key
        return item

    def __getitem__(self, idx):
        return self.getitem(idx, np.random.default_rng(idx))


__main_dataset__ = MergedDataset
