"""Load cached per-sample features/predictions from HDF5
(reference: gluefactory/models/cache_loader.py:59-144).

Used by phase 2 of every benchmark (scoring cached predictions) and by
training-time feature caching. Rescales keypoints/lines by the view scales
and pads to a fixed slot count when requested."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import h5py
import numpy as np

from ..core.config import Config


def pad_local_features(pred: dict, seq_l: int) -> dict:
    """(reference cache_loader.py:13-41)"""
    from .utils.misc import pad_to_length

    out = dict(pred)
    for vid in ("0", "1", ""):
        kk = f"keypoints{vid}"
        if kk not in pred:
            continue
        n = pred[kk].shape[0]
        out[kk], valid = pad_to_length(pred[kk], seq_l)
        out[f"keypoint_valid{vid}"] = valid
        for key in (f"keypoint_scores{vid}", f"descriptors{vid}", f"scales{vid}",
                    f"oris{vid}", f"depth_keypoints{vid}"):
            if key in pred:
                out[key], _ = pad_to_length(pred[key], seq_l)
    return out


class CacheLoader:
    """Not an nn model here: cached features need no parameters, so this is a
    plain callable keeping the reference's interface."""

    default_conf: ClassVar[dict] = {
        "path": "???",  # can contain {scene}
        "data_keys": None,  # None = all
        "collate": True,
        "scale": ["keypoints", "lines"],
        "padding_length": None,
        "numeric_type": "float32",
    }

    def __init__(self, conf):
        self.conf = Config(self.default_conf).merge(conf or {})
        self._files: dict[str, h5py.File] = {}

    def _file(self, path: str) -> h5py.File:
        if path not in self._files:
            self._files[path] = h5py.File(path, "r")
        return self._files[path]

    def __call__(self, data: dict) -> dict:
        names = data["name"]
        if isinstance(names, str):
            names = [names]
        batch = []
        for i, name in enumerate(names):
            path = str(self.conf.path).format(
                scene=str(name).split("/")[0] if "/" in str(name) else ""
            )
            grp = self._file(path)[str(name)]
            pred = {k: np.asarray(grp[k]) for k in grp.keys()}
            if self.conf.data_keys is not None:
                pred = {k: v for k, v in pred.items() if k in list(self.conf.data_keys)}
            if self.conf.numeric_type:
                pred = {
                    k: v.astype(self.conf.numeric_type) if v.dtype == np.float16 else v
                    for k, v in pred.items()
                }
            # rescale cached full-res coords into the current view resolution
            for vid in ("0", "1"):
                scales = data.get(f"view{vid}", {}).get("scales")
                if scales is None:
                    continue
                s = np.asarray(scales[i] if np.asarray(scales).ndim > 1 else scales)
                for base in list(self.conf.scale):
                    key = f"{base}{vid}"
                    if key in pred:
                        pred[key] = pred[key] * s
            if self.conf.padding_length:
                pred = pad_local_features(pred, int(self.conf.padding_length))
            batch.append(pred)
        if not self.conf.collate or len(batch) == 1:
            return batch[0] if len(batch) == 1 else batch
        from ..datasets.base_dataset import collate

        return collate(batch)

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()
