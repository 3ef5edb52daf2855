"""RDNIM: Rotated Day-Night Image Matching evaluation pairs
(reference: gluefactory/datasets/rdnim.py:21-120).

Expects the RDNIM release on disk: ``<root>/<reference>/`` dirs with
``*_ref.jpg``/``*_query.jpg`` pairs and H text files per pair; layout
follows the published dataset (reference time: 'day'|'night')."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import numpy as np

from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset


class RDNIMDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "rdnim",
        "data_dir": "RDNIM",
        "reference": "day",
        "preprocessing": {"resize": 480, "side": "long", "square_pad": True},
        "test_batch_size": 1,
    }

    def _init(self, conf):
        root = Path(conf.data_dir)
        if not root.is_absolute():
            root = DATA_PATH / conf.data_dir
        ref_dir = root / conf.reference
        if not ref_dir.exists():
            raise FileNotFoundError(f"RDNIM reference dir not found: {ref_dir}")
        self.pairs = []
        for h_file in sorted(ref_dir.glob("**/H_*")):
            stem = h_file.name[2:]
            ref_img = h_file.parent / f"{stem}_ref.jpg"
            q_img = h_file.parent / f"{stem}_query.jpg"
            if ref_img.exists() and q_img.exists():
                self.pairs.append((ref_img, q_img, h_file))
        if not self.pairs:
            raise FileNotFoundError(f"no RDNIM pairs under {ref_dir}")
        self.preprocessor = ImagePreprocessor(conf.preprocessing.to_dict())

    def get_dataset(self, split: str = "test"):
        return self

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, idx: int) -> dict:
        ref_img, q_img, h_file = self.pairs[idx]
        view0 = self.preprocessor(read_image(ref_img))
        view1 = self.preprocessor(read_image(q_img))
        H = np.loadtxt(h_file).astype(np.float32).reshape(3, 3)
        H = view1["transform"] @ H @ np.linalg.inv(view0["transform"])
        return {
            "view0": view0,
            "view1": view1,
            "H_0to1": H.astype(np.float32),
            "idx": np.int32(idx),
            "name": f"{h_file.parent.name}/{h_file.name}",
        }


__main_dataset__ = RDNIMDataset
