"""HPatches sequences benchmark dataset
(reference: gluefactory/datasets/hpatches.py:37-146).

Layout on disk: ``<root>/<seq>/{1..6}.ppm`` + ``H_1_{2..6}`` GT homography
text files; 5 pairs per sequence (ref image 1 vs 2..6). The 8 oversized
sequences the reference ignores (hpatches.py:47-56) are skipped too. The GT
homography is composed with both views' resize transforms so it maps between
the preprocessed (static-canvas) coordinates."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import numpy as np

from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset

IGNORED_SCENES = (
    "i_contruction", "i_crownnight", "i_dc", "i_pencils", "i_whitebuilding",
    "v_artisans", "v_astronautis", "v_talent",
)


class HPatchesDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "hpatches",
        "data_dir": "hpatches-sequences-release",
        "preprocessing": {"resize": 480, "side": "long", "square_pad": True},
        "subset": None,  # 'i' | 'v' | None
        "max_seqs": None,  # cap sequence count (cheap in-train benchmarks)
        "ignore_large_images": True,
        "grayscale": False,
        "test_batch_size": 1,
        "num_workers": 2,
    }

    def _init(self, conf):
        root = Path(conf.data_dir)
        if not root.is_absolute():
            root = DATA_PATH / conf.data_dir
        self.root = root
        if not root.exists():
            raise FileNotFoundError(
                f"HPatches not found at {root} (no auto-download in this "
                "zero-egress build; place hpatches-sequences-release there)"
            )
        sequences = sorted(p.name for p in root.iterdir() if p.is_dir())
        if conf.ignore_large_images:
            sequences = [s for s in sequences if s not in IGNORED_SCENES]
        if conf.subset:
            sequences = [s for s in sequences if s.startswith(conf.subset)]
        if conf.max_seqs:
            sequences = sequences[: int(conf.max_seqs)]
        self.sequences = sequences
        self.items = [(seq, i) for seq in sequences for i in range(2, 7)]
        self.preprocessor = ImagePreprocessor(conf.preprocessing.to_dict())

    def get_dataset(self, split: str = "test"):
        return self

    def __len__(self):
        return len(self.items)

    def _read_view(self, seq: str, idx: int) -> dict:
        img = read_image(self.root / seq / f"{idx}.ppm", grayscale=self.conf.grayscale)
        return self.preprocessor(img)

    def __getitem__(self, i: int) -> dict:
        seq, idx = self.items[i]
        view0 = self._read_view(seq, 1)
        view1 = self._read_view(seq, idx)
        H = np.loadtxt(self.root / seq / f"H_1_{idx}").astype(np.float32)
        # compose with resize transforms: canvas1 <- orig1 <- orig0 <- canvas0
        H = view1["transform"] @ H @ np.linalg.inv(view0["transform"])
        return {
            "view0": view0,
            "view1": view1,
            "H_0to1": H.astype(np.float32),
            "idx": np.int32(i),
            "name": f"{seq}/{idx}",
        }


__main_dataset__ = HPatchesDataset
