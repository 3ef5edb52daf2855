"""Inference over a folder of images (reference: gluefactory/datasets/image_folder.py:15-59)."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset


class ImageFolderDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "image_folder",
        "images": "???",  # directory or txt list of paths
        "root_folder": "/",
        "glob": ["*.jpg", "*.png", "*.jpeg", "*.ppm"],
        "preprocessing": {"resize": 1024, "side": "long", "square_pad": True},
        "grayscale": False,
        "test_batch_size": 1,
    }

    def _init(self, conf):
        src = Path(conf.images)
        if not src.is_absolute():
            src = DATA_PATH / conf.images
        if src.is_dir():
            self.paths = sorted(p for pat in conf.glob for p in src.glob("**/" + pat))
            self.root = src
        elif src.exists():
            root = Path(conf.root_folder)
            self.paths = [root / l for l in src.read_text().splitlines() if l.strip()]
            self.root = root
        else:
            raise FileNotFoundError(f"images source not found: {src}")
        if not self.paths:
            raise FileNotFoundError(f"no images under {src}")
        self.preprocessor = ImagePreprocessor(conf.preprocessing.to_dict())

    def get_dataset(self, split: str = "test"):
        return self

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        path = self.paths[idx]
        view = self.preprocessor(read_image(path, self.conf.grayscale))
        return {**view, "idx": idx, "name": str(path.relative_to(self.root))}


__main_dataset__ = ImageFolderDataset
