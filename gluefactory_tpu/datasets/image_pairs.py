"""Image-pair list dataset for benchmarks
(reference: gluefactory/datasets/image_pairs.py:42-100).

Each line of ``pairs``:
  - ``im0 im1``                                  (no geometry)
  - ``im0 im1 h11 ... h33``                      (9 floats: GT homography)
  - ``im0 im1 K0(9) K1(9) T(16)``                (calibrated pair: intrinsics
    row-major 3x3 each + row-major 4x4 T_0to1) — the megadepth-1500 format.
GT is composed with the per-view resize transforms / camera scaling."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import numpy as np

from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset


def parse_camera(elems: list[str]) -> np.ndarray:
    return np.array([float(x) for x in elems], dtype=np.float32).reshape(3, 3)


class ImagePairsDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "image_pairs",
        "pairs": "???",  # pair list txt
        "root": "",  # image root dir
        "preprocessing": {"resize": 1024, "side": "long", "square_pad": True},
        "grayscale": False,
        "test_batch_size": 1,
        "num_workers": 2,
    }

    def _init(self, conf):
        pairs_path = Path(conf.pairs)
        if not pairs_path.is_absolute():
            pairs_path = DATA_PATH / conf.pairs
        if not pairs_path.exists():
            raise FileNotFoundError(f"Pairs file not found: {pairs_path}")
        self.root = Path(conf.root) if Path(conf.root).is_absolute() else DATA_PATH / conf.root
        self.pairs = [l.split() for l in pairs_path.read_text().splitlines() if l.strip()]
        self.preprocessor = ImagePreprocessor(conf.preprocessing.to_dict())

    def get_dataset(self, split: str = "test"):
        return self

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i: int) -> dict:
        pair = self.pairs[i]
        name0, name1 = pair[:2]
        view0 = self.preprocessor(read_image(self.root / name0, self.conf.grayscale))
        view1 = self.preprocessor(read_image(self.root / name1, self.conf.grayscale))
        data = {
            "view0": view0,
            "view1": view1,
            "idx": np.int32(i),
            # full relative paths, sanitized: stems alone collide when
            # different scene dirs reuse file names (e.g. scene*/0.png)
            "name": "_".join(
                str(Path(n).with_suffix("")).replace("/", "-")
                for n in (name0, name1)
            ),
        }
        rest = pair[2:]
        if len(rest) == 9:
            H = np.array([float(x) for x in rest], np.float32).reshape(3, 3)
            H = view1["transform"] @ H @ np.linalg.inv(view0["transform"])
            data["H_0to1"] = H.astype(np.float32)
        elif len(rest) >= 34:
            K0 = parse_camera(rest[0:9])
            K1 = parse_camera(rest[9:18])
            T = np.array([float(x) for x in rest[18:34]], np.float32).reshape(4, 4)
            cam0 = Camera.from_calibration_matrix(K0, size=view0["orig_size"]).scale(
                view0["scales"]
            )
            cam1 = Camera.from_calibration_matrix(K1, size=view1["orig_size"]).scale(
                view1["scales"]
            )
            data["camera0"] = cam0
            data["camera1"] = cam1
            data["T_0to1"] = Pose.from_4x4mat(T)
        return data


__main_dataset__ = ImagePairsDataset
