"""Stage-1 training dataset: synthetic homography pairs of single images
(reference: gluefactory/datasets/homographies.py:47-311).

Each sample warps one source image with two independent random homographies
(``right_only`` keeps view0 unwarped) and composes ``H_0to1``; photometric
augmentation is applied per view. All outputs land on a static
``(image_size, image_size)`` canvas so batches compile once on TPU.

Image sources:
  - a directory of images (reference uses revisitop1m; any folder works),
  - ``synthetic: true`` — procedurally generated structured images (random
    polygons/ellipses/lines/gradients), which makes training, tests, and
    benchmarks runnable with zero downloads (this build has no network
    egress; the reference auto-downloads 100 tars, homographies.py:130-148).
"""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import cv2
import numpy as np

from ..geometry.homography import sample_homography_corners
from ..settings import DATA_PATH
from .augmentations import augmentations
from .base_dataset import BaseDataset


def generate_structured_image(rng: np.random.Generator, size=(800, 600)) -> np.ndarray:
    """Procedural image with corners/edges/texture for detector training."""
    w, h = size
    # background gradient
    gx = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    gy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    a, b, c = rng.uniform(0.1, 0.9, 3)
    img = (a * gx + b * gy + c) / (a + b + c + 1e-8)
    img = np.repeat(img[..., None], 3, axis=2)
    img *= rng.uniform(0.4, 1.0, size=(1, 1, 3)).astype(np.float32)
    img = np.ascontiguousarray(img)
    n_shapes = int(rng.integers(10, 30))
    for _ in range(n_shapes):
        color = tuple(float(x) for x in rng.uniform(0, 1, 3))
        kind = rng.integers(0, 4)
        if kind == 0:  # polygon
            n_pts = int(rng.integers(3, 7))
            cx, cy = rng.uniform(0, w), rng.uniform(0, h)
            r = rng.uniform(10, min(w, h) / 4)
            ang = rng.uniform(0, 2 * np.pi, n_pts)
            ang.sort()
            pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], -1).astype(np.int32)
            cv2.fillPoly(img, [pts], color)
        elif kind == 1:  # rectangle
            x0, y0 = rng.uniform(0, w - 20), rng.uniform(0, h - 20)
            x1, y1 = x0 + rng.uniform(10, w / 3), y0 + rng.uniform(10, h / 3)
            cv2.rectangle(img, (int(x0), int(y0)), (int(x1), int(y1)), color, -1)
        elif kind == 2:  # ellipse
            cv2.ellipse(
                img,
                (int(rng.uniform(0, w)), int(rng.uniform(0, h))),
                (int(rng.uniform(5, w / 6)), int(rng.uniform(5, h / 6))),
                float(rng.uniform(0, 180)), 0, 360, color, -1,
            )
        else:  # line
            p0 = (int(rng.uniform(0, w)), int(rng.uniform(0, h)))
            p1 = (int(rng.uniform(0, w)), int(rng.uniform(0, h)))
            cv2.line(img, p0, p1, color, int(rng.integers(1, 5)))
    # mild texture noise so descriptors have signal everywhere
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


class HomographyDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "homographies",
        "data_dir": "revisitop1m",
        "image_list": None,  # txt file with relative paths
        "glob": ["*.jpg", "*.png", "*.jpeg"],
        "synthetic": False,
        "synthetic_size": 20000,
        "synthetic_source_size": [800, 600],
        "source_cache_size": 2048,  # in-memory source-image cache (per worker)
        "train_size": 100000,
        "val_size": 500,
        "image_size": 320,  # static square canvas per view
        "right_only": False,  # keep view0 unwarped (reference homographies.py:61)
        "homography": {
            "difficulty": 0.7,
            "translation": 0.3,
            "max_angle": 45.0,
            "n_angles": 10,
        },
        "photometric": {"name": "lg", "p": 0.95},
        "grayscale": False,
        "load_features": {
            "do": False,  # read cached per-image features and warp them
            "path": "",  # h5 file (scripts/export_features.py output)
            "padding_length": 512,
            "min_inside": 8,  # min keypoints landing inside both views
        },
    }

    def _init(self, conf):
        if not conf.synthetic:
            root = Path(conf.data_dir)
            if not root.is_absolute():
                root = DATA_PATH / conf.data_dir
            if conf.image_list:
                names = Path(conf.image_list).read_text().splitlines()
                self.image_paths = [root / n for n in names if n.strip()]
            else:
                self.image_paths = sorted(
                    p for pat in conf.glob for p in root.glob("**/" + pat)
                )
            if len(self.image_paths) == 0:
                raise FileNotFoundError(
                    f"No images found under {root}; set data.synthetic=true to "
                    "train without downloads"
                )
        else:
            self.image_paths = None
        self.photometric = augmentations[conf.photometric.name]()

    def get_dataset(self, split: str):
        return _HomographySplit(self, split)


class _HomographySplit:
    def __init__(self, parent: HomographyDataset, split: str):
        self.conf = parent.conf
        self.parent = parent
        self.split = split
        self._cache: dict = {}  # idx -> source image (procedural generation
        # and JPEG decode dominate the step time otherwise)
        self._cache_cap = int(self.conf.get("source_cache_size", 2048))

    def __len__(self):
        conf = self.conf
        if conf.synthetic:
            n = int(conf.synthetic_size)
        else:
            n = len(self.parent.image_paths)
        return min(n, int(conf.val_size if self.split == "val" else conf.train_size))

    def _source_image(self, idx: int, rng: np.random.Generator) -> np.ndarray:
        cached = self._cache.get(idx)
        if cached is not None:
            return cached
        img = self._load_source_image(idx)
        if len(self._cache) < self._cache_cap:
            self._cache[idx] = img
        return img

    def _load_source_image(self, idx: int) -> np.ndarray:
        conf = self.conf
        if conf.synthetic:
            # val uses a disjoint seed stream from train
            seed_salt = 7919 if self.split == "val" else 0
            g = np.random.default_rng((int(conf.seed), idx + seed_salt))
            return generate_structured_image(g, tuple(conf.synthetic_source_size))
        from ..utils.image import read_image

        path = self.parent.image_paths[idx]
        img = read_image(path)
        return img.astype(np.float32) / 255.0

    def _warp_view(self, image: np.ndarray, rng, identity: bool = False):
        conf = self.conf
        s = int(conf.image_size)
        h, w = image.shape[:2]
        if identity:
            H = np.array(
                [[s / w, 0, 0], [0, s / h, 0], [0, 0, 1]], dtype=np.float32
            )  # plain resize to canvas
        else:
            H, _ = sample_homography_corners(
                (w, h),
                (s, s),
                difficulty=float(conf.homography.difficulty),
                translation=float(conf.homography.translation),
                max_angle=float(conf.homography.max_angle),
                n_angles=int(conf.homography.n_angles),
                rng=rng,
            )
        warped = cv2.warpPerspective(image, H, (s, s), flags=cv2.INTER_LINEAR)
        if warped.ndim == 2:
            warped = warped[..., None]
        if rng.uniform() < float(conf.photometric.p):
            warped = self.parent.photometric(warped, rng)
        if conf.grayscale and warped.shape[2] == 3:
            warped = warped.mean(axis=2, keepdims=True)
        view = {
            "image": warped.astype(np.float32),
            "image_size": np.array([s, s], dtype=np.float32),
            "H_": H.astype(np.float32),
        }
        return view

    def _load_cached_features(self, name: str, view: dict, H: np.ndarray):
        """Warp cached source-image features into this view
        (reference homographies.py:_transform_keypoints:175). Fills
        view['cache'] consumed by TwoViewPipeline(allow_no_extract=True)."""
        import h5py

        from ..geometry.homography import warp_points_np
        from ..models.utils.misc import pad_to_length

        conf = self.conf.load_features
        if getattr(self, "_feat_file", None) is None:
            self._feat_file = h5py.File(str(conf.path), "r")
        grp = self._feat_file[name]
        kpts = np.asarray(grp["keypoints"], np.float32)
        desc = np.asarray(grp["descriptors"]).astype(np.float32)
        scores = np.asarray(grp["keypoint_scores"], np.float32)
        warped = warp_points_np(kpts, H)
        s = int(self.conf.image_size)
        inside = (warped >= 0).all(-1) & (warped <= s - 1).all(-1)
        order = np.argsort(~inside)  # inside first, stable
        L = int(conf.padding_length)
        warped, valid_in = pad_to_length(warped[order], L)
        desc, _ = pad_to_length(desc[order], L)
        scores, _ = pad_to_length(scores[order], L)
        valid = valid_in & np.concatenate(
            [inside[order], np.zeros(max(0, L - len(order)), bool)]
        )[:L]
        view["cache"] = {
            "keypoints": warped.astype(np.float32),
            "descriptors": desc,
            "keypoint_scores": scores,
            "keypoint_valid": valid,
        }

    def getitem(self, idx: int, rng: np.random.Generator) -> dict:
        image = self._source_image(idx, rng)
        view0 = self._warp_view(image, rng, identity=bool(self.conf.right_only))
        view1 = self._warp_view(image, rng)
        H0 = view0.pop("H_")
        H1 = view1.pop("H_")
        H_0to1 = (H1 @ np.linalg.inv(H0)).astype(np.float32)
        name = f"synthetic/{idx}" if self.conf.synthetic else str(
            self.parent.image_paths[idx].name if self.parent.image_paths else idx
        )
        if self.conf.load_features.do:
            self._load_cached_features(name, view0, H0)
            self._load_cached_features(name, view1, H1)
        return {
            "view0": view0,
            "view1": view1,
            "H_0to1": H_0to1,
            "idx": np.int32(idx),
            "name": name,
        }

    def __getitem__(self, idx: int) -> dict:
        return self.getitem(idx, np.random.default_rng(idx))


__main_dataset__ = HomographyDataset
