"""Single-view dataset with cached pseudo-ground-truth fields — the unified
replacement for the fork's per-source cached-GT datasets
(reference: gluefactory/datasets/{scannet.py:21, minidepth.py:18,
oxford_paris_mini_1view_jpldd.py:18} — all three read an image folder plus
HDF5 caches of homography-adaptation heatmaps and DeepLSD DF/AF fields; here
one configurable dataset covers them, with caches produced by
scripts/generate_gt.py).

Sample: image + any subset of gt_heatmap / gt_distance_field /
gt_angle_field read from the cache file group named like the image's
relative path."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import h5py
import numpy as np

from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .augmentations import augmentations
from .base_dataset import BaseDataset


class CachedGTDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "cached_gt_dataset",
        "images": "???",  # image root dir
        "gt_file": "???",  # hdf5 with per-image groups
        "fields": ["heatmap", "distance_field", "angle_field"],
        "glob": ["*.jpg", "*.png", "*.jpeg", "*.ppm"],
        "preprocessing": {"resize": 320, "side": "long", "square_pad": True},
        "photometric": {"name": "lg", "p": 0.5},
        "val_size": 100,
        "train_batch_size": 4,
        # scene-list splits (reference minidepth.py train/val_scenes_file_path:
        # a txt of top-level scene dirs per split; when set, they override the
        # positional val_size split)
        "train_scenes_file": None,
        "val_scenes_file": None,
        # per-EPOCH multiscale training (reference minidepth.py
        # multiscale_learning:42-46): every epoch resizes the whole split to
        # one scale from scales_list — per-epoch (not per-item, as the torch
        # reference does) so each epoch keeps ONE static shape and XLA
        # reuses one compiled step per scale instead of recompiling per item
        "multiscale": {
            "do": False,
            "scales_list": [480, 400, 320],
            "scale_selection": "round-robin",  # or "random"
        },
        # sparse keypoint GT served from the cache when present (reference
        # minidepth.py load_features.point_gt:50-63): fixed top-k slots +
        # validity mask (static shapes)
        "point_gt": {
            "load_points": False,
            "max_num_keypoints": 76,
        },
    }

    def _init(self, conf):
        root = Path(conf.images)
        if not root.is_absolute():
            root = DATA_PATH / conf.images
        gt_path = Path(conf.gt_file)
        if not gt_path.is_absolute():
            gt_path = DATA_PATH / conf.gt_file
        if not root.exists() or not gt_path.exists():
            raise FileNotFoundError(f"missing {root} or {gt_path}")
        self.root = root
        self.gt_path = gt_path
        with h5py.File(str(gt_path), "r") as f:
            cached = set()
            f.visit(lambda n: cached.add(n) if isinstance(f.get(n), h5py.Group) else None)
        self.paths = sorted(
            p for pat in conf.glob for p in root.glob("**/" + pat)
            if str(p.relative_to(root)) in cached or p.stem in cached
        )
        if not self.paths:
            raise FileNotFoundError("no images with cached GT found")
        self.preprocessor = ImagePreprocessor(conf.preprocessing.to_dict())
        self.photometric = augmentations[conf.photometric.name]()
        self.scene_splits = {
            split: self._read_scenes(conf.get(f"{split}_scenes_file"))
            for split in ("train", "val")
        }

    def _read_scenes(self, scenes_file) -> set | None:
        """Scene names (top-level dirs) from a txt file, one per line
        (reference minidepth.py:77-78 train/val_scenes_file_path)."""
        if not scenes_file:
            return None
        p = Path(scenes_file)
        if not p.is_absolute():
            cand = DATA_PATH / p
            p = cand if cand.exists() else self.root / p
        lines = p.read_text().splitlines()
        return {ln.strip() for ln in lines if ln.strip() and not ln.startswith("#")}

    def get_dataset(self, split: str):
        return _CachedSplit(self, split)


class _CachedSplit:
    def __init__(self, parent: CachedGTDataset, split: str):
        self.parent = parent
        self.conf = parent.conf
        scenes = parent.scene_splits.get(split) if split in ("train", "val") else None
        if scenes is not None:
            self.paths = [
                p for p in parent.paths
                if p.relative_to(parent.root).parts[0] in scenes
            ]
        else:
            n_val = int(self.conf.val_size)
            if split == "val":
                self.paths = parent.paths[:n_val]
            elif split == "train":
                self.paths = parent.paths[n_val:]
            else:
                self.paths = parent.paths
        self.split = split
        self._file = None
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Per-epoch multiscale: pick ONE scale for the whole epoch so the
        jitted train step sees a single static shape per epoch."""
        self._epoch = int(epoch)
        ms = self.conf.multiscale
        if not ms.do or self.split != "train":
            return
        scales = [int(s) for s in ms.scales_list]
        if str(ms.scale_selection) == "random":
            scale = int(np.random.default_rng(epoch).choice(scales))
        else:  # round-robin
            scale = scales[epoch % len(scales)]
        pp_conf = {**self.conf.preprocessing.to_dict(), "resize": scale}
        self._epoch_preprocessor = ImagePreprocessor(pp_conf)

    def __len__(self):
        return len(self.paths)

    def _gt(self, key: str):
        if self._file is None:
            self._file = h5py.File(str(self.parent.gt_path), "r")
        return self._file[key]

    def getitem(self, idx: int, rng: np.random.Generator) -> dict:
        path = self.paths[idx]
        rel = str(path.relative_to(self.parent.root))
        img = read_image(path).astype(np.float32) / 255.0
        if self.split == "train" and rng.uniform() < float(self.conf.photometric.p):
            img = self.parent.photometric(img, rng)
        # per-split override (e.g. scannet multiscale epochs) wins; never
        # mutate the parent's preprocessor — splits are read concurrently
        # by the threaded loader
        pp = getattr(self, "_epoch_preprocessor", None) \
            or self.parent.preprocessor
        view = pp((img * 255).astype(np.uint8))
        grp = self._gt(rel if rel in self._file_keys() else path.stem)
        h, w = view["image"].shape[:2]
        out = {**view, "idx": np.int32(idx), "name": rel}
        import cv2

        for field in self.conf.fields:
            if field not in grp:
                continue
            arr = np.asarray(grp[field], np.float32)
            vw, vh = view["image_size"].astype(int)
            interp = cv2.INTER_NEAREST if field != "heatmap" else cv2.INTER_LINEAR
            arr_r = cv2.resize(arr, (int(vw), int(vh)), interpolation=interp)
            canvas = np.zeros((h, w), np.float32)
            canvas[: arr_r.shape[0], : arr_r.shape[1]] = arr_r
            out[f"gt_{field}"] = canvas
        pg = self.conf.point_gt
        if pg.load_points and "keypoints" in grp:
            kp = np.asarray(grp["keypoints"], np.float32)  # cache-frame px
            sc = (
                np.asarray(grp["keypoint_scores"], np.float32)
                if "keypoint_scores" in grp else np.ones(len(kp), np.float32)
            )
            order = np.argsort(-sc)
            k = int(pg.max_num_keypoints)
            order = order[:k]
            kp, sc = kp[order], sc[order]
            kp = kp * view["scales"][None]  # into the preprocessed frame
            slots_kp = np.zeros((k, 2), np.float32)
            slots_sc = np.zeros((k,), np.float32)
            valid = np.zeros((k,), bool)
            slots_kp[: len(kp)] = kp
            slots_sc[: len(kp)] = sc
            valid[: len(kp)] = True
            out["gt_keypoints"] = slots_kp
            out["gt_keypoint_scores"] = slots_sc
            out["gt_keypoint_valid"] = valid
        return out

    def _file_keys(self):
        if self._file is None:
            self._file = h5py.File(str(self.parent.gt_path), "r")
        return self._file

    def __getitem__(self, idx):
        return self.getitem(idx, np.random.default_rng(idx))


__main_dataset__ = CachedGTDataset
