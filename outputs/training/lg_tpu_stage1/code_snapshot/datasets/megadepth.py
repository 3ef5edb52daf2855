"""MegaDepth dataset: stage-2 matcher training + pose-eval pairs
(reference: gluefactory/datasets/megadepth.py:36-462).

Scene metadata comes from per-scene ``scene_info/<scene>.npz`` archives with
fields (reference megadepth.py:118-158):
  image_paths, depth_paths (relative to the dataset root),
  intrinsics (N, 3, 3), poses (N, 4, 4) world->cam, overlap_matrix (N, N).

Pairs are resampled every epoch from overlap bins
(``[min_overlap, max_overlap]``, reference sample_new_items,
megadepth.py:160-249) through the loader's ``set_epoch`` hook. Depth maps are
read from HDF5, resized (nearest) onto the same static canvas as the image,
and cameras are scaled by the preprocessing transform. All outputs are
static-shape; ``Camera``/``Pose`` ride the batch as dataclass pytrees."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import cv2
import h5py
import numpy as np

from .. import logger
from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .augmentations import augmentations
from .base_dataset import BaseDataset


class MegaDepthDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "megadepth",
        "data_dir": "megadepth",
        "info_dir": "scene_info",
        "train_split": "train_scenes_clean.txt",
        "val_split": "valid_scenes_clean.txt",
        "train_num_per_scene": 500,
        "val_num_per_scene": 25,
        "min_overlap": 0.3,
        "max_overlap": 1.0,
        "sort_by_overlap": False,
        "read_depth": True,
        "preprocessing": {"resize": 1024, "side": "long", "square_pad": True},
        "photometric": {"name": "identity", "p": 0.0},
        "train_batch_size": 4,
        "val_batch_size": 2,
        "num_workers": 4,
    }

    def _init(self, conf):
        self.root = Path(conf.data_dir)
        if not self.root.is_absolute():
            self.root = DATA_PATH / conf.data_dir
        if not self.root.exists():
            raise FileNotFoundError(
                f"MegaDepth not found at {self.root} (zero-egress build: place "
                "the undistorted images + scene_info there)"
            )

    def get_dataset(self, split: str):
        return _PairDataset(self.conf, self.root, split)


class _PairDataset:
    def __init__(self, conf, root: Path, split: str):
        self.conf = conf
        self.root = root
        self.split = split
        split_file = conf.train_split if split == "train" else conf.val_split
        split_path = root / "scene_lists" / split_file
        if split_path.exists():
            scenes = [s for s in split_path.read_text().splitlines() if s.strip()]
        else:
            scenes = sorted(
                p.stem for p in (root / conf.info_dir).glob("*.npz")
            )
        self.scenes = []
        self.scene_data = {}
        for scene in scenes:
            info = root / conf.info_dir / f"{scene}.npz"
            if not info.exists():
                continue
            self.scenes.append(scene)
        if not self.scenes:
            raise FileNotFoundError(f"No scene_info npz files under {root / conf.info_dir}")
        self.preprocessor = ImagePreprocessor(conf.preprocessing.to_dict())
        self.photometric = augmentations[conf.photometric.name]()
        self.items: list = []
        self.sample_new_items(0)

    def _load_scene(self, scene: str) -> dict:
        if scene not in self.scene_data:
            info = np.load(
                self.root / self.conf.info_dir / f"{scene}.npz", allow_pickle=True
            )
            self.scene_data[scene] = {
                "image_paths": info["image_paths"],
                "depth_paths": info["depth_paths"],
                "intrinsics": info["intrinsics"],
                "poses": info["poses"],
                "overlap_matrix": info["overlap_matrix"],
            }
        return self.scene_data[scene]

    def sample_new_items(self, epoch: int):
        """Overlap-binned pair sampling per epoch
        (reference megadepth.py:160-249)."""
        conf = self.conf
        num = int(
            conf.train_num_per_scene if self.split == "train" else conf.val_num_per_scene
        )
        rng = np.random.default_rng((int(conf.seed), epoch))
        items = []
        for scene in self.scenes:
            data = self._load_scene(scene)
            mat = np.asarray(data["overlap_matrix"])
            good = (mat > float(conf.min_overlap)) & (mat <= float(conf.max_overlap))
            pairs = np.stack(np.nonzero(good), axis=-1)
            valid_img = np.array(
                [p is not None and str(p) != "None" for p in data["image_paths"]]
            )
            valid_d = np.array(
                [p is not None and str(p) != "None" for p in data["depth_paths"]]
            )
            ok = valid_img & (valid_d if conf.read_depth else True)
            pairs = pairs[ok[pairs[:, 0]] & ok[pairs[:, 1]]]
            if len(pairs) == 0:
                continue
            sel = rng.choice(len(pairs), size=min(num, len(pairs)), replace=False)
            for i, j in pairs[sel]:
                items.append((scene, int(i), int(j), float(mat[i, j])))
        if self.split == "train":
            rng.shuffle(items)
        self.items = items
        logger.info("[megadepth/%s] sampled %d pairs (epoch %d)", self.split, len(items), epoch)

    def __len__(self):
        return len(self.items)

    def _read_view(self, scene_data: dict, idx: int, rng) -> dict:
        conf = self.conf
        img_path = self.root / str(scene_data["image_paths"][idx])
        img = read_image(img_path)
        img = img.astype(np.float32) / 255.0
        if rng is not None and rng.uniform() < float(conf.photometric.p):
            img = self.photometric(img, rng)
        view = self.preprocessor((img * 255).astype(np.uint8))
        K = np.asarray(scene_data["intrinsics"][idx], np.float32)
        camera = Camera.from_calibration_matrix(K, size=view["orig_size"]).scale(
            view["scales"]
        )
        view["camera"] = camera
        if conf.read_depth:
            dpath = self.root / str(scene_data["depth_paths"][idx])
            with h5py.File(str(dpath), "r") as f:
                depth = np.asarray(f["depth"], np.float32)
            h, w = view["image"].shape[:2]
            vw, vh = view["image_size"].astype(int)
            depth_r = cv2.resize(depth, (int(vw), int(vh)), interpolation=cv2.INTER_NEAREST)
            canvas = np.zeros((h, w), np.float32)
            canvas[: depth_r.shape[0], : depth_r.shape[1]] = depth_r
            view["depth"] = canvas
        return view

    def getitem(self, idx: int, rng: np.random.Generator) -> dict:
        scene, i, j, overlap = self.items[idx]
        data = self._load_scene(scene)
        view0 = self._read_view(data, i, rng if self.split == "train" else None)
        view1 = self._read_view(data, j, rng if self.split == "train" else None)
        T0 = Pose.from_4x4mat(np.asarray(data["poses"][i], np.float32))
        T1 = Pose.from_4x4mat(np.asarray(data["poses"][j], np.float32))
        T_0to1 = T1.compose(T0.inv())
        return {
            "view0": view0,
            "view1": view1,
            "T_0to1": T_0to1,
            "overlap": np.float32(overlap),
            "idx": np.int32(idx),
            "name": f"{scene}/{i}_{j}",
            "scene": scene,
        }

    def __getitem__(self, idx: int):
        return self.getitem(idx, np.random.default_rng(idx))


__main_dataset__ = MegaDepthDataset
