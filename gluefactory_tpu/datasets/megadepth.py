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
        "num_overlap_bins": 1,  # >1: balance sampled pairs across overlap
        # bins (reference megadepth.py:211-236)
        "sort_by_overlap": False,  # curriculum: serve easy (high-overlap)
        # pairs first within an epoch (reference megadepth.py:249-252)
        "views": 2,  # 3 -> triplets for TripletPipeline (reference :366-462)
        "triplet_enforce_overlap": False,
        "read_depth": True,
        "load_features": {
            "do": False,  # serve cached per-image features (CacheLoader path,
            # reference megadepth.py:252-286 + scripts/export_megadepth.py)
            "path": "exports/megadepth/{scene}.h5",
            "padding_length": 1024,
        },
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
        cls = _TripletDataset if int(self.conf.views) == 3 else _PairDataset
        return cls(self.conf, self.root, split)


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
                "scene": scene,
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
            pair_ok = ok[pairs[:, 0]] & ok[pairs[:, 1]]
            num_bins = int(conf.num_overlap_bins)
            if num_bins > 1:
                # balance across overlap bins; skip starved bins and
                # redistribute their budget (reference megadepth.py:211-236)
                lo, hi = float(conf.min_overlap), float(conf.max_overlap)
                width = (hi - lo) / num_bins
                ov = mat[pairs[:, 0], pairs[:, 1]]
                bins = [
                    pairs[pair_ok & (ov > lo + k * width) & (ov <= lo + (k + 1) * width)]
                    for k in range(num_bins)
                ]
                enough = [len(bk) >= max(num // num_bins, 1) * 2 for bk in bins]
                if not any(enough):  # tiny scenes: keep every non-empty bin
                    enough = [len(bk) > 0 for bk in bins]
                per_bin = num // max(1, sum(enough))
                sel_pairs = [
                    bk[rng.choice(len(bk), size=min(per_bin, len(bk)), replace=False)]
                    for bk, keep in zip(bins, enough) if keep and len(bk)
                ]
                pairs = (
                    np.concatenate(sel_pairs, 0) if sel_pairs else pairs[:0]
                )
            else:
                pairs = pairs[pair_ok]
                if len(pairs) > num:
                    pairs = pairs[rng.choice(len(pairs), size=num, replace=False)]
            for i, j in pairs:
                items.append((scene, int(i), int(j), float(mat[i, j])))
        if conf.sort_by_overlap:
            items.sort(key=lambda it: it[-1], reverse=True)
        elif self.split == "train":
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
        if conf.load_features.do:
            self._load_cached_features(scene_data, idx, view)
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

    def _load_cached_features(self, scene_data: dict, idx: int, view: dict):
        """Serve exported per-image features, rescaled into the preprocessed
        view frame and padded to a static length (reference
        megadepth.py:252-286; cache written by scripts/export_features.py)."""
        import h5py as _h5py

        from ..models.utils.misc import pad_to_length

        conf = self.conf.load_features
        scene = scene_data["scene"]
        cache = getattr(self, "_feat_files", None)
        if cache is None:
            cache = self._feat_files = {}
        if scene not in cache:
            path = Path(str(conf.path).format(scene=scene))
            if not path.is_absolute():
                path = DATA_PATH / path
            cache[scene] = _h5py.File(str(path), "r")
        f = cache[scene]
        rel = str(scene_data["image_paths"][idx])
        grp = f[rel] if rel in f else f[Path(rel).stem]
        kpts = np.asarray(grp["keypoints"], np.float32)
        desc = np.asarray(grp["descriptors"]).astype(np.float32)
        scores = np.asarray(grp["keypoint_scores"], np.float32)
        kpts = kpts * view["scales"]  # original -> preprocessed frame
        L = int(conf.padding_length)
        kpts, valid = pad_to_length(kpts, L)
        desc, _ = pad_to_length(desc, L)
        scores, _ = pad_to_length(scores, L)
        view["cache"] = {
            "keypoints": kpts,
            "descriptors": desc,
            "keypoint_scores": scores,
            "keypoint_valid": valid,
        }

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


class _TripletDataset(_PairDataset):
    """3-view items for TripletPipeline (reference megadepth.py:366-462):
    per anchor k, sample co-visible (i, j); optionally require i-j overlap."""

    def sample_new_items(self, epoch: int):
        conf = self.conf
        num = int(
            conf.train_num_per_scene if self.split == "train" else conf.val_num_per_scene
        )
        rng = np.random.default_rng((int(conf.seed), epoch, 3))
        items = []
        for scene in self.scenes:
            data = self._load_scene(scene)
            mat = np.asarray(data["overlap_matrix"])
            good = (mat > float(conf.min_overlap)) & (mat <= float(conf.max_overlap))
            valid_img = np.array(
                [p is not None and str(p) != "None" for p in data["image_paths"]]
            )
            valid_d = np.array(
                [p is not None and str(p) != "None" for p in data["depth_paths"]]
            )
            ok = valid_img & (valid_d if conf.read_depth else True)
            good = good & ok[:, None] & ok[None, :]
            rows = np.where(good.sum(-1) > 1)[0]
            if len(rows) == 0:
                continue
            # sample anchors and covisible pairs directly (the reference
            # recipe) instead of materializing every (k, i, j) — a dense
            # scene has O(deg^2) triplets per anchor and enumerating them
            # all stalls every epoch start
            seen = set()
            attempts = 0
            while len(seen) < num and attempts < 20 * num:
                attempts += 1
                k = int(rng.choice(rows))
                js = np.where(good[k])[0]
                if len(js) < 2:
                    continue
                i, j = (int(x) for x in rng.choice(js, 2, replace=False))
                if conf.triplet_enforce_overlap and not good[i, j]:
                    continue
                key = (k, min(i, j), max(i, j))
                if key in seen:
                    continue
                seen.add(key)
                items.append(
                    (scene, k, i, j,
                     float(mat[k, i]), float(mat[k, j]), float(mat[i, j]))
                )
        rng.shuffle(items)
        self.items = items
        logger.info(
            "[megadepth/%s] sampled %d triplets (epoch %d)",
            self.split, len(items), epoch,
        )

    def getitem(self, idx: int, rng: np.random.Generator) -> dict:
        scene, k, i, j, ov01, ov02, ov12 = self.items[idx]
        data = self._load_scene(scene)
        r = rng if self.split == "train" else None
        view0 = self._read_view(data, k, r)
        view1 = self._read_view(data, i, r)
        view2 = self._read_view(data, j, r)
        T0 = Pose.from_4x4mat(np.asarray(data["poses"][k], np.float32))
        T1 = Pose.from_4x4mat(np.asarray(data["poses"][i], np.float32))
        T2 = Pose.from_4x4mat(np.asarray(data["poses"][j], np.float32))
        return {
            "view0": view0, "view1": view1, "view2": view2,
            "T_0to1": T1.compose(T0.inv()),
            "T_0to2": T2.compose(T0.inv()),
            "T_1to2": T2.compose(T1.inv()),
            "overlap_0to1": np.float32(ov01),
            "overlap_0to2": np.float32(ov02),
            "overlap_1to2": np.float32(ov12),
            "idx": np.int32(idx),
            "name": f"{scene}/{k}_{i}_{j}",
            "scene": scene,
        }


__main_dataset__ = MegaDepthDataset
