"""Homography-warped DeepLSD training pairs with LSD-derived field targets
(reference: gluefactory/datasets/homographies_deeplsd.py — homography
sampling + warping utilities feeding DeepLSD's homography-adaptation
self-distillation; the reference warps PRECOMPUTED DeepLSD fields, this
dataset computes exact targets from classical LSD segments instead, so it
needs no teacher network and works on arbitrary image folders).

Per item: a base image (from ``data_dir``, or a rendered structured scene
when no folder is given), a sampled homography warp of it, and — for BOTH
views — the distance field (distance to the nearest LSD segment, via
``cv2.distanceTransform``) and angle field (orientation of the nearest
segment, mod pi) recomputed EXACTLY on each view's own LSD detections
(no field-warping approximation). Supervises ``lines.deeplsd``'s
``gt_distance_field`` / ``gt_angle_field`` loss keys directly.
"""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import cv2
import numpy as np

from ..geometry.homography import sample_homography_corners
from ..settings import DATA_PATH
from .base_dataset import BaseDataset


def lsd_segments(img8: np.ndarray, max_lines: int = 512) -> np.ndarray:
    """cv2 LSD detections (L, 2, 2) in (x, y) pixels."""
    lsd = cv2.createLineSegmentDetector()
    out = lsd.detect(img8)[0]
    if out is None or len(out) == 0:
        return np.zeros((0, 2, 2), np.float32)
    segs = out.reshape(-1, 2, 2).astype(np.float32)
    length = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
    return segs[np.argsort(-length)][:max_lines]


def fields_from_segments(segs: np.ndarray, shape: tuple[int, int]):
    """Exact DF/AF rasterization: DF = L2 distance transform of the drawn
    segment mask; AF = orientation (mod pi) of the nearest drawn pixel's
    segment, propagated by the labelled distance transform."""
    h, w = shape
    mask = np.zeros((h, w), np.uint8)
    angle_img = np.zeros((h, w), np.float32)
    for (p0, p1) in segs:
        a = float(np.arctan2(p1[1] - p0[1], p1[0] - p0[0])) % np.pi
        seg_mask = np.zeros((h, w), np.uint8)
        cv2.line(seg_mask, tuple(np.round(p0).astype(int)),
                 tuple(np.round(p1).astype(int)), 1, 1)
        angle_img[seg_mask > 0] = a
        mask |= seg_mask
    if not mask.any():
        return (np.full((h, w), np.hypot(h, w), np.float32),
                np.zeros((h, w), np.float32))
    df, labels = cv2.distanceTransformWithLabels(
        (1 - mask).astype(np.uint8), cv2.DIST_L2, 5,
        labelType=cv2.DIST_LABEL_PIXEL)
    # labels are 1-based ids of the nearest zero (on-segment) pixel; build a
    # lut from label id -> that pixel's segment angle
    on = mask > 0
    lut = np.zeros(int(labels.max()) + 1, np.float32)
    lut[labels[on]] = angle_img[on]
    af = lut[labels]
    return df.astype(np.float32), af.astype(np.float32)


class HomographiesDeepLSDDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "homographies_deeplsd",
        "data_dir": None,  # image folder; None = rendered structured scenes
        "image_size": 320,
        "train_size": 800,
        "val_size": 16,
        "max_lines": 512,
        "homography": {"difficulty": 0.6, "translation": 0.3, "max_angle": 35.0},
        "warped_pair": True,  # emit view0 (base) + view1 (warp) + H_0to1
        "train_batch_size": 8,
        "val_batch_size": 8,
        "num_workers": 2,
        "seed": 29,
    }

    def _init(self, conf):
        self.images = None
        if conf.data_dir:
            root = Path(conf.data_dir)
            if not root.is_absolute():
                root = DATA_PATH / conf.data_dir
            self.images = sorted(
                p for p in root.rglob("*")
                if p.suffix.lower() in {".jpg", ".jpeg", ".png", ".ppm"})
            if not self.images:
                raise FileNotFoundError(f"no images under {root}")

    def get_dataset(self, split: str):
        return _Split(self, split)


class _Split:
    def __init__(self, parent: HomographiesDeepLSDDataset, split: str):
        self.conf = parent.conf
        self.images = parent.images
        self.split = split

    def __len__(self):
        return int(self.conf.train_size if self.split == "train"
                   else self.conf.val_size)

    def getitem(self, idx: int, rng: np.random.Generator | None = None):
        conf = self.conf
        rng = rng or np.random.default_rng(
            int(conf.seed) + idx + (10_000_000 if self.split == "val" else 0))
        s = int(conf.image_size)
        if self.images is not None:
            img8 = cv2.imread(str(self.images[idx % len(self.images)]),
                              cv2.IMREAD_GRAYSCALE)
            # random crop/resize to the static training size
            if min(img8.shape[:2]) < s:
                img8 = cv2.resize(img8, (max(s, img8.shape[1]),
                                         max(s, img8.shape[0])))
            y = rng.integers(0, img8.shape[0] - s + 1)
            x = rng.integers(0, img8.shape[1] - s + 1)
            img8 = img8[y:y + s, x:x + s]
        else:
            from .homographies_ondevice import generate_structured_scene

            img, _pts, _valid = generate_structured_scene(rng, (s, s),
                                                          max_points=4)
            img8 = np.clip(img[..., 0] * 255, 0, 255).astype(np.uint8)

        H, _ = sample_homography_corners(
            (s, s), (s, s),
            difficulty=float(conf.homography.difficulty),
            translation=float(conf.homography.translation),
            max_angle=float(conf.homography.max_angle),
            rng=rng,
        )
        warped8 = cv2.warpPerspective(img8, H, (s, s), flags=cv2.INTER_LINEAR)

        def view(im8):
            segs = lsd_segments(im8, int(conf.max_lines))
            df, af = fields_from_segments(segs, im8.shape[:2])
            return {
                "image": (im8.astype(np.float32) / 255.0)[..., None].repeat(3, -1),
                "image_size": np.array([im8.shape[1], im8.shape[0]], np.float32),
                "gt_distance_field": df,
                "gt_angle_field": af,
            }

        item = {"view0": view(img8), "H_0to1": H.astype(np.float32)}
        if conf.warped_pair:
            item["view1"] = view(warped8)
        else:
            item.update(item.pop("view0"))
        return item

    def __getitem__(self, idx):
        return self.getitem(idx)


__main_dataset__ = HomographiesDeepLSDDataset
