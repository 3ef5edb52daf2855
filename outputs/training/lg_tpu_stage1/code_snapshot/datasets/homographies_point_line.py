"""Two-view synthetic dataset with point AND line ground truth — homography
pairs of procedurally drawn scenes whose segments are known analytically
(reference: gluefactory/datasets/homographies_point_line.py:89-509 +
homographies_deeplsd.py, which warp cached line GT; here the lines come from
the synthetic_shapes generator so the warped GT is exact and zero-download).

Each view: warped image + the scene's segments warped by the same H (clipped
to the canvas) + exact DF/AF fields of the warped segments. ``H_0to1``
relates the two views; line GT matches follow from the shared source
segments: line i of view 0 corresponds to line i of view 1 when both are
valid (identity correspondence by construction)."""

from __future__ import annotations

from typing import ClassVar

import cv2
import numpy as np

from ..geometry.homography import sample_homography_corners, warp_points_np
from .augmentations import augmentations
from .base_dataset import BaseDataset
from .synthetic_shapes import draw_scene, exact_df_af


def clip_segments_np(segs: np.ndarray, size: int):
    """Liang-Barsky clip of (L, 2, 2) segments to [0, size-1]^2 (numpy)."""
    p0, p1 = segs[:, 0], segs[:, 1]
    d = p1 - p0
    t0 = np.zeros(len(segs))
    t1 = np.ones(len(segs))
    ok = np.ones(len(segs), bool)
    for p, q in (
        (-d[:, 0], p0[:, 0]), (d[:, 0], size - 1 - p0[:, 0]),
        (-d[:, 1], p0[:, 1]), (d[:, 1], size - 1 - p0[:, 1]),
    ):
        small = np.abs(p) < 1e-9
        r = np.where(small, 0.0, q / np.where(small, 1.0, p))
        t0 = np.where((p < 0), np.maximum(t0, r), t0)
        t1 = np.where((p > 0), np.minimum(t1, r), t1)
        ok &= ~(small & (q < 0))
    ok &= t0 < t1
    out = np.stack([p0 + t0[:, None] * d, p1 - (1 - t1[:, None]) * d], axis=1)
    return out.astype(np.float32), ok


class HomographyPointLineDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "homographies_point_line",
        "image_size": 240,
        "source_size": 320,
        "max_segments": 24,
        "min_seg_length": 10.0,
        "train_size": 10000,
        "val_size": 100,
        "compute_fields": False,  # also emit exact DF/AF per view
        "homography": {"difficulty": 0.6, "translation": 0.3, "max_angle": 30.0},
        "photometric": {"name": "lg", "p": 0.7},
    }

    def _init(self, conf):
        self.photometric = augmentations[conf.photometric.name]()

    def get_dataset(self, split: str):
        return _PLSplit(self, split)


class _PLSplit:
    def __init__(self, parent, split):
        self.parent = parent
        self.conf = parent.conf
        self.split = split

    def __len__(self):
        c = self.conf
        return int(c.val_size if self.split == "val" else c.train_size)

    def _make_view(self, img, segments, rng, g):
        conf = self.conf
        s = int(conf.image_size)
        src = int(conf.source_size)
        H, _ = sample_homography_corners(
            (src, src), (s, s),
            difficulty=float(conf.homography.difficulty),
            translation=float(conf.homography.translation),
            max_angle=float(conf.homography.max_angle),
            rng=g,
        )
        warped = cv2.warpPerspective(img, H, (s, s))
        if rng.uniform() < float(conf.photometric.p):
            warped = self.parent.photometric(warped, rng)
        L = int(conf.max_segments)
        segs_w = warp_points_np(segments.reshape(-1, 2), H).reshape(-1, 2, 2)
        segs_c, ok = clip_segments_np(segs_w, s)
        length = np.linalg.norm(segs_c[:, 1] - segs_c[:, 0], axis=-1)
        ok = ok & (length >= float(conf.min_seg_length))
        out_l = np.zeros((L, 2, 2), np.float32)
        lv = np.zeros((L,), bool)
        n = min(len(segs_c), L)
        out_l[:n] = segs_c[:n]
        lv[:n] = ok[:n]
        out_l[~lv] = 0.0
        view = {
            "image": warped.astype(np.float32),
            "image_size": np.array([s, s], np.float32),
            "lines": out_l,
            "valid_lines": lv,
            "line_scores": lv.astype(np.float32),
        }
        if conf.compute_fields:
            active = out_l[lv]
            if len(active):
                df, af = exact_df_af(active, s)
            else:
                df = np.full((s, s), 1e4, np.float32)
                af = np.zeros((s, s), np.float32)
            view["gt_distance_field"] = df
            view["gt_angle_field"] = af
        return view, H.astype(np.float32)

    def getitem(self, idx: int, rng: np.random.Generator) -> dict:
        conf = self.conf
        salt = 15485863 if self.split == "val" else 0
        g = np.random.default_rng((int(conf.seed), idx + salt))
        img, segments, vertices = draw_scene(
            g, int(conf.source_size), int(conf.max_segments)
        )
        view0, H0 = self._make_view(img, segments, rng, g)
        view1, H1 = self._make_view(img, segments, rng, g)
        H_0to1 = (H1 @ np.linalg.inv(H0)).astype(np.float32)
        # identity line correspondence by construction (slot i <-> slot i)
        L = int(conf.max_segments)
        both = view0["valid_lines"] & view1["valid_lines"]
        gt_lm = np.where(both, np.arange(L), -1).astype(np.int32)
        return {
            "view0": view0,
            "view1": view1,
            "H_0to1": H_0to1,
            "gt_line_matches0": gt_lm,
            "gt_line_matches1": gt_lm,
            "idx": np.int32(idx),
            "name": f"synthpl/{idx}",
        }

    def __getitem__(self, idx):
        return self.getitem(idx, np.random.default_rng(idx))


__main_dataset__ = HomographyPointLineDataset
