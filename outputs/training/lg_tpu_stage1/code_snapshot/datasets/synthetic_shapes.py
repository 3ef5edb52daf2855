"""Synthetic single-view dataset with exact point/line supervision — the
zero-download stand-in for the fork's cached-GT single-view datasets
(reference: gluefactory/datasets/oxford_paris_mini_1view_jpldd.py:18-510 and
ground_truth_generation/, which cache homography-adaptation heatmaps and
DeepLSD DF/AF fields).

Procedurally drawn polygons/segments give *analytically exact* ground truth:
  gt_heatmap        (H, W) — 1 at shape vertices / segment endpoints,
  gt_distance_field (H, W) — exact distance to the nearest drawn segment,
  gt_angle_field    (H, W) — orientation (mod pi) of the nearest segment,
  gt_segments       (L, 2, 2) + gt_segment_valid — the drawn segments.

Used for JPLDD/POLD2 pre-training and for deterministic unit tests of the
detector/line losses."""

from __future__ import annotations

from typing import ClassVar

import cv2
import numpy as np

from .augmentations import augmentations
from .base_dataset import BaseDataset


def draw_scene(rng: np.random.Generator, size: int, max_segments: int):
    """Random polygons + standalone segments on a shaded background."""
    img = np.full((size, size, 3), rng.uniform(0.2, 0.8), np.float32)
    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    segments = []
    vertices = []
    n_poly = int(rng.integers(1, 4))
    for _ in range(n_poly):
        n_pts = int(rng.integers(3, 6))
        cx, cy = rng.uniform(size * 0.15, size * 0.85, 2)
        radius = rng.uniform(size * 0.08, size * 0.3)
        angles = np.sort(rng.uniform(0, 2 * np.pi, n_pts))
        pts = np.stack(
            [cx + radius * np.cos(angles), cy + radius * np.sin(angles)], -1
        )
        pts = np.clip(pts, 2, size - 3)
        color = tuple(float(c) for c in rng.uniform(0, 1, 3))
        cv2.fillPoly(img, [pts.astype(np.int32)], color)
        for i in range(n_pts):
            segments.append((pts[i], pts[(i + 1) % n_pts]))
            vertices.append(pts[i])
    n_seg = int(rng.integers(1, 5))
    for _ in range(n_seg):
        p0 = rng.uniform(5, size - 5, 2)
        ang = rng.uniform(0, 2 * np.pi)
        ln = rng.uniform(size * 0.15, size * 0.5)
        p1 = np.clip(p0 + ln * np.array([np.cos(ang), np.sin(ang)]), 2, size - 3)
        color = tuple(float(c) for c in rng.uniform(0, 1, 3))
        cv2.line(img, tuple(p0.astype(int)), tuple(p1.astype(int)), color, 2)
        segments.append((p0, p1))
        vertices += [p0, p1]
    segments = np.asarray(segments, np.float32)[:max_segments]
    vertices = np.asarray(vertices, np.float32)
    return np.clip(img, 0, 1), segments, vertices


def exact_df_af(segments: np.ndarray, size: int):
    """Exact distance + nearest-segment orientation fields (numpy)."""
    ys, xs = np.mgrid[0:size, 0:size]
    pix = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)  # (P, 2)
    a = segments[:, 0][None]  # (1, L, 2)
    b = segments[:, 1][None]
    p = pix[:, None]  # (P, 1, 2)
    ab = b - a
    t = np.clip(
        np.sum((p - a) * ab, -1) / (np.sum(ab * ab, -1) + 1e-8), 0.0, 1.0
    )
    proj = a + t[..., None] * ab
    d = np.linalg.norm(p - proj, axis=-1)  # (P, L)
    nearest = d.argmin(-1)
    df = d.min(-1).reshape(size, size).astype(np.float32)
    seg_ang = (np.arctan2(ab[0, :, 1], ab[0, :, 0])) % np.pi
    af = seg_ang[nearest].reshape(size, size).astype(np.float32)
    return df, af


class SyntheticShapesDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "synthetic_shapes",
        "image_size": 240,
        "max_segments": 32,
        "max_vertices": 64,
        "train_size": 10000,
        "val_size": 200,
        "photometric": {"name": "lg", "p": 0.5},
        "heatmap_sigma": 1.0,
    }

    def _init(self, conf):
        self.photometric = augmentations[conf.photometric.name]()

    def get_dataset(self, split: str):
        return _SynthSplit(self, split)


class _SynthSplit:
    def __init__(self, parent, split):
        self.parent = parent
        self.conf = parent.conf
        self.split = split

    def __len__(self):
        return int(self.conf.val_size if self.split == "val" else self.conf.train_size)

    def getitem(self, idx: int, rng: np.random.Generator):
        conf = self.conf
        s = int(conf.image_size)
        salt = 104729 if self.split == "val" else 0
        g = np.random.default_rng((int(conf.seed), idx + salt))
        img, segments, vertices = draw_scene(g, s, int(conf.max_segments))
        df, af = exact_df_af(segments, s)
        heat = np.zeros((s, s), np.float32)
        vi = np.clip(np.round(vertices).astype(int), 0, s - 1)
        heat[vi[:, 1], vi[:, 0]] = 1.0
        if conf.heatmap_sigma > 0:
            k = int(conf.heatmap_sigma * 6) | 1
            heat = cv2.GaussianBlur(heat, (k, k), conf.heatmap_sigma)
            heat = heat / max(heat.max(), 1e-8)
        if self.split == "train" and rng.uniform() < float(conf.photometric.p):
            img = self.parent.photometric(img, rng)
        L = int(conf.max_segments)
        segs = np.zeros((L, 2, 2), np.float32)
        seg_valid = np.zeros((L,), bool)
        segs[: len(segments)] = segments
        seg_valid[: len(segments)] = True
        return {
            "image": img.astype(np.float32),
            "image_size": np.array([s, s], np.float32),
            "gt_heatmap": heat,
            "gt_distance_field": df,
            "gt_angle_field": af,
            "gt_segments": segs,
            "gt_segment_valid": seg_valid,
            "idx": np.int32(idx),
            "name": f"synth/{idx}",
        }

    def __getitem__(self, idx):
        return self.getitem(idx, np.random.default_rng(idx))


__main_dataset__ = SyntheticShapesDataset
