"""Training data for the POLD2 MLP line classifier
(reference: gluefactory/datasets/pold2_mlp_dataset.py + _large.py).

From each synthetic scene (exact DF/AF): positives = true segments,
negatives = random endpoint pairs that are NOT near any true segment.
Emits fixed candidate slots with labels + validity."""

from __future__ import annotations

from typing import ClassVar

import numpy as np

from .base_dataset import BaseDataset
from .synthetic_shapes import draw_scene, exact_df_af


class POLD2MLPDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "pold2_mlp_dataset",
        "image_size": 160,
        "max_segments": 16,
        "num_candidates": 64,  # per sample, half positive target
        "neg_min_df": 2.0,  # mean DF above this counts as a clean negative
        "train_size": 5000,
        "val_size": 100,
        "train_batch_size": 8,
    }

    def get_dataset(self, split: str):
        return _MLPSplit(self, split)


class _MLPSplit:
    def __init__(self, parent, split):
        self.conf = parent.conf
        self.split = split

    def __len__(self):
        c = self.conf
        return int(c.val_size if self.split == "val" else c.train_size)

    def getitem(self, idx: int, rng: np.random.Generator) -> dict:
        conf = self.conf
        s = int(conf.image_size)
        salt = 32452843 if self.split == "val" else 0
        g = np.random.default_rng((int(conf.seed), idx + salt))
        img, segments, _ = draw_scene(g, s, int(conf.max_segments))
        df, af = exact_df_af(segments, s)
        C = int(conf.num_candidates)
        p0 = np.zeros((C, 2), np.float32)
        p1 = np.zeros((C, 2), np.float32)
        labels = np.zeros((C,), np.float32)
        valid = np.zeros((C,), bool)
        n_pos = min(len(segments), C // 2)
        p0[:n_pos] = segments[:n_pos, 0]
        p1[:n_pos] = segments[:n_pos, 1]
        labels[:n_pos] = 1.0
        valid[:n_pos] = True
        # negatives: random pairs with high mean DF along the segment
        i = n_pos
        tries = 0
        t = np.linspace(0, 1, 16)[:, None]
        while i < C and tries < C * 20:
            tries += 1
            a = g.uniform(2, s - 3, 2)
            b = g.uniform(2, s - 3, 2)
            pts = a[None] * (1 - t) + b[None] * t
            pi = np.clip(np.round(pts).astype(int), 0, s - 1)
            if df[pi[:, 1], pi[:, 0]].mean() > float(conf.neg_min_df):
                p0[i], p1[i] = a, b
                labels[i] = 0.0
                valid[i] = True
                i += 1
        return {
            "image": img.astype(np.float32),
            "distance_field": df,
            "angle_field": af,
            "candidates0": p0,
            "candidates1": p1,
            "gt_labels": labels,
            "candidate_valid": valid.astype(np.float32),
            "idx": np.int32(idx),
            "name": f"mlp/{idx}",
        }

    def __getitem__(self, idx):
        return self.getitem(idx, np.random.default_rng(idx))


__main_dataset__ = POLD2MLPDataset
