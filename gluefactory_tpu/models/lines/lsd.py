"""LSD line segment detector (reference: gluefactory/models/lines/lsd.py:9-88,
which wraps the pytlsd C++ wheel per image).

Here LSD runs through OpenCV's C++ implementation via jax.pure_callback with
STATIC output shapes: exactly ``max_num_lines`` slots + ``valid_lines`` mask,
scores = sqrt(length) (cv2 exposes no NFA in the stable API), sorted by
score. The callback executes on host threads batched over the leading axis —
the sequential C++ step overlaps the input pipeline rather than the TPU
compute, and the learned DF/AF line path (POLD2/JPLDD) is the TPU-native
escape hatch (SURVEY.md §7.3.8)."""

from __future__ import annotations

from typing import ClassVar

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..base_model import BaseModel


def detect_lsd_np(image_u8: np.ndarray, max_lines: int, min_length: float):
    """image (H, W) uint8 -> (lines (max, 2, 2) f32, scores (max,), valid)."""
    lsd = cv2.createLineSegmentDetector(cv2.LSD_REFINE_STD)
    out = lsd.detect(image_u8)
    segs = out[0]
    if segs is None or len(segs) == 0:
        return (
            np.zeros((max_lines, 2, 2), np.float32),
            np.zeros((max_lines,), np.float32),
            np.zeros((max_lines,), bool),
        )
    segs = segs.reshape(-1, 2, 2).astype(np.float32)
    lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=-1)
    keep = lengths >= min_length
    segs, lengths = segs[keep], lengths[keep]
    scores = np.sqrt(lengths)
    order = np.argsort(-scores)[:max_lines]
    segs, scores = segs[order], scores[order]
    k = len(segs)
    lines = np.zeros((max_lines, 2, 2), np.float32)
    sc = np.zeros((max_lines,), np.float32)
    valid = np.zeros((max_lines,), bool)
    lines[:k], sc[:k], valid[:k] = segs, scores, True
    return lines, sc, valid


class LSD(BaseModel):
    default_conf: ClassVar[dict] = {
        "max_num_lines": 250,
        "min_length": 15.0,
        "describe": None,  # 'lbd' appends LBD line descriptors
        "lbd": {"n_bands": 9, "band_width": 7.0, "n_samples": 32},
        "trainable": False,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        if image.shape[-1] == 3:
            scale = jnp.array([0.299, 0.587, 0.114], dtype=image.dtype)
            image = jnp.sum(image * scale, axis=-1)
        else:
            image = image[..., 0]
        img_u8 = jnp.clip(image * 255.0, 0, 255).astype(jnp.uint8)
        b = image.shape[0]
        m = int(self.conf.max_num_lines)

        def host_batch(imgs):
            outs = [detect_lsd_np(np.asarray(im), m, float(self.conf.min_length)) for im in imgs]
            lines = np.stack([o[0] for o in outs])
            scores = np.stack([o[1] for o in outs])
            valid = np.stack([o[2] for o in outs])
            return lines, scores, valid

        lines, scores, valid = jax.pure_callback(
            host_batch,
            (
                jax.ShapeDtypeStruct((b, m, 2, 2), jnp.float32),
                jax.ShapeDtypeStruct((b, m), jnp.float32),
                jax.ShapeDtypeStruct((b, m), jnp.bool_),
            ),
            img_u8,
            vmap_method="sequential",
        )
        pred = {"lines": lines, "line_scores": scores, "valid_lines": valid}
        if self.conf.describe == "lbd":
            from .lbd import lbd_describe

            pred["line_descriptors"] = lbd_describe(
                image, lines, valid,
                n_bands=int(self.conf.lbd.n_bands),
                band_width=float(self.conf.lbd.band_width),
                n_samples=int(self.conf.lbd.n_samples),
            )
        return pred

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = LSD
