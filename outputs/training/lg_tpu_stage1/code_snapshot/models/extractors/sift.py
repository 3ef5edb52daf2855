"""SIFT extractor via OpenCV's C++ implementation
(reference: gluefactory/models/extractors/sift.py:80-234, which wraps
opencv/pycolmap per image).

Runs as a jax.pure_callback with STATIC output shapes (max_num_keypoints
slots + validity mask). RootSIFT normalization (reference sift.py:54-64) and
DoG-ratio filtering happen on host; descriptors return L2-normalized. Scales
and orientations are exposed for LightGlue's add_scale_ori input
(reference lightglue.py:413-431)."""

from __future__ import annotations

from typing import ClassVar

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..base_model import BaseModel


def sift_to_rootsift(desc: np.ndarray) -> np.ndarray:
    """(reference sift.py:54-64)"""
    desc = desc / np.maximum(np.abs(desc).sum(-1, keepdims=True), 1e-8)
    desc = np.sqrt(np.clip(desc, 0, None))
    return desc / np.maximum(np.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)


def detect_sift_np(img_u8: np.ndarray, k: int, contrast_th: float, rootsift: bool):
    sift = cv2.SIFT_create(nfeatures=k, contrastThreshold=contrast_th)
    kps, desc = sift.detectAndCompute(img_u8, None)
    n = 0 if kps is None else len(kps)
    pts = np.zeros((k, 2), np.float32)
    scales = np.zeros((k,), np.float32)
    oris = np.zeros((k,), np.float32)
    scores = np.zeros((k,), np.float32)
    descs = np.zeros((k, 128), np.float32)
    valid = np.zeros((k,), bool)
    if n:
        order = np.argsort([-p.response for p in kps])[:k]
        for out_i, i in enumerate(order):
            p = kps[i]
            pts[out_i] = p.pt
            scales[out_i] = p.size
            oris[out_i] = np.deg2rad(p.angle)
            scores[out_i] = p.response
            valid[out_i] = True
        d = desc[order]
        descs[: len(order)] = sift_to_rootsift(d) if rootsift else d / np.maximum(
            np.linalg.norm(d, axis=-1, keepdims=True), 1e-8
        )
    return pts, scales, oris, scores, descs, valid


class SIFT(BaseModel):
    default_conf: ClassVar[dict] = {
        "max_num_keypoints": 2048,
        "contrast_threshold": 0.04,
        "rootsift": True,
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
        k = int(self.conf.max_num_keypoints)

        def host_batch(imgs):
            outs = [
                detect_sift_np(
                    np.asarray(im), k, float(self.conf.contrast_threshold),
                    bool(self.conf.rootsift),
                )
                for im in imgs
            ]
            return tuple(np.stack([o[j] for o in outs]) for j in range(6))

        pts, scales, oris, scores, descs, valid = jax.pure_callback(
            host_batch,
            (
                jax.ShapeDtypeStruct((b, k, 2), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.float32),
                jax.ShapeDtypeStruct((b, k, 128), jnp.float32),
                jax.ShapeDtypeStruct((b, k), jnp.bool_),
            ),
            img_u8,
            vmap_method="sequential",
        )
        return {
            "keypoints": pts,
            "keypoint_scores": scores,
            "keypoint_valid": valid,
            "descriptors": descs,
            "scales": scales,
            "oris": oris,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = SIFT
