"""Photometric augmentation pipelines
(reference: gluefactory/datasets/augmentations.py — albumentations-based;
re-implemented in numpy/cv2 since the transforms are simple pointwise ops and
run in the host loader threads).

Pipelines: ``identity``, ``lg`` (LightGlue training recipe: brightness/
contrast/blur/noise/shade), ``dark`` (aggressive low-light)."""

from __future__ import annotations

import cv2
import numpy as np


def _rand(rng, lo, hi):
    return float(rng.uniform(lo, hi))


def random_brightness_contrast(img, rng, brightness=0.2, contrast=0.2, p=0.5):
    if rng.uniform() > p:
        return img
    alpha = 1.0 + _rand(rng, -contrast, contrast)
    beta = _rand(rng, -brightness, brightness)
    return np.clip(img * alpha + beta, 0.0, 1.0)


def random_gamma(img, rng, gamma=(0.5, 2.0), p=0.3):
    if rng.uniform() > p:
        return img
    g = _rand(rng, *gamma)
    return np.clip(np.power(np.clip(img, 1e-6, 1.0), g), 0.0, 1.0)


def random_blur(img, rng, max_ksize=3, p=0.25):
    if rng.uniform() > p:
        return img
    k = 2 * int(rng.integers(1, max_ksize + 1)) + 1
    out = cv2.GaussianBlur(img, (k, k), 0)
    return out[..., None] if out.ndim == 2 and img.ndim == 3 else out


def random_noise(img, rng, std=0.02, p=0.5):
    if rng.uniform() > p:
        return img
    return np.clip(img + rng.normal(0.0, std, size=img.shape).astype(img.dtype), 0.0, 1.0)


def random_additive_shade(img, rng, nb_ellipses=10, transparency=(-0.5, 0.8), p=0.3):
    """Random soft elliptical shading (reference augmentations.py
    RandomAdditiveShade:19, re-derived)."""
    if rng.uniform() > p:
        return img
    h, w = img.shape[:2]
    mask = np.zeros((h, w), np.float32)
    for _ in range(nb_ellipses):
        ax = int(max(rng.integers(5, max(6, w // 4)), 1))
        ay = int(max(rng.integers(5, max(6, h // 4)), 1))
        x = int(rng.integers(ax, max(w - ax, ax + 1)))
        y = int(rng.integers(ay, max(h - ay, ay + 1)))
        angle = _rand(rng, 0, 90)
        cv2.ellipse(mask, (x, y), (ax, ay), angle, 0, 360, 255, -1)
    t = _rand(rng, *transparency)
    k = int(max(h, w) * 0.1) | 1
    mask = cv2.GaussianBlur(mask, (k, k), 0) / 255.0
    shaded = img * (1.0 - t * mask[..., None] if img.ndim == 3 else 1.0 - t * mask)
    return np.clip(shaded, 0.0, 1.0)


def random_hue_saturation(img, rng, hue=10, sat=0.3, p=0.3):
    if rng.uniform() > p or img.ndim != 3 or img.shape[2] != 3:
        return img
    hsv = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 0] = (hsv[..., 0] + _rand(rng, -hue, hue)) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] * (1 + _rand(rng, -sat, sat)), 0, 255)
    out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return out.astype(np.float32) / 255.0


class IdentityAugmentation:
    def __call__(self, img: np.ndarray, rng) -> np.ndarray:
        return img


class LGAugmentation(IdentityAugmentation):
    """LightGlue training photometric pipeline (reference augmentations 'lg')."""

    def __call__(self, img, rng):
        img = random_hue_saturation(img, rng)
        img = random_brightness_contrast(img, rng)
        img = random_gamma(img, rng)
        img = random_blur(img, rng)
        img = random_additive_shade(img, rng)
        img = random_noise(img, rng)
        return img.astype(np.float32)


class DarkAugmentation(IdentityAugmentation):
    """Aggressive low-light (reference augmentations 'dark')."""

    def __call__(self, img, rng):
        img = random_gamma(img, rng, gamma=(1.5, 3.0), p=0.9)
        img = random_brightness_contrast(img, rng, brightness=0.4, contrast=0.4, p=0.9)
        img = random_noise(img, rng, std=0.05, p=0.8)
        img = random_blur(img, rng, p=0.4)
        return img.astype(np.float32)


augmentations = {
    "identity": IdentityAugmentation,
    "lg": LGAugmentation,
    "dark": DarkAugmentation,
}
