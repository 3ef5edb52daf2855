"""Intrinsics/pose/image helpers for dataset pipelines
(reference: gluefactory/datasets/utils.py:32-160 — rotate_intrinsics,
rotate_pose_inplane, scale_intrinsics, crop, zero_pad; used by MegaDepth's
mobile-rotation handling and crop-based training).

Conventions: images rotate COUNTER-clockwise by ``rot`` quarter turns
(``np.rot90(img, k=rot)``); pixel centers sit at integer coordinates, so a
point (x, y) in a (h, w) image maps under one CCW turn to (y, (w-1) - x).
Unlike the reference (which drops the -1 and is half-a-pixel off per turn),
these helpers are exact — verified in tests/test_dataset_utils.py by
projecting 3-D points through the rotated camera and comparing with the
rotated projections.
"""

from __future__ import annotations

import numpy as np


def scale_intrinsics(K: np.ndarray, scales) -> np.ndarray:
    """Scale K after resizing the image by (sx, sy)
    (reference datasets/utils.py:69-73)."""
    sx, sy = float(scales[0]), float(scales[1])
    S = np.diag([sx, sy, 1.0]).astype(K.dtype)
    return S @ K


def rotate_intrinsics(K: np.ndarray, image_shape, rot: int) -> np.ndarray:
    """K for an image rotated CCW by ``rot`` quarter turns.

    ``image_shape`` is the (h, w, ...) shape AFTER rotation (reference
    datasets/utils.py:32-51 contract). Exact pixel-center mapping:
      rot 1: (x, y) -> (y, (W0-1) - x)
      rot 2: (x, y) -> ((W0-1) - x, (H0-1) - y)
      rot 3: (x, y) -> ((H0-1) - y, x)
    where (H0, W0) is the shape BEFORE rotation."""
    rot = rot % 4
    if rot == 0:
        return K.copy()
    h_new, w_new = image_shape[:2]
    # shape before rotation
    h0, w0 = (w_new, h_new) if rot % 2 else (h_new, w_new)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    if rot == 1:
        out = [[fy, 0.0, cy], [0.0, fx, (w0 - 1) - cx], [0.0, 0.0, 1.0]]
    elif rot == 2:
        out = [[fx, 0.0, (w0 - 1) - cx], [0.0, fy, (h0 - 1) - cy], [0.0, 0.0, 1.0]]
    else:  # rot == 3
        out = [[fy, 0.0, (h0 - 1) - cy], [0.0, fx, cx], [0.0, 0.0, 1.0]]
    return np.array(out, dtype=K.dtype)


def rotate_pose_inplane(i_T_w: np.ndarray, rot: int) -> np.ndarray:
    """Compose a camera-from-world 4x4 pose with the in-plane rotation that
    compensates a CCW image rotation by ``rot`` quarter turns (reference
    datasets/utils.py:53-66). The rotated camera sees the world turned
    clockwise about its optical axis."""
    r = np.deg2rad([0, 270, 180, 90][rot % 4])
    Rz = np.array(
        [
            [np.cos(r), -np.sin(r), 0.0, 0.0],
            [np.sin(r), np.cos(r), 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )
    return Rz @ i_T_w


def get_divisible_wh(w: int, h: int, df: int | None = None) -> tuple[int, int]:
    """Largest (w, h) <= input divisible by ``df``
    (reference datasets/utils.py:75-80)."""
    if df is None:
        return w, h
    return int(w // df * df), int(h // df * df)


def crop(image, size, rng=None, other=None, K=None, return_bbox=False):
    """Random (rng given) or top-left crop; adjusts an aligned ``other`` map
    (e.g. depth) and intrinsics (reference datasets/utils.py:128-144)."""
    h, w = image.shape[:2]
    h_new, w_new = (size, size) if isinstance(size, int) else size
    if rng is not None:
        top = int(rng.integers(0, h - h_new + 1))
        left = int(rng.integers(0, w - w_new + 1))
    else:
        top = left = 0
    image = image[top: top + h_new, left: left + w_new]
    ret = [image]
    if other is not None:
        ret.append(other[top: top + h_new, left: left + w_new])
    if K is not None:
        K = K.copy()
        K[0, 2] -= left
        K[1, 2] -= top
        ret.append(K)
    if return_bbox:
        ret.append((top, top + h_new, left, left + w_new))
    return ret


def zero_pad(size: int, *images):
    """Zero-pad each image to (size, size) top-left anchored
    (reference datasets/utils.py:147-158)."""
    out = []
    for image in images:
        if image is None:
            out.append(None)
            continue
        h, w = image.shape[:2]
        padded = np.zeros((size, size) + image.shape[2:], dtype=image.dtype)
        padded[:h, :w] = image
        out.append(padded)
    return out
