"""Image I/O and preprocessing (reference: gluefactory/utils/image.py).

TPU-first deltas from the reference:
  - preprocessing always produces a *static* canvas ``(size, size)`` or
    ``(h, w)`` with a validity mask, so downstream model shapes are fixed and
    XLA compiles once per config, not per image;
  - images are channel-last ``(H, W, C)`` float32 in [0, 1] (XLA/TPU convs are
    NHWC-native), vs the reference's NCHW torch layout;
  - the affine resize transform is returned as a 3x3 matrix so keypoints can
    be mapped back to original coordinates exactly
    (reference ImagePreprocessor, utils/image.py:12-102).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from ..core.config import Config


def read_image(path: str | Path, grayscale: bool = False) -> np.ndarray:
    """Read an image as RGB (H, W, 3) or grayscale (H, W), uint8
    (reference utils/image.py:104-115)."""
    mode = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
    image = cv2.imread(str(path), mode)
    if image is None:
        raise IOError(f"Could not read image at {path}")
    if not grayscale:
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
    return image


def numpy_image_to_float(image: np.ndarray) -> np.ndarray:
    """uint8 HWC/HW -> float32 HWC in [0, 1] (channel-last, TPU NHWC layout)."""
    if image.ndim == 2:
        image = image[..., None]
    if image.dtype == np.uint8:
        image = image.astype(np.float32) / 255.0
    return image.astype(np.float32)


class ImagePreprocessor:
    """Resize keeping aspect ratio, then pad onto a static canvas.

    Output dict (all numpy, ready to collate into fixed-shape batches):
      image       (H', W', C) float32, zero-padded
      image_size  (2,) float32 — valid (w, h) inside the canvas
      orig_size   (2,) float32 — original (w, h)
      scales      (2,) float32 — (sx, sy) applied by the resize
      transform   (3, 3) float32 — maps original pixel coords -> canvas coords
      valid_mask  (H', W') bool — True on image pixels, False on padding
    """

    default_conf = {
        "resize": None,  # target size (int) or None
        "edge_divisible_by": None,
        "side": "long",  # resize so this side == resize: short | long | vert | horz
        "interpolation": "bilinear",
        "align_corners": None,
        "antialias": True,
        "square_pad": True,  # pad to (resize, resize) static canvas
        "add_padding_mask": True,
        "grayscale": False,
    }

    def __init__(self, conf: Config | dict | None = None):
        self.conf = Config(self.default_conf).merge(conf or {})

    def __call__(self, image: np.ndarray) -> dict:
        conf = self.conf
        image = numpy_image_to_float(image)
        h, w = image.shape[:2]
        sx = sy = 1.0
        if conf.resize is not None:
            target = int(conf.resize)
            side = conf.side
            if side == "short":
                scale = target / min(h, w)
            elif side == "long":
                scale = target / max(h, w)
            elif side == "vert":
                scale = target / h
            else:  # horz
                scale = target / w
            nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
            if conf.edge_divisible_by:
                d = int(conf.edge_divisible_by)
                nw, nh = (nw // d) * d, (nh // d) * d
            interp = cv2.INTER_AREA if (scale < 1 and conf.antialias) else cv2.INTER_LINEAR
            image = cv2.resize(image, (nw, nh), interpolation=interp)
            if image.ndim == 2:
                image = image[..., None]
            sx, sy = nw / w, nh / h
        nh, nw = image.shape[:2]
        if conf.square_pad and conf.resize is not None:
            canvas = int(conf.resize)
            ch = cw = canvas
        else:
            ch, cw = nh, nw
        padded = np.zeros((ch, cw, image.shape[2]), dtype=np.float32)
        padded[:nh, :nw] = image[:ch, :cw]
        valid = np.zeros((ch, cw), dtype=bool)
        valid[: min(nh, ch), : min(nw, cw)] = True
        transform = np.array(
            [[sx, 0.0, 0.0], [0.0, sy, 0.0], [0.0, 0.0, 1.0]], dtype=np.float32
        )
        if conf.grayscale and padded.shape[2] == 3:
            padded = padded.mean(axis=2, keepdims=True)
        return {
            "image": padded,
            "image_size": np.array([min(nw, cw), min(nh, ch)], dtype=np.float32),
            "orig_size": np.array([w, h], dtype=np.float32),
            "scales": np.array([sx, sy], dtype=np.float32),
            "transform": transform,
            "valid_mask": valid,
        }


def load_image(path: str | Path, grayscale: bool = False, **conf) -> dict:
    """Read + preprocess in one call (reference utils/image.py:128-143)."""
    image = read_image(path, grayscale=grayscale)
    return ImagePreprocessor(conf)(image)
