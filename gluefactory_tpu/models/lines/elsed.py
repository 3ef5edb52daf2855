"""ELSED-class line segment detector
(reference: gluefactory/models/lines/elsed.py:8-48, which wraps the pyelsed
C++ wheel; here the detector itself lives in-tree at native/elsed/elsed.cpp —
anchor extraction, greedy edge drawing, deviation-bounded incremental
least-squares fitting — and is called through ctypes as a host callback with
static output slots, like lines/lsd.py)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import ClassVar

import jax
import jax.numpy as jnp
import numpy as np

from ... import logger
from ..base_model import BaseModel

_NATIVE_DIR = Path(__file__).resolve().parents[3] / "native" / "elsed"
_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = _NATIVE_DIR / "libelsed.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
            )
        except Exception as e:  # pragma: no cover
            logger.warning("Could not build native ELSED (%s)", e)
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.elsed_detect.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.elsed_detect.restype = ctypes.c_int
        _LIB = lib
    except OSError as e:  # pragma: no cover
        logger.warning("Could not load native ELSED (%s)", e)
    return _LIB


def detect_elsed_np(
    image: np.ndarray,
    max_lines: int,
    grad_th: float = 0.06,
    dev_tol: float = 1.2,
    min_length: int = 15,
):
    """image (H, W) float32 in [0, 1] -> (lines (max, 2, 2), scores, valid)."""
    lib = _load_native()
    lines = np.zeros((max_lines, 2, 2), np.float32)
    scores = np.zeros((max_lines,), np.float32)
    valid = np.zeros((max_lines,), bool)
    if lib is None:  # pragma: no cover - toolchain always present in CI
        return lines, scores, valid
    img = np.ascontiguousarray(image, np.float32)
    segs = np.zeros((max_lines, 4), np.float32)
    n = lib.elsed_detect(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[0], img.shape[1],
        ctypes.c_float(grad_th), ctypes.c_float(dev_tol),
        int(min_length), int(max_lines),
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    lines[:] = segs.reshape(max_lines, 2, 2)
    valid[:n] = True
    return lines, scores, valid


class ELSED(BaseModel):
    default_conf: ClassVar[dict] = {
        "max_num_lines": 250,
        "grad_th": 0.06,
        "dev_tol": 1.2,
        "min_length": 15,
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
        b = image.shape[0]
        m = int(self.conf.max_num_lines)
        conf = self.conf

        def host_batch(imgs):
            outs = [
                detect_elsed_np(
                    np.asarray(im), m, float(conf.grad_th),
                    float(conf.dev_tol), int(conf.min_length),
                )
                for im in imgs
            ]
            return (
                np.stack([o[0] for o in outs]),
                np.stack([o[1] for o in outs]),
                np.stack([o[2] for o in outs]),
            )

        lines, scores, valid = jax.pure_callback(
            host_batch,
            (
                jax.ShapeDtypeStruct((b, m, 2, 2), jnp.float32),
                jax.ShapeDtypeStruct((b, m), jnp.float32),
                jax.ShapeDtypeStruct((b, m), jnp.bool_),
            ),
            image.astype(jnp.float32),
            vmap_method="sequential",
        )
        return {"lines": lines, "line_scores": scores, "valid_lines": valid}

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = ELSED
