"""Static-shape padding helpers (reference: gluefactory/models/utils/misc.py:19-70).

On TPU these are the *only* mode: every sparse feature tensor is padded to a
fixed slot count with a validity mask (SURVEY.md §7.1)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pad_to_length(x: np.ndarray, length: int, axis: int = 0, pad_value=0.0):
    """Pad (or truncate) ``x`` along ``axis`` to ``length``; returns
    (padded, valid_mask along that axis)."""
    n = x.shape[axis]
    valid = np.zeros(length, dtype=bool)
    valid[: min(n, length)] = True
    if n == length:
        return x, valid
    if n > length:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, length)
        return x[tuple(sl)], valid
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, length - n)
    return np.pad(x, widths, constant_values=pad_value), valid


def pad_and_stack(arrays: list[np.ndarray], length: int, axis: int = 0, pad_value=0.0):
    padded, masks = zip(*[pad_to_length(a, length, axis, pad_value) for a in arrays])
    return np.stack(padded), np.stack(masks)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None):
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask, axis=axis) / jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
