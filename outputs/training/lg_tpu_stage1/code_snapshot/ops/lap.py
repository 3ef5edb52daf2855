"""Batched linear assignment: native C++ JV solver with scipy fallback
(replaces the reference's per-image scipy Hungarian loop for line GT,
reference gt_generation.py:3,367,515; native/lap/lap.cpp).

The native library solves a whole batch in one call with OpenMP; if the .so
is missing it is built on first use (g++ is in the image), falling back to a
scipy loop if compilation fails."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .. import logger

_NATIVE_DIR = Path(__file__).parent.parent.parent / "native" / "lap"
_LIB = None
_LIB_TRIED = False


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = _NATIVE_DIR / "liblap.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
            )
        except Exception as e:  # pragma: no cover
            logger.warning("Could not build native LAP solver (%s); using scipy", e)
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.batch_lap.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        lib.batch_lap.restype = None
        _LIB = lib
    except OSError as e:  # pragma: no cover
        logger.warning("Could not load native LAP solver (%s); using scipy", e)
    return _LIB


def batch_linear_assignment(costs: np.ndarray, use_native: bool = True) -> np.ndarray:
    """costs (B, N, M) float with N <= M -> row_to_col (B, N) int32.

    Entries that must not be matched should carry a large finite cost; the
    caller decides a threshold to reject them afterwards."""
    costs = np.ascontiguousarray(costs, dtype=np.float32)
    b, n, m = costs.shape
    assert n <= m, "pad so that rows <= cols"
    lib = _load_native() if use_native else None
    out = np.full((b, n), -1, dtype=np.int32)
    if lib is not None:
        lib.batch_lap(
            costs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b, n, m,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return out
    from scipy.optimize import linear_sum_assignment

    for i in range(b):
        rows, cols = linear_sum_assignment(costs[i])
        out[i, rows] = cols
    return out
