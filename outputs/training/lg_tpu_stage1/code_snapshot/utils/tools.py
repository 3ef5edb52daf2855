"""Metric accumulators, AUC computation, and seeding discipline
(reference: gluefactory/utils/tools.py).

Accumulators are NaN-aware host-side reducers fed from device scalars; AUC is
the trapezoid area under the error-recall curve (``cal_error_auc``,
reference utils/tools.py:137-150). RNG forking is explicit `jax.random` key
threading instead of global state.
"""

from __future__ import annotations

import random
from collections.abc import Iterable

import jax
import numpy as np


class AverageMetric:
    def __init__(self, elements=None):
        self._sum = 0.0
        self._num = 0
        if elements is not None:
            self.update(elements)

    def update(self, x):
        x = np.asarray(x, dtype=np.float64).ravel()
        mask = ~np.isnan(x)
        self._sum += float(x[mask].sum())
        self._num += int(mask.sum())

    def compute(self):
        return np.nan if self._num == 0 else self._sum / self._num


class FAverageMetric(AverageMetric):
    """Average that also keeps raw elements (for debugging distributions)."""

    def __init__(self, elements=None):
        self._elements = []
        super().__init__(elements)

    def update(self, x):
        x = np.asarray(x, dtype=np.float64).ravel()
        self._elements += x.tolist()
        super().update(x)


class MedianMetric:
    def __init__(self, elements=None):
        self._elements = []
        if elements is not None:
            self.update(elements)

    def update(self, x):
        self._elements += np.asarray(x, dtype=np.float64).ravel().tolist()

    def compute(self):
        arr = np.array(self._elements)
        arr = arr[~np.isnan(arr)]
        return np.nan if arr.size == 0 else float(np.median(arr))


class QuantileMetric:
    def __init__(self, q: float = 0.05):
        self.q = q
        self._elements = []

    def update(self, x):
        self._elements += np.asarray(x, dtype=np.float64).ravel().tolist()

    def compute(self):
        arr = np.array(self._elements)
        arr = arr[~np.isnan(arr)]
        return np.nan if arr.size == 0 else float(np.quantile(arr, self.q))


class RecallMetric:
    def __init__(self, ths, elements=None):
        self.ths = ths if isinstance(ths, Iterable) else [ths]
        self._elements = []
        if elements is not None:
            self.update(elements)

    def update(self, x):
        self._elements += np.asarray(x, dtype=np.float64).ravel().tolist()

    def compute(self):
        values = [self._compute(th) for th in self.ths]
        return values if len(values) > 1 else values[0]

    def _compute(self, th):
        arr = np.array(self._elements)
        if arr.size == 0:
            return np.nan
        return float((arr <= th).sum() / arr.size)


class PRMetric:
    """Accumulates (label, prediction) pairs for precision-recall curves."""

    def __init__(self):
        self.labels = []
        self.predictions = []

    def update(self, labels, predictions, mask=None):
        labels = np.asarray(labels).ravel()
        predictions = np.asarray(predictions).ravel()
        if mask is not None:
            m = np.asarray(mask).ravel().astype(bool)
            labels, predictions = labels[m], predictions[m]
        self.labels.append(labels)
        self.predictions.append(predictions)

    def compute(self):
        if not self.labels:
            return np.array([]), np.array([])
        return np.concatenate(self.labels), np.concatenate(self.predictions)


def cal_error_auc(errors, thresholds) -> list[float]:
    """Trapezoid AUC of the recall-vs-error curve at each threshold
    (reference utils/tools.py:137-150)."""
    errors = np.sort(np.asarray(errors, dtype=np.float64))
    if errors.size == 0:
        return [0.0] * len(thresholds)
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    aucs = []
    for t in thresholds:
        last_index = np.searchsorted(errors, t)
        r = np.r_[recall[:last_index], recall[last_index - 1]]
        e = np.r_[errors[:last_index], t]
        aucs.append(float(np.trapezoid(r, x=e) / t))
    return aucs


class AUCMetric:
    def __init__(self, thresholds, elements=None):
        self._elements = []
        self.thresholds = thresholds if isinstance(thresholds, Iterable) else [thresholds]
        if elements is not None:
            self.update(elements)

    def update(self, x):
        self._elements += np.asarray(x, dtype=np.float64).ravel().tolist()

    def compute(self):
        if len(self._elements) == 0:
            return np.nan
        return cal_error_auc(self._elements, self.thresholds)


METRICS = {
    "mean": AverageMetric,
    "median": MedianMetric,
    "recall": RecallMetric,
    "auc": AUCMetric,
}


def set_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs and return the root JAX key
    (reference utils/tools.py:228-246; JAX randomness itself is key-threaded)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def fork_rng(key: jax.Array, name: str | int = 0) -> jax.Array:
    """Derive an independent stream (≙ torch fork_rng, utils/tools.py:261-269)."""
    if isinstance(name, str):
        name = abs(hash(name)) % (2**31)
    return jax.random.fold_in(key, name)
