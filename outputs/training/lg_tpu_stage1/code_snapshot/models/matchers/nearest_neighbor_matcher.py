"""Nearest-neighbor descriptor matcher
(reference: gluefactory/models/matchers/nearest_neighbor_matcher.py:38-97).

One einsum similarity matrix, mutual check, ratio / distance thresholds —
all batched and mask-aware."""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp

from ..base_model import BaseModel
from ..utils.metrics import matcher_metrics

NEG_INF = -1e30


def find_nn(sim: jnp.ndarray, ratio_thresh: float | None, distance_thresh: float | None):
    """(reference nearest_neighbor_matcher.py:15-28)"""
    sim_nn = jnp.max(sim, axis=-1)
    matches = jnp.argmax(sim, axis=-1)
    mask = jnp.ones_like(sim_nn, dtype=bool)
    if ratio_thresh is not None:
        # second best via masking the best column per row
        m = sim.shape[-1]
        best_mask = jnp.arange(m) == matches[..., None]
        second = jnp.max(jnp.where(best_mask, NEG_INF, sim), axis=-1)
        # similarity = cosine in [-1, 1]; convert to distance ratio test
        dist_best = 2.0 * (1.0 - sim_nn)
        dist_second = 2.0 * (1.0 - second)
        mask = mask & (dist_best <= ratio_thresh**2 * dist_second)
    if distance_thresh is not None:
        mask = mask & (2.0 * (1.0 - sim_nn) <= distance_thresh**2)
    return jnp.where(mask, matches, -1).astype(jnp.int32), jnp.where(mask, sim_nn, 0.0)


def mutual_check(m0: jnp.ndarray, m1: jnp.ndarray):
    """(reference nearest_neighbor_matcher.py:29-35)"""
    idx0 = jnp.arange(m0.shape[-1])[None]
    safe_m0 = jnp.clip(m0, 0, m1.shape[-1] - 1)
    loop = jnp.take_along_axis(m1, safe_m0, axis=-1)
    ok = (m0 > -1) & (loop == idx0)
    return jnp.where(ok, m0, -1).astype(jnp.int32)


class NearestNeighborMatcher(BaseModel):
    default_conf: ClassVar[dict] = {
        "ratio_thresh": None,
        "distance_thresh": None,
        "mutual_check": True,
        "loss": None,
    }
    required_data_keys: ClassVar[list] = ["descriptors0", "descriptors1"]

    def _forward(self, data: dict) -> dict:
        sim = jnp.einsum("bnd,bmd->bnm", data["descriptors0"], data["descriptors1"])
        mask0 = data.get("keypoint_valid0")
        mask1 = data.get("keypoint_valid1")
        if mask0 is not None:
            sim = jnp.where(mask0[:, :, None], sim, NEG_INF)
        if mask1 is not None:
            sim = jnp.where(mask1[:, None, :], sim, NEG_INF)
        m0, ms0 = find_nn(sim, self.conf.ratio_thresh, self.conf.distance_thresh)
        m1, ms1 = find_nn(
            jnp.swapaxes(sim, -1, -2), self.conf.ratio_thresh, self.conf.distance_thresh
        )
        if self.conf.mutual_check:
            m0_new = mutual_check(m0, m1)
            m1 = mutual_check(m1, m0)
            m0 = m0_new
        if mask0 is not None:
            m0 = jnp.where(mask0, m0, -1)
            ms0 = jnp.where(mask0, ms0, 0.0)
        if mask1 is not None:
            m1 = jnp.where(mask1, m1, -1)
            ms1 = jnp.where(mask1, ms1, 0.0)
        return {
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": ms0,
            "matching_scores1": ms1,
            "similarity": sim,
        }

    def loss(self, pred: dict, data: dict):
        losses = {"total": jnp.zeros(pred["matches0"].shape[0])}
        return losses, matcher_metrics(pred, data)


__main_model__ = NearestNeighborMatcher
