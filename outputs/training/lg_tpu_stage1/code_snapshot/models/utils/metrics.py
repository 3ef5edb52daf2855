"""Matcher training metrics (reference: gluefactory/models/utils/metrics.py:5-50).

All computed on device over static shapes with ignore-aware masking."""

from __future__ import annotations

import jax.numpy as jnp


def matcher_metrics(
    pred: dict, data: dict, prefix: str = "", prefix_gt: str | None = None
) -> dict:
    """match_recall / match_precision / accuracy / average_precision per batch
    element. GT codes: >=0 index, -1 unmatched, -2 ignore."""
    def recall(m, gt_m):
        mask = (gt_m > -1).astype(jnp.float32)
        return jnp.sum((m == gt_m) * mask, axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)

    def accuracy(m, gt_m):
        mask = (gt_m > -2).astype(jnp.float32)
        return jnp.sum((m == gt_m) * mask, axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)

    def precision(m, gt_m):
        mask = ((m > -1) & (gt_m >= -1)).astype(jnp.float32)
        return jnp.sum((m == gt_m) * mask, axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)

    def ranking_ap(m, gt_m, scores):
        p_mask = ((m > -1) & (gt_m >= -1)).astype(jnp.float32)
        r_mask = (gt_m > -1).astype(jnp.float32)
        sort_ind = jnp.argsort(-scores, axis=1)
        sorted_p_mask = jnp.take_along_axis(p_mask, sort_ind, axis=1)
        sorted_r_mask = jnp.take_along_axis(r_mask, sort_ind, axis=1)
        correct = jnp.take_along_axis((m == gt_m).astype(jnp.float32), sort_ind, axis=1)
        tp = correct * sorted_p_mask
        cum_tp = jnp.cumsum(tp, axis=1)
        p_at_k = cum_tp / jnp.maximum(jnp.cumsum(sorted_p_mask, axis=1), 1e-8)
        ap = jnp.sum(p_at_k * tp, axis=1) / jnp.maximum(sorted_r_mask.sum(axis=1), 1.0)
        return ap

    gt_pref = prefix_gt if prefix_gt is not None else prefix
    m0 = pred[f"{prefix}matches0"]
    gt_m0 = data[f"gt_{gt_pref}matches0"]
    scores0 = pred.get(f"{prefix}matching_scores0", jnp.zeros_like(m0, jnp.float32))
    return {
        f"{prefix}match_recall": recall(m0, gt_m0),
        f"{prefix}match_precision": precision(m0, gt_m0),
        f"{prefix}accuracy": accuracy(m0, gt_m0),
        f"{prefix}average_precision": ranking_ap(m0, gt_m0, scores0),
    }
