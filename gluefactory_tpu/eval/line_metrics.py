"""One-to-one segment matching metrics
(reference: gluefactory/utils/ls_evaluation.py:177-304 — orthogonal line
distance with overlap gating, 1-1 segment assignment, repeatability and
localization error).

TPU-first notes: the distance matrices are batched jnp ops shared with the
GT generation (geometry/lines.py); the exact 1-1 assignment uses the native
Jonker-Volgenant LAP (ops/lap.py, C++/OpenMP) with a device greedy-mutual
fallback — the reference calls scipy's Hungarian per image."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry.lines import (
    area_line_dist,
    orth_line_dist,
    overlap_fraction,
    struct_line_dist,
)
from ..ops.lap import batch_linear_assignment

BIG = 1e9


def segment_distance_matrix(
    segs0: jnp.ndarray,
    segs1: jnp.ndarray,
    kind: str = "orth",
    min_overlap: float = 0.5,
) -> jnp.ndarray:
    """(B, L0, 2, 2) x (B, L1, 2, 2) -> (B, L0, L1) distances. 'area' is the
    length-unbiased enclosed-area distance; 'orth' gates
    pairs whose mutual projection overlap is below ``min_overlap`` to a huge
    distance (reference get_orth_dist); 'struct' is the endpoint-wise
    structural distance (orientation-invariant min over orderings)."""
    if kind == "struct":
        return struct_line_dist(segs0, segs1)
    if kind == "area":
        return area_line_dist(segs0, segs1)
    d = orth_line_dist(segs0, segs1)
    # mutual-min overlap gating (reference get_orth_dist mode='min')
    ov01 = overlap_fraction(segs0, segs1)
    ov10 = jnp.swapaxes(overlap_fraction(segs1, segs0), -1, -2)
    ov = jnp.minimum(ov01, ov10)
    return jnp.where(ov >= min_overlap, d, BIG)


def match_segments_one_to_one(
    dist: np.ndarray, valid0: np.ndarray, valid1: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Exact 1-1 assignment minimizing total distance.

    dist (B, L0, L1); returns (assign (B, L0) index into segs1 or -1,
    match_dist (B, L0))."""
    dist = np.asarray(dist, np.float64).copy()
    valid0 = np.asarray(valid0, bool)
    valid1 = np.asarray(valid1, bool)
    dist[~valid0[:, :, None] | ~valid1[:, None, :]] = BIG
    assign = batch_linear_assignment(dist)
    b_idx = np.arange(dist.shape[0])[:, None]
    match_dist = dist[b_idx, np.arange(dist.shape[1])[None], np.clip(assign, 0, None)]
    bad = (assign < 0) | ~valid0 | (match_dist >= BIG / 2)
    assign = np.where(bad, -1, assign)
    match_dist = np.where(bad, np.inf, match_dist)
    return assign, match_dist


def segment_repeatability(
    match_dist: np.ndarray,
    n0: np.ndarray,
    n1: np.ndarray,
    thresholds: list[float],
) -> dict[str, np.ndarray]:
    """Fraction of 1-1 matched segments below each threshold, normalized by
    min(n0, n1) per image (reference compute_repeatability)."""
    denom = np.maximum(np.minimum(n0, n1), 1)
    return {
        f"rep@{t}": (np.asarray(match_dist) <= t).sum(-1) / denom
        for t in thresholds
    }


def segment_localization_error(
    match_dist: np.ndarray, thresholds: list[float]
) -> dict[str, np.ndarray]:
    """Mean distance of matches below each threshold (reference
    compute_loc_error); NaN when nothing matches."""
    out = {}
    md = np.asarray(match_dist)
    for t in thresholds:
        sel = md < t
        vals = np.where(sel, md, 0.0)  # inf * False would poison the sum
        out[f"loc@{t}"] = np.where(
            sel.any(-1), vals.sum(-1) / np.maximum(sel.sum(-1), 1), np.nan
        )
    return out
