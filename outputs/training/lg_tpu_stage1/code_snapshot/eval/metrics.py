"""Detector-level evaluation metrics: keypoint / line repeatability and
localization error under a known homography
(reference: gluefactory/geometry/metrics.py:7-67,
gluefactory/utils/ls_evaluation.py:177-304, utils/kp_evaluation.py).

All batched jnp with validity masks."""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.homography import warp_points
from ..geometry.lines import orth_line_dist, struct_line_dist
from ..geometry.homography import warp_lines


def keypoint_repeatability(
    kpts0, kpts1, valid0, valid1, H_0to1, image_size1, th: float = 3.0
):
    """Fraction of view-0 keypoints re-detected within th in view 1, plus the
    mean localization error of the repeated ones (reference metrics.py:7-40).
    Returns (rep (B,), loc_error (B,))."""
    w0 = warp_points(kpts0, H_0to1)
    inside = jnp.all((w0 >= 0) & (w0 <= image_size1[:, None, :] - 1), axis=-1)
    val = valid0 & inside
    d = jnp.linalg.norm(w0[:, :, None, :] - kpts1[:, None, :, :], axis=-1)
    d = jnp.where(valid1[:, None, :], d, jnp.inf)
    dmin = jnp.min(d, axis=-1)
    repeated = (dmin < th) & val
    rep = repeated.sum(-1) / jnp.maximum(val.sum(-1), 1)
    loc = jnp.sum(jnp.where(repeated, dmin, 0.0), axis=-1) / jnp.maximum(
        repeated.sum(-1), 1
    )
    return rep, loc


def line_repeatability(
    lines0, lines1, valid0, valid1, H_0to1, image_size1, th: float = 5.0,
    distance: str = "orth",
):
    """Line repeatability + localization error under H
    (reference ls_evaluation.py:compute_repeatability:258). Lines of view 0
    are warped into view 1 and matched 1-1 greedily by the chosen distance."""
    warped0, wvalid = warp_lines(lines0, H_0to1, image_size1)
    val0 = valid0 & wvalid
    dist_fn = orth_line_dist if distance == "orth" else struct_line_dist
    D = dist_fn(warped0, lines1)
    D = jnp.where(val0[:, :, None] & valid1[:, None, :], D, jnp.inf)
    # greedy mutual nearest 1-1
    arg0 = jnp.argmin(D, axis=-1)
    arg1 = jnp.argmin(D, axis=-2)
    l0 = lines0.shape[1]
    mutual = jnp.take_along_axis(arg1, arg0, axis=-1) == jnp.arange(l0)
    dmin = jnp.min(D, axis=-1)
    repeated = mutual & (dmin < th) & val0
    rep = repeated.sum(-1) / jnp.maximum(val0.sum(-1), 1)
    loc = jnp.sum(jnp.where(repeated, dmin, 0.0), axis=-1) / jnp.maximum(
        repeated.sum(-1), 1
    )
    return rep, loc


def matching_score(m0, gt_m0, valid0):
    """Fraction of valid keypoints correctly matched (reference
    utils/desc_evaluation.py:compute_matching_score:42)."""
    has_gt = gt_m0 >= 0
    correct = (m0 == gt_m0) & has_gt & valid0
    return correct.sum(-1) / jnp.maximum((has_gt & valid0).sum(-1), 1)
