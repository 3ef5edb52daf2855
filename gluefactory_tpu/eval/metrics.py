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


def _top_k_mask(scores, valid, k: int):
    """Boolean mask keeping the k highest-scoring valid entries per batch."""
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s, axis=-1)
    rank = jnp.argsort(order, axis=-1)  # rank of each entry in the sort
    return valid & (rank < k)


def symmetric_rep_loc_H(
    kpts0, kpts1, scores0, scores1, valid0, valid1, H_0to1,
    image_size0, image_size1, k: int = 300, th: float = 3.0,
):
    """Symmetric repeatability + localization error under a known homography
    (reference utils/kp_evaluation.py:compute_rep_loc_H:6-81): keep only
    keypoints whose warp lands inside the other view, keep the ``k``
    highest-scoring on each side, count re-detections both ways in the
    view-0 frame: rep = (count0 + count1) / (N0 + N1), loc = mean distance
    over the counted pairs. Batched, masked, jit-able. Returns
    (rep (B,), loc (B,))."""
    w0 = warp_points(kpts0, H_0to1)  # view-0 kps in view 1
    in1 = jnp.all((w0 >= 0) & (w0 <= image_size1[:, None, :] - 1), axis=-1)
    kp0_keep = _top_k_mask(scores0, valid0 & in1, k)

    H_1to0 = jnp.linalg.inv(H_0to1)
    w1 = warp_points(kpts1, H_1to0)  # view-1 kps in view 0
    in0 = jnp.all((w1 >= 0) & (w1 <= image_size0[:, None, :] - 1), axis=-1)
    kp1_keep = _top_k_mask(scores1, valid1 & in0, k)

    d = jnp.linalg.norm(kpts0[:, :, None, :] - w1[:, None, :, :], axis=-1)
    d = jnp.where(kp0_keep[:, :, None] & kp1_keep[:, None, :], d, jnp.inf)
    min0 = jnp.min(d, axis=-1)  # per view-0 kp
    min1 = jnp.min(d, axis=-2)  # per view-1 kp
    corr0 = (min0 <= th) & kp0_keep
    corr1 = (min1 <= th) & kp1_keep
    n0 = kp0_keep.sum(-1)
    n1 = kp1_keep.sum(-1)
    counts = corr0.sum(-1) + corr1.sum(-1)
    rep = counts / jnp.maximum(n0 + n1, 1)
    le = (jnp.where(corr0, min0, 0.0).sum(-1)
          + jnp.where(corr1, min1, 0.0).sum(-1))
    loc = le / jnp.maximum(counts, 1)
    rep = jnp.where(n0 + n1 > 0, rep, -1.0)
    loc = jnp.where(counts > 0, loc, -1.0)
    return rep, loc


def descriptor_matching_score_H(
    kpts0, kpts1, m0, valid0, H_0to1, image_size0, thresholds=(1.0, 3.0, 5.0)
):
    """Matching score of a matcher's output under a known homography
    (reference utils/desc_evaluation.py:compute_matching_score:42-65):
    fraction of matched pairs whose view-1 point, warped back into view 0,
    lands within ``th`` px of its view-0 partner (pairs warping outside the
    image are excluded). Returns a dict {th: score (B,)}."""
    matched = (m0 >= 0) & valid0
    idx = jnp.clip(m0, 0, None)
    m_kp1 = jnp.take_along_axis(kpts1, idx[..., None], axis=1)
    w1 = warp_points(m_kp1, jnp.linalg.inv(H_0to1))
    inside = jnp.all(
        (w1 >= 0) & (w1 <= image_size0[:, None, :] - 1), axis=-1
    )
    ok = matched & inside
    dist = jnp.linalg.norm(w1 - kpts0, axis=-1)
    denom = jnp.maximum(ok.sum(-1), 1)
    return {
        float(t): ((dist < t) & ok).sum(-1) / denom for t in thresholds
    }


def descriptor_homography_correctness(
    kpts0, desc0, valid0, kpts1, desc1, valid1, H_gt, image_size,
    thresholds=(1.0, 3.0, 5.0), ransac_th: float = 3.0,
):
    """Descriptor-quality probe (reference utils/desc_evaluation.py:
    compute_homography:67-110): mutual-NN match the shared keypoints, fit a
    homography with the device LO-RANSAC (replacing cv2.findHomography), and
    report corner correctness vs the GT homography. Host-facing, unbatched:
    returns ({th: 0/1}, mean corner error)."""
    import numpy as np

    from ..geometry.homography import homography_corner_error
    from ..robust_estimators import load_estimator

    # keep points whose warp lands in the other view (keep_shared_points)
    w0 = warp_points(kpts0, H_gt)
    keep0 = valid0 & jnp.all((w0 >= 0) & (w0 <= image_size - 1), axis=-1)
    w1 = warp_points(kpts1, H_gt, inverse=True)
    keep1 = valid1 & jnp.all((w1 >= 0) & (w1 <= image_size - 1), axis=-1)

    d = jnp.linalg.norm(desc0[:, None, :] - desc1[None, :, :], axis=-1)
    d = jnp.where(keep0[:, None] & keep1[None, :], d, jnp.inf)
    n0 = jnp.argmin(d, axis=1)
    n1 = jnp.argmin(d, axis=0)
    mutual = (jnp.take(n1, n0) == jnp.arange(kpts0.shape[0])) & keep0
    m_kpts1 = jnp.take(kpts1, n0, axis=0)

    if int(np.asarray(mutual.sum())) < 4:
        return {float(t): 0.0 for t in thresholds}, float("inf")
    est = load_estimator("homography", "ransac")({"ransac_th": ransac_th})
    result = est({"m_kpts0": kpts0, "m_kpts1": m_kpts1, "valid": mutual})
    if not result["success"]:
        return {float(t): 0.0 for t in thresholds}, float("inf")
    err = float(np.asarray(
        homography_corner_error(result["M_0to1"], H_gt, image_size)
    ))
    return {float(t): float(err <= t) for t in thresholds}, err
