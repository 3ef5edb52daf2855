"""Ground-truth match generation for matcher supervision
(reference: gluefactory/geometry/gt_generation.py).

Match codes (reference gt_generation.py:9-10): ``m0[i] = j`` means keypoint i
of view 0 matches keypoint j of view 1; ``-1`` = confidently unmatched
(negative), ``-2`` = ignore (no supervision).

Everything is fully batched with static shapes: padded keypoint slots carry
``valid`` masks and end up as IGNORE. No per-image Python loops — this runs
inside the jitted training step, unlike the reference's host-side scipy path.
"""

from __future__ import annotations

import jax.numpy as jnp

from .depth import project, sample_depth
from .homography import warp_points
from .wrappers import Camera, Pose

UNMATCHED = -1
IGNORE = -2


def _gt_from_dist(
    D: jnp.ndarray,
    reproj_valid0: jnp.ndarray,
    reproj_valid1: jnp.ndarray,
    valid0: jnp.ndarray,
    valid1: jnp.ndarray,
    pos_th: float,
    neg_th: float,
) -> dict:
    """Shared assignment logic from a pairwise distance matrix D (..., N, M).

    positive: mutual nearest neighbours with D < pos_th (both directions);
    negative: valid reprojection but all distances > neg_th;
    ignore: everything else (incl. padded slots).
    (reference gt_generation.py:14-106, re-derived)
    """
    inf = jnp.asarray(jnp.inf, D.dtype)
    pair_valid = (
        valid0[..., :, None] & valid1[..., None, :]
        & (reproj_valid0[..., :, None] | reproj_valid1[..., None, :])
    )
    Dm = jnp.where(pair_valid, D, inf)
    n, m = D.shape[-2], D.shape[-1]
    min0 = jnp.min(Dm, axis=-1)  # (..., N)
    min1 = jnp.min(Dm, axis=-2)  # (..., M)
    arg0 = jnp.argmin(Dm, axis=-1)
    arg1 = jnp.argmin(Dm, axis=-2)
    idx_n = jnp.arange(n)
    idx_m = jnp.arange(m)
    mutual0 = jnp.take_along_axis(arg1, arg0, axis=-1) == idx_n
    mutual1 = jnp.take_along_axis(arg0, arg1, axis=-1) == idx_m
    pos0 = mutual0 & (min0 < pos_th) & valid0
    pos1 = mutual1 & (min1 < pos_th) & valid1
    # Negative only when the reprojection was valid so "far from everything"
    # is meaningful.
    neg0 = (min0 > neg_th) & reproj_valid0 & valid0
    neg1 = (min1 > neg_th) & reproj_valid1 & valid1
    m0 = jnp.where(pos0, arg0, jnp.where(neg0, UNMATCHED, IGNORE))
    m1 = jnp.where(pos1, arg1, jnp.where(neg1, UNMATCHED, IGNORE))
    # A positive pair (i, arg0[i]) is symmetric by mutuality; build the matrix.
    assignment = pos0[..., :, None] & (jnp.arange(m) == arg0[..., :, None]) & pos1[
        ..., None, :
    ]
    return {
        "assignment": assignment,
        "matches0": m0.astype(jnp.int32),
        "matches1": m1.astype(jnp.int32),
        "matching_scores0": pos0.astype(D.dtype),
        "matching_scores1": pos1.astype(D.dtype),
    }


def gt_matches_from_pose_depth(
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    depth0: jnp.ndarray,
    depth1: jnp.ndarray,
    camera0: Camera,
    camera1: Camera,
    T_0to1: Pose,
    valid0: jnp.ndarray | None = None,
    valid1: jnp.ndarray | None = None,
    pos_th: float = 3.0,
    neg_th: float = 5.0,
    ccth: float = 0.05,
) -> dict:
    """Depth+pose supervision (reference gt_generation.py:14-106): reproject
    each keypoint set into the other view with cycle-consistency, take the max
    of the two reprojection distances, then mutual-nearest thresholding."""
    if valid0 is None:
        valid0 = jnp.ones(kpts0.shape[:-1], dtype=bool)
    if valid1 is None:
        valid1 = jnp.ones(kpts1.shape[:-1], dtype=bool)
    d0, dvalid0 = sample_depth(kpts0, depth0)
    d1, dvalid1 = sample_depth(kpts1, depth1)
    kpts0_in1, rv0 = project(
        kpts0, d0, depth1, camera0, camera1, T_0to1, dvalid0, ccth
    )
    kpts1_in0, rv1 = project(
        kpts1, d1, depth0, camera1, camera0, T_0to1.inv(), dvalid1, ccth
    )
    dist0 = jnp.linalg.norm(kpts0_in1[..., :, None, :] - kpts1[..., None, :, :], axis=-1)
    dist1 = jnp.linalg.norm(kpts0[..., :, None, :] - kpts1_in0[..., None, :, :], axis=-1)
    inf = jnp.asarray(jnp.inf, dist0.dtype)
    both = rv0[..., :, None] & rv1[..., None, :]
    one_sided = jnp.minimum(
        jnp.where(rv0[..., :, None], dist0, inf),
        jnp.where(rv1[..., None, :], dist1, inf),
    )
    dist = jnp.where(both, jnp.maximum(dist0, dist1), one_sided)
    out = _gt_from_dist(dist, rv0, rv1, valid0, valid1, pos_th, neg_th)
    out["reproj_0to1"] = kpts0_in1
    out["reproj_1to0"] = kpts1_in0
    out["visible0"] = rv0
    out["visible1"] = rv1
    return out


def gt_matches_from_homography(
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    H_0to1: jnp.ndarray,
    image_size0=None,
    image_size1=None,
    valid0: jnp.ndarray | None = None,
    valid1: jnp.ndarray | None = None,
    pos_th: float = 3.0,
    neg_th: float = 6.0,
) -> dict:
    """Homography supervision (reference gt_generation.py:110-205)."""
    if valid0 is None:
        valid0 = jnp.ones(kpts0.shape[:-1], dtype=bool)
    if valid1 is None:
        valid1 = jnp.ones(kpts1.shape[:-1], dtype=bool)
    kpts0_in1 = warp_points(kpts0, H_0to1)
    kpts1_in0 = warp_points(kpts1, H_0to1, inverse=True)
    dist0 = jnp.linalg.norm(kpts0_in1[..., :, None, :] - kpts1[..., None, :, :], axis=-1)
    dist1 = jnp.linalg.norm(kpts0[..., :, None, :] - kpts1_in0[..., None, :, :], axis=-1)
    dist = jnp.maximum(dist0, dist1)
    rv0 = valid0
    rv1 = valid1
    if image_size1 is not None:
        sz1 = jnp.asarray(image_size1)[..., None, :]
        rv0 = rv0 & jnp.all((kpts0_in1 >= 0) & (kpts0_in1 <= sz1 - 1), axis=-1)
    if image_size0 is not None:
        sz0 = jnp.asarray(image_size0)[..., None, :]
        rv1 = rv1 & jnp.all((kpts1_in0 >= 0) & (kpts1_in0 <= sz0 - 1), axis=-1)
    out = _gt_from_dist(dist, rv0, rv1, valid0, valid1, pos_th, neg_th)
    out["reproj_0to1"] = kpts0_in1
    out["reproj_1to0"] = kpts1_in0
    out["visible0"] = rv0
    out["visible1"] = rv1
    return out
