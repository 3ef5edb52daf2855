"""Batched line-segment distances and GT line matching
(reference: gluefactory/models/lines/line_distances.py,
gluefactory/geometry/gt_generation.py:208-557).

All distances broadcast over (..., L0, L1) pairs of segments (..., L, 2, 2).
GT line matching replaces the reference's per-image scipy Hungarian solver
(SURVEY.md §2.9) with greedy mutual-max assignment on device — the matrices
are built from sampled points reprojected by H or depth+pose."""

from __future__ import annotations

import jax.numpy as jnp

from .homography import warp_points

UNMATCHED = -1
IGNORE = -2


def point_to_seg_dist(points: jnp.ndarray, segs: jnp.ndarray) -> jnp.ndarray:
    """Distance of points (..., N, 2) to segments (..., M, 2, 2) -> (..., N, M)."""
    a = segs[..., None, :, 0, :]  # (..., 1, M, 2)
    b = segs[..., None, :, 1, :]
    p = points[..., :, None, :]  # (..., N, 1, 2)
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / (jnp.sum(ab * ab, axis=-1) + 1e-8)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return jnp.linalg.norm(p - proj, axis=-1)


def project_point_to_line(points: jnp.ndarray, segs: jnp.ndarray):
    """Orthogonal projection onto the infinite line; returns (dist, t)."""
    a = segs[..., None, :, 0, :]
    b = segs[..., None, :, 1, :]
    p = points[..., :, None, :]
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / (jnp.sum(ab * ab, axis=-1) + 1e-8)
    proj = a + t[..., None] * ab
    return jnp.linalg.norm(p - proj, axis=-1), t


def orth_line_dist(segs0: jnp.ndarray, segs1: jnp.ndarray) -> jnp.ndarray:
    """Mean orthogonal endpoint-to-line distance, symmetrized
    (reference utils/ls_evaluation.py:get_orth_line_dist:177). (..., L0, L1)."""
    ep0 = segs0.reshape(*segs0.shape[:-3], -1, 2)  # (..., 2*L0, 2)
    d01, _ = project_point_to_line(ep0, segs1)  # (..., 2*L0, L1)
    d01 = 0.5 * (d01[..., 0::2, :] + d01[..., 1::2, :])  # (..., L0, L1)
    ep1 = segs1.reshape(*segs1.shape[:-3], -1, 2)
    d10, _ = project_point_to_line(ep1, segs0)  # (..., 2*L1, L0)
    d10 = 0.5 * (d10[..., 0::2, :] + d10[..., 1::2, :])  # (..., L1, L0)
    return 0.5 * (d01 + jnp.swapaxes(d10, -1, -2))


def struct_line_dist(segs0: jnp.ndarray, segs1: jnp.ndarray) -> jnp.ndarray:
    """Structural distance: min over endpoint orderings of mean endpoint
    distance (reference line_distances.py). (..., L0, L1)."""
    a0 = segs0[..., :, None, 0, :]
    b0 = segs0[..., :, None, 1, :]
    a1 = segs1[..., None, :, 0, :]
    b1 = segs1[..., None, :, 1, :]
    d_s = jnp.linalg.norm(a0 - a1, axis=-1) + jnp.linalg.norm(b0 - b1, axis=-1)
    d_f = jnp.linalg.norm(a0 - b1, axis=-1) + jnp.linalg.norm(b0 - a1, axis=-1)
    return 0.5 * jnp.minimum(d_s, d_f)


def overlap_fraction(segs0: jnp.ndarray, segs1: jnp.ndarray) -> jnp.ndarray:
    """Fraction of segs0 overlapping segs1 when projected onto segs1's line
    (..., L0, L1)."""
    ep0 = segs0.reshape(*segs0.shape[:-3], -1, 2)
    _, t = project_point_to_line(ep0, segs1)  # (..., 2*L0, L1)
    t0 = t[..., 0::2, :]
    t1 = t[..., 1::2, :]
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    inter = jnp.clip(jnp.minimum(hi, 1.0) - jnp.maximum(lo, 0.0), 0.0, None)
    seg_len = jnp.maximum(hi - lo, 1e-8)
    return inter / seg_len


def sample_points_on_lines(lines: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """(..., L, 2, 2) -> (..., L, S, 2) uniformly spaced points."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    a = lines[..., 0, :][..., None, :]
    b = lines[..., 1, :][..., None, :]
    return a + t[:, None] * (b - a)


def _greedy_mutual_assignment(cost: jnp.ndarray, valid_pair: jnp.ndarray, th: float):
    """Mutual-min assignment with threshold; the batched stand-in for the
    reference's per-image Hungarian (gt_generation.py:367,515)."""
    inf = jnp.asarray(jnp.inf, cost.dtype)
    C = jnp.where(valid_pair, cost, inf)
    l0, l1 = C.shape[-2], C.shape[-1]
    min0 = jnp.min(C, axis=-1)
    arg0 = jnp.argmin(C, axis=-1)
    arg1 = jnp.argmin(C, axis=-2)
    mutual0 = jnp.take_along_axis(arg1, arg0, axis=-1) == jnp.arange(l0)
    mutual1 = jnp.take_along_axis(arg0, arg1, axis=-1) == jnp.arange(l1)
    pos0 = mutual0 & (min0 < th)
    min1 = jnp.min(C, axis=-2)
    pos1 = mutual1 & (min1 < th)
    return pos0, pos1, arg0, arg1


def gt_line_matches_from_pose_depth(
    lines0: jnp.ndarray,
    lines1: jnp.ndarray,
    valid0: jnp.ndarray,
    valid1: jnp.ndarray,
    depth0: jnp.ndarray,
    depth1: jnp.ndarray,
    camera0,
    camera1,
    T_0to1,
    n_samples: int = 16,
    dist_th: float = 5.0,
    overlap_th: float = 0.2,
    min_visible: float = 0.5,
) -> dict:
    """Depth+pose line supervision (reference gt_generation.py:208-409):
    sample points along each view-0 segment, reproject them through the depth
    map and relative pose, and match to view-1 segments by mean perpendicular
    distance with an overlap gate. Segments whose samples are mostly
    invisible (no depth / out of view) are IGNORE."""
    from .depth import project, sample_depth

    b, l0 = lines0.shape[:2]
    l1 = lines1.shape[1]
    pts0 = sample_points_on_lines(lines0, n_samples).reshape(b, l0 * n_samples, 2)
    d0, dvalid = sample_depth(pts0, depth0)
    pts0_in1, pvalid = project(
        pts0, d0, depth1, camera0, camera1, T_0to1, dvalid, ccth=0.05
    )
    pvalid = pvalid.reshape(b, l0, n_samples)
    pts0_in1 = pts0_in1.reshape(b, l0, n_samples, 2)
    vis_frac = pvalid.mean(axis=-1)
    visible0 = (vis_frac >= min_visible) & valid0
    # mean distance of VISIBLE reprojected samples to each candidate segment
    d = point_to_seg_dist(pts0_in1.reshape(b, l0 * n_samples, 2), lines1)
    d = d.reshape(b, l0, n_samples, l1)
    w = pvalid[..., None].astype(d.dtype)
    mean_d = jnp.sum(d * w, axis=2) / jnp.maximum(jnp.sum(w, axis=2), 1.0)
    # overlap of the visible reprojected span with the candidate
    first = jnp.argmax(pvalid, axis=-1)
    last = n_samples - 1 - jnp.argmax(pvalid[..., ::-1], axis=-1)
    ep0 = jnp.take_along_axis(pts0_in1, first[..., None, None].repeat(2, -1), axis=2)[:, :, 0]
    ep1 = jnp.take_along_axis(pts0_in1, last[..., None, None].repeat(2, -1), axis=2)[:, :, 0]
    warped_span = jnp.stack([ep0, ep1], axis=-2)
    ov = overlap_fraction(warped_span, lines1)
    valid_pair = visible0[..., :, None] & valid1[..., None, :] & (ov > overlap_th)
    pos0, pos1, arg0, arg1 = _greedy_mutual_assignment(mean_d, valid_pair, dist_th)
    m0 = jnp.where(pos0, arg0, jnp.where(visible0, UNMATCHED, IGNORE))
    m1 = jnp.where(pos1, arg1, jnp.where(valid1, UNMATCHED, IGNORE))
    assignment = (
        pos0[..., :, None] & (jnp.arange(l1) == arg0[..., :, None]) & pos1[..., None, :]
    )
    return {
        "line_matches0": m0.astype(jnp.int32),
        "line_matches1": m1.astype(jnp.int32),
        "line_assignment": assignment,
    }


def gt_line_matches_exact(
    cost: "np.ndarray",
    valid_pair: "np.ndarray",
    th: float,
) -> "np.ndarray":
    """Host-side EXACT assignment via the native batched JV solver
    (ops/lap.py, native/lap/lap.cpp) — the high-fidelity replacement for the
    reference's per-image scipy Hungarian (gt_generation.py:367,515). Used in
    offline GT generation; the jitted training path uses the greedy
    mutual-max above. cost (B, L0, L1) numpy; returns m0 (B, L0) int32."""
    import numpy as np

    from ..ops.lap import batch_linear_assignment

    BIG = 1e6
    c = np.where(np.asarray(valid_pair), np.asarray(cost), BIG).astype(np.float32)
    m0 = batch_linear_assignment(c)
    b_idx = np.arange(c.shape[0])[:, None]
    chosen_cost = c[b_idx, np.arange(c.shape[1])[None], np.clip(m0, 0, None)]
    m0 = np.where((m0 >= 0) & (chosen_cost < th), m0, UNMATCHED)
    return m0.astype(np.int32)


def gt_line_matches_from_homography(
    lines0: jnp.ndarray,
    lines1: jnp.ndarray,
    valid0: jnp.ndarray,
    valid1: jnp.ndarray,
    H_0to1: jnp.ndarray,
    n_samples: int = 16,
    dist_th: float = 5.0,
    overlap_th: float = 0.2,
) -> dict:
    """Reproject sampled points of lines0 into view 1 and match segments by
    perpendicular distance + overlap (reference gt_generation.py:410-557).

    Returns gt line match codes (-1 unmatched, -2 ignore) + assignment."""
    b = lines0.shape[0]
    pts0 = sample_points_on_lines(lines0, n_samples)  # (B, L0, S, 2)
    l0, l1 = lines0.shape[1], lines1.shape[1]
    pts0_in1 = warp_points(pts0.reshape(b, -1, 2), H_0to1).reshape(b, l0, n_samples, 2)
    # mean perpendicular distance of warped samples to each candidate segment
    d = point_to_seg_dist(pts0_in1.reshape(b, l0 * n_samples, 2), lines1)
    d = d.reshape(b, l0, n_samples, l1).mean(axis=2)  # (B, L0, L1)
    # overlap of the warped segment with the candidate
    warped_segs = jnp.stack([pts0_in1[..., 0, :], pts0_in1[..., -1, :]], axis=-2)
    ov = overlap_fraction(warped_segs, lines1)
    cost = d
    valid_pair = valid0[..., :, None] & valid1[..., None, :] & (ov > overlap_th)
    pos0, pos1, arg0, arg1 = _greedy_mutual_assignment(cost, valid_pair, dist_th)
    m0 = jnp.where(pos0, arg0, jnp.where(valid0, UNMATCHED, IGNORE))
    m1 = jnp.where(pos1, arg1, jnp.where(valid1, UNMATCHED, IGNORE))
    assignment = (
        pos0[..., :, None] & (jnp.arange(l1) == arg0[..., :, None]) & pos1[..., None, :]
    )
    return {
        "line_matches0": m0.astype(jnp.int32),
        "line_matches1": m1.astype(jnp.int32),
        "line_assignment": assignment,
    }


def merge_lines(
    segs: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float = 5.0,
    n_iters: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Merge overlapping near-collinear segments
    (reference models/lines/line_refinement.py:merge_lines:126-167 —
    re-designed static-shape: clustering is iterated min-label propagation
    over the adjacency matrix instead of a host connected-components pass,
    and every cluster is merged by projecting member endpoints onto its
    length-weighted mean direction).

    segs (B, L, 2, 2), valid (B, L). Returns (merged (B, L, 2, 2),
    merged_valid (B, L)) where each cluster survives in its lowest-index
    member slot.
    """
    b, n = segs.shape[:2]
    orth = orth_line_dist(segs, segs)
    ov01 = overlap_fraction(segs, segs)
    ov = jnp.maximum(ov01, jnp.swapaxes(ov01, -1, -2))
    pair_valid = valid[:, :, None] & valid[:, None, :]
    adj = (ov > 0.0) & (orth < thresh) & pair_valid
    adj = adj | (jnp.eye(n, dtype=bool)[None] & valid[:, :, None])
    # connected components: repeated min-label propagation (diameter of the
    # merge graphs is tiny; n_iters=8 covers chains of 2^8 segments)
    labels = jnp.where(valid, jnp.arange(n)[None], n)
    for _ in range(n_iters):
        neigh = jnp.where(adj, labels[:, None, :], n)
        labels = jnp.minimum(labels, jnp.min(neigh, axis=-1))
    onehot = (labels[:, :, None] == jnp.arange(n)[None, None]) & valid[:, :, None]
    onehot_f = onehot.astype(segs.dtype)  # (B, L members, L clusters)
    d = segs[:, :, 1] - segs[:, :, 0]
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    u = d / jnp.maximum(length, 1e-8)
    # sign-align member directions to the longest member's (cluster seed)
    len_in_cluster = onehot_f * length[:, :, 0][:, :, None]
    seed_idx = jnp.argmax(len_in_cluster, axis=1)  # (B, L clusters)
    seed_u = jnp.take_along_axis(u, seed_idx[..., None], axis=1)  # (B, C, 2)
    sign = jnp.sign(
        jnp.einsum("bld,bcd->blc", u, seed_u) + 1e-12
    )  # (B, L, C)
    w = onehot_f * length[:, :, 0][:, :, None]  # length-weighted
    mean_u = jnp.einsum("blc,blc,bld->bcd", w, sign, u)
    mean_u = mean_u / jnp.maximum(
        jnp.linalg.norm(mean_u, axis=-1, keepdims=True), 1e-8
    )
    center = jnp.einsum("blc,bld->bcd", w, 0.5 * (segs[:, :, 0] + segs[:, :, 1]))
    center = center / jnp.maximum(jnp.sum(w, axis=1)[..., None], 1e-8)
    # project all member endpoints onto the cluster axis, take the extent
    eps = segs.reshape(b, 2 * n, 2)
    t = jnp.einsum(
        "becd,bcd->bec", eps[:, :, None, :] - center[:, None, :, :], mean_u
    )
    member = jnp.repeat(onehot_f, 2, axis=1)  # (B, 2L, C)
    t_min = jnp.min(jnp.where(member > 0, t, jnp.inf), axis=1)
    t_max = jnp.max(jnp.where(member > 0, t, -jnp.inf), axis=1)
    p0 = center + t_min[..., None] * mean_u
    p1 = center + t_max[..., None] * mean_u
    merged = jnp.stack([p0, p1], axis=2)  # (B, C, 2, 2)
    merged_valid = (labels == jnp.arange(n)[None]) & valid
    merged = jnp.where(merged_valid[..., None, None], merged, 0.0)
    merged = jnp.where(jnp.isfinite(merged), merged, 0.0)
    return merged, merged_valid


def area_line_dist(segs0: jnp.ndarray, segs1: jnp.ndarray, lbd: float = 1.0 / 24.0) -> jnp.ndarray:
    """Length-unbiased 'area' line distance (reference
    utils/ls_evaluation.py:get_area_line_dist:125-174): asym(a, b) projects
    b's endpoints onto a's infinite line; intersecting pairs score the two
    enclosed triangles (h0^2 + h1^2) / (2 tan(theta) len(b)^2), non-
    intersecting pairs score lbd * min(h0, h1) + sin(2 theta) / 4;
    symmetrized over both directions. Exactly-collinear touching pairs
    (measure-zero orientation == 0 cases) take the non-intersecting branch,
    which coincides with the reference value there. (..., L0, L1)."""

    def _orient(p, q, r):
        return jnp.sign(
            (q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1])
            - (q[..., 1] - p[..., 1]) * (r[..., 0] - p[..., 0])
        )

    def asym(a, b):
        # pairwise expand: a over axis -2 of the output, b over axis -1
        a0 = a[..., :, None, 0, :]
        a1 = a[..., :, None, 1, :]
        b0 = b[..., None, :, 0, :]
        b1 = b[..., None, :, 1, :]
        d_a = a[..., 1, :] - a[..., 0, :]
        u_a = d_a / jnp.maximum(
            jnp.linalg.norm(d_a, axis=-1, keepdims=True), 1e-8)
        ua = u_a[..., :, None, :]
        d_b = b[..., 1, :] - b[..., 0, :]
        u_b = d_b / jnp.maximum(
            jnp.linalg.norm(d_b, axis=-1, keepdims=True), 1e-8)
        ub = u_b[..., None, :, :]
        len_b = jnp.linalg.norm(b1 - b0, axis=-1)

        # heights of b's endpoints over a's infinite line
        h0 = jnp.abs(
            (b0 - a0)[..., 0] * ua[..., 1] - (b0 - a0)[..., 1] * ua[..., 0])
        h1 = jnp.abs(
            (b1 - a0)[..., 0] * ua[..., 1] - (b1 - a0)[..., 1] * ua[..., 0])

        cos_t = jnp.abs(jnp.sum(ua * ub, axis=-1))
        sin_t = jnp.abs(
            ua[..., 0] * ub[..., 1] - ua[..., 1] * ub[..., 0])
        # arctan2 is exact at theta=0 where float32 arccos(|dot|) is noisy
        theta = jnp.arctan2(sin_t, cos_t)
        parallel = jnp.abs(theta) < 1e-8
        tan_t = jnp.where(parallel, 1.0, jnp.tan(theta))
        area = (h0**2 + h1**2) / (
            2.0 * tan_t * jnp.maximum(len_b, 1e-8) ** 2
        ) * (1.0 - parallel)

        o1 = _orient(a0, a1, b0)
        o2 = _orient(a0, a1, b1)
        o3 = _orient(b0, b1, a0)
        o4 = _orient(b0, b1, a1)
        crossing = (o1 != o2) & (o3 != o4)

        non_int = lbd * jnp.minimum(h0, h1) + 0.25 * jnp.sin(2.0 * theta)
        return jnp.where(crossing, area, non_int)

    return 0.5 * (asym(segs0, segs1) + jnp.swapaxes(asym(segs1, segs0), -1, -2))
