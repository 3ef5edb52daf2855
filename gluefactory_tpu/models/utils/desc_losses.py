"""Descriptor losses over warped correspondences
(reference: gluefactory/geometry/desc_losses.py:10-286 — triplet / NLL / CAPS
window losses used by POLD2/JPLDD descriptor training).

All take two descriptor sets with a GT correspondence (from
gt_matches_from_homography / pose_depth) and are batched + mask-aware."""

from __future__ import annotations

import jax.numpy as jnp


def triplet_loss(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    gt_matches0: jnp.ndarray,
    margin: float = 0.5,
    valid0: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Hardest-in-batch triplet margin loss (reference desc_losses.py:10-80):
    positive = GT correspondence similarity; negative = hardest non-match.
    Returns (B,)."""
    sim = jnp.einsum("bnd,bmd->bnm", desc0, desc1)  # cosine similarities
    b, n, m = sim.shape
    has_gt = gt_matches0 >= 0
    idx = jnp.clip(gt_matches0, 0, m - 1)
    pos = jnp.take_along_axis(sim, idx[..., None], axis=2)[..., 0]
    # hardest negative: max similarity excluding the GT column
    neg_mask = jnp.arange(m)[None, None, :] == idx[..., None]
    neg = jnp.max(jnp.where(neg_mask, -jnp.inf, sim), axis=-1)
    loss = jnp.maximum(0.0, margin - pos + neg)
    w = has_gt
    if valid0 is not None:
        w = w & valid0
    w = w.astype(loss.dtype)
    return jnp.sum(loss * w, axis=-1) / jnp.maximum(w.sum(-1), 1.0)


def nll_desc_loss(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    gt_matches0: jnp.ndarray,
    temperature: float = 0.07,
    valid0: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """InfoNCE-style NLL: softmax over all view-1 descriptors, NLL of the GT
    correspondence (reference desc_losses.py:90-170). Returns (B,)."""
    sim = jnp.einsum("bnd,bmd->bnm", desc0, desc1) / temperature
    log_p = sim - _logsumexp(sim, axis=-1)
    b, n, m = sim.shape
    has_gt = gt_matches0 >= 0
    idx = jnp.clip(gt_matches0, 0, m - 1)
    ll = jnp.take_along_axis(log_p, idx[..., None], axis=2)[..., 0]
    w = has_gt
    if valid0 is not None:
        w = w & valid0
    w = w.astype(ll.dtype)
    return -jnp.sum(ll * w, axis=-1) / jnp.maximum(w.sum(-1), 1.0)


def mutual_detected_matches(
    kp0: jnp.ndarray,
    kp1: jnp.ndarray,
    valid0: jnp.ndarray,
    valid1: jnp.ndarray,
    H_0to1: jnp.ndarray,
    th: float = 3.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GT correspondences between two sets of DETECTED keypoints under a
    homography: mutual nearest within ``th`` px after warping (the standard
    two-view descriptor-supervision pairing, reference
    geometry/gt_generation.py:gt_matches_from_homography). kp* are
    index-convention pixel coords (B, N, 2). Returns (matches0, matches1)
    with -1 for unmatched."""
    from ...geometry.homography import warp_points

    wkp0 = warp_points(kp0, H_0to1)
    big = 1e12
    d2 = jnp.sum((wkp0[:, :, None, :] - kp1[:, None, :, :]) ** 2, -1)
    d2 = jnp.where(valid1[:, None, :], d2, big)
    d2 = jnp.where(valid0[:, :, None], d2, big)
    j01 = jnp.argmin(d2, axis=2)
    ok01 = (jnp.min(d2, axis=2) < th**2) & valid0
    i10 = jnp.argmin(d2, axis=1)
    ok10 = (jnp.min(d2, axis=1) < th**2) & valid1
    n0, n1 = kp0.shape[1], kp1.shape[1]
    mut01 = jnp.take_along_axis(i10, j01, axis=1) == jnp.arange(n0)[None]
    mut10 = jnp.take_along_axis(j01, i10, axis=1) == jnp.arange(n1)[None]
    m0 = jnp.where(ok01 & mut01, j01, -1)
    m1 = jnp.where(ok10 & mut10, i10, -1)
    return m0, m1


def _logsumexp(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))


def caps_window_loss(
    desc0: jnp.ndarray,
    kpts0_in1: jnp.ndarray,
    desc_map1: jnp.ndarray,
    window: int = 8,
    temperature: float = 0.07,
    valid0: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CAPS-style expected-position loss (reference desc_losses.py:180-286):
    correlate each view-0 descriptor with a window of the dense view-1
    descriptor map around the GT reprojection; loss = distance between the
    softmax-expected position and the GT position. Returns (B,)."""
    from ...ops.interpolate import bilinear_sample

    b, n, d = desc0.shape
    r = window / 2.0
    ks = 9  # samples per axis inside the window
    lin = jnp.linspace(-r, r, ks)
    dy, dx = jnp.meshgrid(lin, lin, indexing="ij")
    offsets = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (ks*ks, 2)
    pts = kpts0_in1[:, :, None, :] + offsets[None, None]
    feats = bilinear_sample(desc_map1, pts.reshape(b, n * ks * ks, 2))
    feats = feats.reshape(b, n, ks * ks, -1)
    feats = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
    corr = jnp.einsum("bnd,bnkd->bnk", desc0, feats) / temperature
    p = jnp.exp(corr - _logsumexp(corr, axis=-1))
    expected = jnp.einsum("bnk,kc->bnc", p, offsets)
    # GT offset is 0 by construction. eps-smoothed norm: a fully-clamped
    # out-of-image window gives identical taps -> uniform p -> expected == 0
    # exactly, where d|v|/dv is NaN and even a 0 mask weight propagates it
    err = jnp.sqrt(jnp.sum(expected**2, axis=-1) + 1e-12)
    if valid0 is None:
        valid0 = jnp.ones(err.shape, bool)
    w = valid0.astype(err.dtype)
    return jnp.sum(err * w, axis=-1) / jnp.maximum(w.sum(-1), 1.0)
