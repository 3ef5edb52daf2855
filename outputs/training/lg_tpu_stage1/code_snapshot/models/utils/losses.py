"""Matcher losses (reference: gluefactory/models/utils/losses.py:28-73).

NLL over the log-assignment with positive/negative balancing. All terms are
mask-weighted sums over static-shape tensors; match codes follow the
reference convention (-1 unmatched, -2 ignore)."""

from __future__ import annotations

import jax.numpy as jnp


def nll_loss(
    log_assignment: jnp.ndarray,
    gt_matches0: jnp.ndarray,
    gt_matches1: jnp.ndarray,
    gt_assignment: jnp.ndarray | None = None,
    balance: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Negative log-likelihood of the GT assignment.

    log_assignment: (B, N+1, M+1) if it has dustbins, else (B, N, M) — the
    shape decides how unmatched points are supervised.
    Returns (total (B,), nll_pos (B,), nll_neg (B,))."""
    b, n_rows, m_cols = log_assignment.shape
    has_bins = True  # callers pass (N+1, M+1); LightGlue passes matchability separately
    n, m = n_rows - 1, m_cols - 1

    pos0 = gt_matches0 >= 0  # (B, N)
    pos1 = gt_matches1 >= 0
    neg0 = gt_matches0 == -1
    neg1 = gt_matches1 == -1

    idx0 = jnp.clip(gt_matches0, 0, m - 1)
    ll_pos0 = jnp.take_along_axis(
        log_assignment[:, :n, :m], idx0[..., None], axis=2
    )[..., 0]
    num_pos = jnp.maximum(pos0.sum(axis=1), 1.0)
    nll_pos = -jnp.sum(jnp.where(pos0, ll_pos0, 0.0), axis=1) / num_pos

    ll_neg0 = log_assignment[:, :n, m]  # row dustbin
    ll_neg1 = log_assignment[:, n, :m]  # col dustbin
    num_neg = jnp.maximum(neg0.sum(axis=1) + neg1.sum(axis=1), 1.0)
    nll_neg = -(
        jnp.sum(jnp.where(neg0, ll_neg0, 0.0), axis=1)
        + jnp.sum(jnp.where(neg1, ll_neg1, 0.0), axis=1)
    ) / num_neg
    if balance:
        total = 0.5 * (nll_pos + nll_neg)
    else:
        total = (nll_pos * num_pos + nll_neg * num_neg) / jnp.maximum(
            num_pos + num_neg, 1.0
        )
    return total, nll_pos, nll_neg


def nll_loss_no_bins(
    scores: jnp.ndarray,
    matchability0: jnp.ndarray,
    matchability1: jnp.ndarray,
    gt_matches0: jnp.ndarray,
    gt_matches1: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LightGlue deep-supervision NLL (reference lightglue.py:560-609):
    positives supervised through the (N, M) log-assignment; negatives through
    log(1 - sigma(z)) of the matchability logits."""
    b, n, m = scores.shape
    pos0 = gt_matches0 >= 0
    neg0 = gt_matches0 == -1
    neg1 = gt_matches1 == -1
    idx0 = jnp.clip(gt_matches0, 0, m - 1)
    ll_pos = jnp.take_along_axis(scores, idx0[..., None], axis=2)[..., 0]
    num_pos = jnp.maximum(pos0.sum(axis=1), 1.0)
    nll_pos = -jnp.sum(jnp.where(pos0, ll_pos, 0.0), axis=1) / num_pos
    # log(1 - sigmoid(z)) = log_sigmoid(-z) = -softplus(z)
    ll_un0 = -jnp.logaddexp(0.0, matchability0)
    ll_un1 = -jnp.logaddexp(0.0, matchability1)
    num_neg = jnp.maximum(neg0.sum(axis=1) + neg1.sum(axis=1), 1.0)
    nll_neg = -(
        jnp.sum(jnp.where(neg0, ll_un0, 0.0), axis=1)
        + jnp.sum(jnp.where(neg1, ll_un1, 0.0), axis=1)
    ) / num_neg
    return 0.5 * (nll_pos + nll_neg), nll_pos, nll_neg
