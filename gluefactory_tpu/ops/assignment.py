"""Match assignment heads: sigmoid-matchability double-softmax (LightGlue),
Sinkhorn optimal transport (SuperGlue), dustbin double-softmax (GlueStick),
and mutual-argmax match filtering — all batched, static-shape, mask-aware.

(reference: gluefactory/models/matchers/lightglue.py:250-303,
 gluefactory_nonfree/superglue.py:150-205, matchers/gluestick.py:761-772)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def masked_log_softmax(x: jnp.ndarray, mask: jnp.ndarray | None, axis: int) -> jnp.ndarray:
    if mask is not None:
        x = jnp.where(mask, x, NEG_INF)
    m = jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    shifted = x - m
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    lse = jnp.log(jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1e-30))
    out = shifted - lse
    if mask is not None:
        out = jnp.where(mask, out, NEG_INF)
    return out


def sigmoid_log_double_softmax(
    sim: jnp.ndarray,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """LightGlue assignment (reference lightglue.py:250-262):
    P(i,j) = sigma(z0_i) * sigma(z1_j) * softmax_row(S)_ij * softmax_col(S)_ij
    in log space. sim (B, N, M); z0 (B, N); z1 (B, M). Returns log-assignment
    (B, N, M); padded slots are NEG_INF."""
    pair_mask = None
    if mask0 is not None or mask1 is not None:
        m0 = mask0 if mask0 is not None else jnp.ones(sim.shape[:2], bool)
        m1 = mask1 if mask1 is not None else jnp.ones((sim.shape[0], sim.shape[2]), bool)
        pair_mask = m0[:, :, None] & m1[:, None, :]
    certainties = jax.nn.log_sigmoid(z0)[..., None] + jax.nn.log_sigmoid(z1)[:, None]
    scores0 = masked_log_softmax(sim, pair_mask, axis=2)
    scores1 = masked_log_softmax(sim, pair_mask, axis=1)
    scores = scores0 + scores1 + certainties
    if pair_mask is not None:
        scores = jnp.where(pair_mask, scores, NEG_INF)
    return scores


def log_double_softmax(
    sim: jnp.ndarray,
    bin_score: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """GlueStick-style dustbin double softmax (reference gluestick.py:761-772):
    appends a learnable bin row/column before row/col softmax and averages.
    sim (B, N, M) -> (B, N+1, M+1) log-assignment."""
    b, n, m = sim.shape
    bin_ = jnp.broadcast_to(bin_score, (b, 1, 1)).astype(sim.dtype)
    row_aug = jnp.concatenate([sim, jnp.broadcast_to(bin_, (b, n, 1))], axis=2)
    col_aug = jnp.concatenate([sim, jnp.broadcast_to(bin_, (b, 1, m))], axis=1)
    rmask = None
    cmask = None
    if mask0 is not None or mask1 is not None:
        m0 = mask0 if mask0 is not None else jnp.ones((b, n), bool)
        m1 = mask1 if mask1 is not None else jnp.ones((b, m), bool)
        rmask = jnp.concatenate(
            [m0[:, :, None] & m1[:, None, :], m0[:, :, None]], axis=2
        )
        cmask = jnp.concatenate(
            [m0[:, :, None] & m1[:, None, :], m1[:, None, :]], axis=1
        )
    scores0 = masked_log_softmax(row_aug, rmask, axis=2)  # (B, N, M+1)
    scores1 = masked_log_softmax(col_aug, cmask, axis=1)  # (B, N+1, M)
    # corner (bin, bin) = 0 like the reference (gluestick.py:768); it is
    # never read by matching or the loss
    scores = jnp.zeros((b, n + 1, m + 1), dtype=sim.dtype)
    scores = scores.at[:, :n, :m].set(0.5 * (scores0[:, :, :m] + scores1[:, :n, :]))
    scores = scores.at[:, :n, m].set(scores0[:, :, m])
    scores = scores.at[:, n, :m].set(scores1[:, n, :])
    return scores


def log_sinkhorn_iterations(
    Z: jnp.ndarray, log_mu: jnp.ndarray, log_nu: jnp.ndarray, iters: int
) -> jnp.ndarray:
    """Sinkhorn in log space via lax.scan (reference superglue.py:150-168)."""

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(
    sim: jnp.ndarray,
    bin_score: jnp.ndarray,
    iters: int = 50,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SuperGlue entropic OT with dustbins (reference superglue.py:170-205).

    Returns (B, N+1, M+1) log-assignment. With padding masks, padded slots are
    routed to the dustbins by masking their similarity to NEG_INF and reducing
    the marginals accordingly."""
    b, n, m = sim.shape
    if mask0 is None:
        mask0 = jnp.ones((b, n), bool)
    if mask1 is None:
        mask1 = jnp.ones((b, m), bool)
    pair = mask0[:, :, None] & mask1[:, None, :]
    sim = jnp.where(pair, sim, NEG_INF)
    bins0 = jnp.broadcast_to(bin_score, (b, n, 1)).astype(sim.dtype)
    bins1 = jnp.broadcast_to(bin_score, (b, 1, m)).astype(sim.dtype)
    alpha = jnp.broadcast_to(bin_score, (b, 1, 1)).astype(sim.dtype)
    Z = jnp.concatenate(
        [
            jnp.concatenate([sim, bins0], axis=2),
            jnp.concatenate([bins1, alpha], axis=2),
        ],
        axis=1,
    )  # (B, N+1, M+1)
    n_valid = jnp.sum(mask0, axis=1).astype(sim.dtype)
    m_valid = jnp.sum(mask1, axis=1).astype(sim.dtype)
    num = n_valid + m_valid
    log_num = jnp.log(jnp.maximum(num, 1.0))
    zero = jnp.zeros_like(log_num)
    log_mu = jnp.concatenate(
        [
            jnp.where(mask0, zero[:, None], NEG_INF) - log_num[:, None],
            (jnp.log(jnp.maximum(m_valid, 1e-30)) - log_num)[:, None],
        ],
        axis=1,
    )
    log_nu = jnp.concatenate(
        [
            jnp.where(mask1, zero[:, None], NEG_INF) - log_num[:, None],
            (jnp.log(jnp.maximum(n_valid, 1e-30)) - log_num)[:, None],
        ],
        axis=1,
    )
    Z = log_sinkhorn_iterations(Z / 1.0, log_mu, log_nu, iters)
    Z = Z + log_num[:, None, None]  # multiply probabilities by N+M
    return Z


def filter_matches(scores: jnp.ndarray, threshold: float) -> dict:
    """Mutual-argmax + threshold match extraction
    (reference lightglue.py:287-303). scores: (B, N, M) log-assignment (no
    dustbin) — for dustbin variants pass scores[:, :-1, :-1].

    Returns matches0 (B, N) int32 (-1 = unmatched), matches1 (B, M),
    matching_scores0/1 (exp of log-score at the match)."""
    b, n, m = scores.shape
    max0 = jnp.max(scores, axis=2)
    m0 = jnp.argmax(scores, axis=2)
    max1 = jnp.max(scores, axis=1)
    m1 = jnp.argmax(scores, axis=1)
    idx0 = jnp.arange(n)[None]
    idx1 = jnp.arange(m)[None]
    mutual0 = idx0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = idx1 == jnp.take_along_axis(m0, m1, axis=1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    matches0 = jnp.where(valid0, m0, -1).astype(jnp.int32)
    matches1 = jnp.where(valid1, m1, -1).astype(jnp.int32)
    return {
        "matches0": matches0,
        "matches1": matches1,
        "matching_scores0": mscores0,
        "matching_scores1": mscores1,
    }
