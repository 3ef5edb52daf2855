"""Ring attention: token-axis-sharded attention over a mesh axis
(SURVEY.md §5.7 — the sequence-parallel analog the reference lacks; for very
large token sets — dense grids, multi-view token unions — each device holds
N/d query tokens and KV blocks rotate around the ring with
`jax.lax.ppermute`, combining partial results with a streaming (online)
softmax so the full (N, N) score matrix never materializes on one device).

Implemented with `shard_map`; numerically identical to ops/attention.attention_xla
(tested on the 8-device CPU mesh)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_attn_local(q, k, v, kv_mask, axis: str):
    """q (B, H, nq_local, D); k/v (B, H, nk_local, D); kv_mask (B, nk_local).
    Streams KV blocks around the ring with a running online softmax."""
    n_dev = jax.lax.axis_size(axis)
    scale = q.shape[-1] ** -0.5

    def partial_attn(k_blk, v_blk, mask_blk):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk) * scale
        s = jnp.where(mask_blk[:, None, None, :], s, NEG_INF)
        m = jnp.max(s, axis=-1)  # (B, H, nq)
        e = jnp.exp(s - m[..., None])
        e = jnp.where(mask_blk[:, None, None, :], e, 0.0)
        l = jnp.sum(e, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", e, v_blk)
        return m, l, o

    def combine(acc, new):
        m_a, l_a, o_a = acc
        m_n, l_n, o_n = new
        m = jnp.maximum(m_a, m_n)
        ca = jnp.exp(m_a - m)
        cn = jnp.exp(m_n - m)
        return m, l_a * ca + l_n * cn, o_a * ca[..., None] + o_n * cn[..., None]

    def body(i, carry):
        acc, k_cur, v_cur, mask_cur = carry
        acc = combine(acc, partial_attn(k_cur, v_cur, mask_cur))
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        mask_cur = jax.lax.ppermute(mask_cur, axis, perm)
        return acc, k_cur, v_cur, mask_cur

    # derive the initial accumulators from q so they carry the same
    # device-varying type over the ring axis as the loop outputs
    init = (
        jnp.full_like(q[..., 0], NEG_INF),
        jnp.zeros_like(q[..., 0]),
        jnp.zeros_like(q),
    )
    (m, l, o), _, _, _ = jax.lax.fori_loop(0, n_dev, body, (init, k, v, kv_mask))
    return o / jnp.maximum(l, 1e-30)[..., None]


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    kv_mask: jnp.ndarray | None = None,
    axis: str = "seq",
) -> jnp.ndarray:
    """Full arrays in, full arrays out; the token axis (dim 2 of q/k/v and
    dim 1 of kv_mask) is sharded over ``axis`` internally. Token counts must
    be divisible by the axis size (pad + mask otherwise)."""
    if kv_mask is None:
        kv_mask = jnp.ones((k.shape[0], k.shape[2]), bool)

    fn = shard_map(
        functools.partial(_ring_attn_local, axis=axis),
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, axis),
        ),
        out_specs=P(None, None, axis, None),
    )
    return fn(q, k, v, kv_mask)
