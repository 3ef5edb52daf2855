"""Fused multi-head attention for the matcher transformers
(reference: gluefactory/models/matchers/lightglue.py:91-122 — torch SDPA /
FlashAttention; here a Pallas TPU kernel).

Two implementations behind one API:
  - ``attention_xla``: pure-jnp reference (runs everywhere, used on CPU test
    meshes and as the recompute backward);
  - ``attention_pallas``: a Pallas kernel that keeps K/V resident in VMEM and
    streams q in MXU-aligned blocks. Keypoint token counts (N <= 4096, head
    dim 64) are small enough that a full (block_q, Nk) score tile fits VMEM,
    so no online-softmax pass is needed; padding tokens are masked with a
    large negative bias and fully-masked rows produce zeros (static shapes —
    the TPU replacement for the reference's dynamic index_select pruning,
    SURVEY.md §5.7).

The public ``attention`` is differentiable: Pallas forward + analytic
recompute backward via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import guard: CPU test meshes take the XLA path.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

NEG_INF = -1e30


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pallas_usable() -> bool:
    """Pallas kernels hang when Mosaic compiles are proxied through a
    remote-compile tunnel (axon PALLAS_AXON_REMOTE_COMPILE); fall back to the
    XLA path there unless explicitly forced."""
    import os

    if os.environ.get("GFTPU_FORCE_PALLAS") == "1":
        return True
    if os.environ.get("GFTPU_DISABLE_PALLAS") == "1":
        return False
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
        return False
    return True


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reference scaled-dot-product attention.

    q (B, H, Nq, D), k/v (B, H, Nk, D), kv_mask (B, Nk) bool (True = keep).
    Fully-masked query rows return zeros.
    """
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - jax.lax.stop_gradient(m))
    if kv_mask is not None:
        e = jnp.where(kv_mask[:, None, None, :], e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-30)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (bq, D)
    k = k_ref[0].astype(jnp.float32)  # (Nk, D)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, Nk)
    mask = mask_ref[0] > 0  # (1, Nk) int mask row
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-30)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, size: int, axis: int, value=0.0) -> jnp.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, nq, d = q.shape
    nk = k.shape[2]
    scale = d**-0.5  # scale by the TRUE head dim, not the padded one
    nq_p = max(block_q, ((nq + block_q - 1) // block_q) * block_q)
    nk_p = max(128, ((nk + 127) // 128) * 128)
    d_p = max(128, ((d + 127) // 128) * 128)  # lane-dim tiling (128)
    if kv_mask is None:
        kv_mask = jnp.ones((b, nk), dtype=jnp.int32)
    else:
        kv_mask = kv_mask.astype(jnp.int32)
    qp = _pad_to(_pad_to(q.reshape(b * h, nq, d), nq_p, axis=1), d_p, axis=2)
    kp = _pad_to(_pad_to(k.reshape(b * h, nk, d), nk_p, axis=1), d_p, axis=2)
    vp = _pad_to(_pad_to(v.reshape(b * h, nk, d), nk_p, axis=1), d_p, axis=2)
    maskp = _pad_to(kv_mask, nk_p, axis=1, value=0)
    maskp = jnp.repeat(maskp[:, None, :], h, axis=0).reshape(b * h, 1, nk_p)

    grid = (b * h, nq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d_p), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d_p), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_p), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_p), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, d_p), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq_p * nk_p * d_p,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * nq_p * nk_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    return out[:, :nq, :d].reshape(b, h, nq, d)


def _attn_rotary_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, mask_ref, o_ref,
                        *, scale: float):
    """Self-attention with the rotary embedding FUSED into the kernel: q and k
    are rotated in VMEM right before the score matmul, so the rotated copies
    never round-trip HBM (reference applies rotary as a separate op,
    lightglue.py:42-44)."""
    def rot(x, cos, sin):
        x1 = x[:, 0::2]
        x2 = x[:, 1::2]
        # interleave(-x2, x1): reconstruct via stacking on a new trailing axis
        rx = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
        return x * cos + rx * sin

    cos = cos_ref[0].astype(jnp.float32)  # (bq, D) — q-block positions
    sin = sin_ref[0].astype(jnp.float32)
    q = rot(q_ref[0].astype(jnp.float32), cos, sin)
    k = k_ref[0].astype(jnp.float32)  # arrives pre-rotated (full token set)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    mask = mask_ref[0] > 0
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-30)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


def attention_pallas_rotary(
    q: jnp.ndarray,
    k_rotated: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Self-attention with q-rotary fused in-kernel. ``k_rotated`` must be
    pre-rotated (K is consumed whole per program, so rotating it once outside
    costs one pass; q is streamed in blocks and rotated in VMEM).
    cos/sin: (B, N, head_dim) shared across heads."""
    b, h, nq, d = q.shape
    nk = k_rotated.shape[2]
    scale = d**-0.5
    nq_p = max(block_q, ((nq + block_q - 1) // block_q) * block_q)
    nk_p = max(128, ((nk + 127) // 128) * 128)
    d_p = max(128, ((d + 127) // 128) * 128)
    if kv_mask is None:
        kv_mask = jnp.ones((b, nk), dtype=jnp.int32)
    else:
        kv_mask = kv_mask.astype(jnp.int32)
    qp = _pad_to(_pad_to(q.reshape(b * h, nq, d), nq_p, axis=1), d_p, axis=2)
    kp = _pad_to(_pad_to(k_rotated.reshape(b * h, nk, d), nk_p, axis=1), d_p, axis=2)
    vp = _pad_to(_pad_to(v.reshape(b * h, nk, d), nk_p, axis=1), d_p, axis=2)
    # cos/sin: broadcast over heads; pad rotary coeffs with cos=1, sin=0 so
    # the padded head-dim lanes stay untouched
    cosp = _pad_to(_pad_to(jnp.repeat(cos[:, None], h, 1).reshape(b * h, nq, d),
                           nq_p, axis=1, value=1.0), d_p, axis=2, value=1.0)
    sinp = _pad_to(_pad_to(jnp.repeat(sin[:, None], h, 1).reshape(b * h, nq, d),
                           nq_p, axis=1), d_p, axis=2)
    maskp = _pad_to(kv_mask, nk_p, axis=1, value=0)
    maskp = jnp.repeat(maskp[:, None, :], h, axis=0).reshape(b * h, 1, nk_p)
    grid = (b * h, nq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_rotary_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d_p), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d_p), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_p), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk_p), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d_p), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, d_p), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, cosp, sinp, maskp)
    return out[:, :nq, :d].reshape(b, h, nq, d)


# ---------------------------------------------------------------------------
# Differentiable dispatcher
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _attention_fused(q, k, v, kv_mask):
    return attention_pallas(q, k, v, kv_mask)


def _attention_fwd(q, k, v, kv_mask):
    return attention_pallas(q, k, v, kv_mask), (q, k, v, kv_mask)


def _attention_bwd(res, g):
    q, k, v, kv_mask = res
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    if kv_mask is not None:
        e = jnp.where(kv_mask[:, None, None, :], e, 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / denom
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, g)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    return dq, dk, dv, None


_attention_fused.defvjp(_attention_fwd, _attention_bwd)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention (B, H, N, D) with optional KV padding mask.

    implementation: 'auto' (Pallas on TPU, XLA elsewhere) | 'pallas' | 'xla'.
    """
    if implementation == "auto":
        implementation = (
            "pallas" if (_HAS_PLTPU and _on_tpu() and _pallas_usable()) else "xla"
        )
    if implementation == "ring":
        return _ring_dispatch(q, k, v, kv_mask)
    if implementation == "pallas":
        return _attention_fused(q, k, v, kv_mask)
    return attention_xla(q, k, v, kv_mask)


# ---------------------------------------------------------------------------
# Rotary position encoding (reference lightglue.py:42-89)
# ---------------------------------------------------------------------------


def rotary_encode_2d(
    kpts: jnp.ndarray, Wr: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Learnable-Fourier rotary frequencies from 2D positions
    (reference LearnableFourierPositionalEncoding, lightglue.py:46-60).

    kpts (B, N, 2) normalized coords, Wr (2, F) projection. Returns
    (cos, sin) each (B, N, 2F) ready for `apply_rotary`.
    """
    proj = kpts @ Wr  # (B, N, F)
    cos = jnp.cos(proj)
    sin = jnp.sin(proj)
    cos2 = jnp.repeat(cos, 2, axis=-1)
    sin2 = jnp.repeat(sin, 2, axis=-1)
    return cos2, sin2


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embedding over the last dim (pairs convention:
    rotate_half on even/odd interleaved pairs; reference lightglue.py:36-44).

    x (B, H, N, D); cos/sin (B, N, D)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos[:, None] + rot * sin[:, None]


# ---------------------------------------------------------------------------
# Fused rotary self-attention dispatcher (differentiable)
# ---------------------------------------------------------------------------


def _rotary_bwd_rotate(g, cos, sin):
    """Adjoint of apply_rotary: J = diag(cos) + diag(sin) P with P^T = -P and
    the repeated-pair cos/sin commuting with P, so J^T g = apply_rotary with
    -sin."""
    return apply_rotary(g, cos, -sin)


def _P(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


@jax.custom_vjp
def _self_attention_rotary_fused(q, k, v, cos, sin, kv_mask):
    k_rot = apply_rotary(k, cos, sin)
    return attention_pallas_rotary(q, k_rot, v, cos, sin, kv_mask)


def _sar_fwd(q, k, v, cos, sin, kv_mask):
    return _self_attention_rotary_fused(q, k, v, cos, sin, kv_mask), (
        q, k, v, cos, sin, kv_mask,
    )


def _sar_bwd(res, g):
    q, k, v, cos, sin, kv_mask = res
    qr = apply_rotary(q, cos, sin)
    kr = apply_rotary(k, cos, sin)
    dqr, dkr, dv, _ = _attention_bwd((qr, kr, v, kv_mask), g)
    dq = _rotary_bwd_rotate(dqr, cos, sin)
    dk = _rotary_bwd_rotate(dkr, cos, sin)
    # rotary-coefficient grads feed the learnable Fourier posenc:
    # d cos = sum_h dqr*q + dkr*k ; d sin = sum_h dqr*P(q) + dkr*P(k)
    dcos = jnp.sum(dqr * q + dkr * k, axis=1)
    dsin = jnp.sum(dqr * _P(q) + dkr * _P(k), axis=1)
    return dq, dk, dv, dcos, dsin, None


_self_attention_rotary_fused.defvjp(_sar_fwd, _sar_bwd)


def self_attention_rotary(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Rotary self-attention with the q-rotation fused into the Pallas kernel
    on TPU (reference applies rotary as a separate op before SDPA,
    lightglue.py:104-117 / 36-44). q/k/v (B, H, N, D); cos/sin (B, N, D)
    shared across heads; kv_mask (B, N) bool."""
    if implementation == "auto":
        implementation = (
            "pallas" if (_HAS_PLTPU and _on_tpu() and _pallas_usable()) else "xla"
        )
    if implementation == "pallas":
        return _self_attention_rotary_fused(q, k, v, cos, sin, kv_mask)
    qr = apply_rotary(q, cos, sin)
    kr = apply_rotary(k, cos, sin)
    if implementation == "ring":
        return _ring_dispatch(qr, kr, v, kv_mask)
    return attention_xla(qr, kr, v, kv_mask)


# ---------------------------------------------------------------------------
# Sequence-parallel (ring) dispatch
# ---------------------------------------------------------------------------

_RING_CTX: dict | None = None


class ring_context:
    """Route ``attention(..., implementation='ring')`` calls through
    parallel/ring_attention over the given mesh axis — models stay oblivious
    to the mesh (SURVEY.md §5.7 sequence-parallel plan):

        with ring_context(mesh, axis="seq"):
            pred = model.apply(params, data)   # attn_impl='ring' inside
    """

    def __init__(self, mesh, axis: str = "seq"):
        self.ctx = {"mesh": mesh, "axis": axis}

    def __enter__(self):
        global _RING_CTX
        self._prev = _RING_CTX
        _RING_CTX = self.ctx
        return self

    def __exit__(self, *exc):
        global _RING_CTX
        _RING_CTX = self._prev
        return False


def _ring_dispatch(q, k, v, kv_mask):
    if _RING_CTX is None:
        raise RuntimeError(
            "implementation='ring' requires an active ops.attention.ring_context"
        )
    from ..parallel.ring_attention import ring_attention

    if kv_mask is None:
        kv_mask = jnp.ones(k.shape[:1] + k.shape[2:3], bool)
    return ring_attention(
        q, k, v, mesh=_RING_CTX["mesh"], kv_mask=kv_mask,
        axis=_RING_CTX["axis"],
    )
