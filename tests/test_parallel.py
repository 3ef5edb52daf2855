import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.ops.attention import attention_xla
from gluefactory_tpu.parallel import get_mesh, ring_attention

rng = np.random.default_rng(81)


def test_get_mesh_axes(devices):
    mesh = get_mesh({"data": 2, "seq": -1}, devices=jax.devices()[:8])
    assert mesh.shape == {"data": 2, "seq": 4}


def test_ring_attention_matches_dense(devices):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    b, h, n, d = 2, 2, 64, 16  # n divisible by 8
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, n)) > 0.2)
    mesh = get_mesh({"seq": 8})
    out_ring = ring_attention(q, k, v, mesh, kv_mask=mask, axis="seq")
    out_ref = attention_xla(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_ref), atol=2e-5)


def test_ring_attention_cross(devices):
    """Cross-attention shape: queries and keys from different token sets."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    b, h, nq, nk, d = 1, 2, 32, 64, 16
    q = jnp.asarray(rng.normal(size=(b, h, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, nk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, nk, d)), jnp.float32)
    mesh = get_mesh({"seq": 8})
    out = ring_attention(q, k, v, mesh, axis="seq")
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
