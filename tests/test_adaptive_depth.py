"""Adaptive-depth early exit (batch-wide lax.cond) and the fused-rotary
self-attention dispatcher."""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import build_model
from gluefactory_tpu.ops.attention import (
    apply_rotary,
    attention_xla,
    self_attention_rotary,
)

BASE = dict(
    input_dim=32, descriptor_dim=32, n_layers=4, num_heads=2,
    flash=False, checkpointed=False, save_layer_outputs=False,
)


def make_data(B=2, N=48, D=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "keypoints0": jnp.asarray(rng.uniform(0, 128, (B, N, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 128, (B, N, 2)), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "view0": {"image_size": jnp.full((B, 2), 128.0)},
        "view1": {"image_size": jnp.full((B, 2), 128.0)},
    }


def test_adaptive_no_exit_matches_full_depth():
    data = make_data()
    plain = build_model("matchers.lightglue", BASE)
    params = plain.init(jax.random.key(0), data)
    p_ref = plain.apply(params, data)
    # threshold no ratio can exceed -> exit only at the last layer
    adap = build_model("matchers.lightglue", dict(BASE, depth_confidence=2.0))
    p_ad = adap.apply(params, data)
    assert int(p_ad["exit_layer"]) == BASE["n_layers"] - 1
    np.testing.assert_allclose(
        np.asarray(p_ad["log_assignment"]), np.asarray(p_ref["log_assignment"]),
        atol=1e-3, rtol=1e-4,  # cond changes XLA fusion order slightly
    )
    np.testing.assert_array_equal(
        np.asarray(p_ad["matches0"]), np.asarray(p_ref["matches0"])
    )


def test_adaptive_exit_uses_exit_layer_head():
    """When the exit fires at layer k, the output must equal a plain forward
    of a (k+1)-layer model on the same params — i.e. the k-th assignment head
    scores the matches (reference lightglue.py:495-497), not the last one."""
    data = make_data(seed=3)
    plain = build_model("matchers.lightglue", BASE)
    params = plain.init(jax.random.key(1), data)
    # tiny positive threshold -> any confidence ratio passes -> exit at 0
    adap = build_model("matchers.lightglue", dict(BASE, depth_confidence=1e-6))
    p_ad = adap.apply(params, data)
    k = int(p_ad["exit_layer"])
    assert k == 0
    trunc = build_model("matchers.lightglue", dict(BASE, n_layers=k + 1))
    p_tr = trunc.apply(params, data)
    np.testing.assert_allclose(
        np.asarray(p_ad["log_assignment"]), np.asarray(p_tr["log_assignment"]),
        atol=1e-3, rtol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(p_ad["matches0"]), np.asarray(p_tr["matches0"])
    )


def test_adaptive_width_masks_tokens():
    data = make_data(seed=5)
    model = build_model(
        "matchers.lightglue", dict(BASE, width_confidence=0.99,
                                   depth_confidence=2.0)
    )
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert "prune0" in pred and pred["prune0"].shape == data["keypoints0"].shape[:2]
    assert np.isfinite(np.asarray(pred["log_assignment"])).all()


def test_fused_rotary_dispatcher_equals_unfused():
    rng = np.random.default_rng(0)
    B, H, N, D = 2, 2, 64, 32
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
               for _ in range(3))
    cos = jnp.asarray(np.cos(rng.normal(size=(B, N, D))), jnp.float32)
    sin = jnp.asarray(np.sin(rng.normal(size=(B, N, D))), jnp.float32)
    # repeated-pair convention as produced by rotary_encode_2d
    cos = jnp.repeat(cos[..., 0::2], 2, -1)
    sin = jnp.repeat(sin[..., 0::2], 2, -1)
    mask = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)
    out = self_attention_rotary(q, k, v, cos, sin, mask, implementation="xla")
    ref = attention_xla(
        apply_rotary(q, cos, sin), apply_rotary(k, cos, sin), v, mask
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_rotary_custom_vjp_grads():
    """The Pallas path's hand-written VJP must agree with autodiff through
    the unfused XLA composition (checked via the pure-jnp forward: the
    custom_vjp math is backend-independent)."""
    from gluefactory_tpu.ops.attention import _sar_bwd

    rng = np.random.default_rng(1)
    B, H, N, D = 1, 2, 32, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
               for _ in range(3))
    base = jnp.asarray(rng.normal(size=(B, N, D // 2)), jnp.float32)
    cos = jnp.repeat(jnp.cos(base), 2, -1)
    sin = jnp.repeat(jnp.sin(base), 2, -1)
    mask = jnp.ones((B, N), bool)

    def ref_fn(q, k, v, cos, sin):
        return attention_xla(
            apply_rotary(q, cos, sin), apply_rotary(k, cos, sin), v, mask
        ).sum()

    grads_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3, 4))(q, k, v, cos, sin)
    g = jnp.ones((B, H, N, D), jnp.float32)
    res = (q, k, v, cos, sin, mask)  # _sar_fwd residuals are the raw inputs
    dq, dk, dv, dcos, dsin, _ = _sar_bwd(res, g)
    for got, want, name in [
        (dq, grads_ref[0], "dq"), (dk, grads_ref[1], "dk"),
        (dv, grads_ref[2], "dv"), (dcos, grads_ref[3], "dcos"),
        (dsin, grads_ref[4], "dsin"),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, err_msg=name
        )
