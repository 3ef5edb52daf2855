import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.ops.assignment import (
    filter_matches,
    log_double_softmax,
    log_optimal_transport,
    sigmoid_log_double_softmax,
)
from gluefactory_tpu.ops.attention import apply_rotary, attention_xla
from gluefactory_tpu.ops.interpolate import bilinear_sample, sample_descriptors
from gluefactory_tpu.ops.nms import select_top_k_keypoints, simple_nms

rng = np.random.default_rng(1)


def test_simple_nms_keeps_isolated_maxima():
    scores = np.zeros((1, 32, 32), np.float32)
    scores[0, 5, 5] = 1.0
    scores[0, 5, 7] = 0.5  # within radius of the max -> suppressed
    scores[0, 20, 20] = 0.8
    out = np.asarray(simple_nms(jnp.asarray(scores), radius=2))
    assert out[0, 5, 5] == 1.0
    assert out[0, 5, 7] == 0.0
    assert out[0, 20, 20] == 0.8


def test_select_top_k():
    scores = np.zeros((2, 16, 16), np.float32)
    scores[0, 3, 4] = 0.9
    scores[0, 10, 2] = 0.7
    scores[1, 8, 8] = 0.5
    kpts, s, valid = select_top_k_keypoints(jnp.asarray(scores), k=4, threshold=0.1)
    kpts, s, valid = map(np.asarray, (kpts, s, valid))
    assert valid[0].sum() == 2 and valid[1].sum() == 1
    assert (kpts[0, 0] == [4, 3]).all()
    assert s[0, 0] == 0.9


def test_bilinear_sample_exact_at_centers():
    fmap = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    pts = jnp.asarray([[[2.0, 3.0], [5.0, 1.0]]])
    out = np.asarray(bilinear_sample(jnp.asarray(fmap), pts))
    np.testing.assert_allclose(out[0, 0], fmap[0, 3, 2], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], fmap[0, 1, 5], atol=1e-6)


def test_bilinear_sample_interpolates():
    fmap = np.zeros((1, 4, 4, 1), np.float32)
    fmap[0, 1, 1, 0] = 1.0
    fmap[0, 1, 2, 0] = 3.0
    out = np.asarray(bilinear_sample(jnp.asarray(fmap), jnp.asarray([[[1.5, 1.0]]])))
    np.testing.assert_allclose(out[0, 0, 0], 2.0, atol=1e-6)


def test_sample_descriptors_normalized():
    fmap = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    kpts = jnp.asarray(rng.uniform(0, 63, size=(1, 10, 2)).astype(np.float32))
    out = np.asarray(sample_descriptors(jnp.asarray(fmap), kpts, stride=8))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_attention_matches_naive():
    b, h, n, m, d = 2, 4, 16, 24, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    out = attention_xla(q, k, v)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_attention_mask_ignores_padding():
    b, h, n, d = 1, 2, 8, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    mask = jnp.asarray([[True] * 5 + [False] * 3])
    out_masked = attention_xla(q, k, v, kv_mask=mask)
    out_trunc = attention_xla(q, k[:, :, :5], v[:, :, :5])
    np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_trunc), atol=1e-5)


def test_rotary_preserves_norm_and_relativity():
    b, h, n, d = 1, 1, 6, 32
    x = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    theta = jnp.asarray(rng.normal(size=(b, n, d // 2)), jnp.float32)
    cos = jnp.repeat(jnp.cos(theta), 2, -1)
    sin = jnp.repeat(jnp.sin(theta), 2, -1)
    y = apply_rotary(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1), np.linalg.norm(np.asarray(x), axis=-1), atol=1e-4
    )
    # dot products depend only on angle difference
    q = apply_rotary(x, cos, sin)
    k = apply_rotary(x, cos, sin)
    dots = np.einsum("bhnd,bhmd->bhnm", np.asarray(q), np.asarray(k))
    raw = np.einsum("bhnd,bhmd->bhnm", np.asarray(x), np.asarray(x))
    np.testing.assert_allclose(np.diagonal(dots, axis1=2, axis2=3), np.diagonal(raw, axis1=2, axis2=3), atol=1e-4)


def test_sigmoid_log_double_softmax_masking():
    b, n, m = 1, 6, 5
    sim = jnp.asarray(rng.normal(size=(b, n, m)), jnp.float32)
    z0 = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    z1 = jnp.asarray(rng.normal(size=(b, m)), jnp.float32)
    mask0 = jnp.asarray([[True] * 4 + [False] * 2])
    mask1 = jnp.asarray([[True] * 3 + [False] * 2])
    scores = np.asarray(sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1))
    assert np.all(scores[0, 4:, :] < -1e20)
    assert np.all(scores[0, :, 3:] < -1e20)
    assert np.all(scores[0, :4, :3] > -1e10)
    assert np.all(scores <= 1e-6)  # log-probabilities


def test_log_optimal_transport_marginals():
    b, n, m = 1, 8, 6
    sim = jnp.asarray(rng.normal(size=(b, n, m)), jnp.float32)
    Z = log_optimal_transport(sim, jnp.asarray(1.0), iters=100)
    P = np.exp(np.asarray(Z))[0]
    # rows (points of view 0): P(i, :) sums to 1 (match or dustbin)
    np.testing.assert_allclose(P[:n].sum(axis=1), 1.0, atol=1e-3)
    np.testing.assert_allclose(P[:, :m].sum(axis=0), 1.0, atol=1e-3)


def test_filter_matches_mutual():
    scores = jnp.log(jnp.asarray([[[0.8, 0.1], [0.2, 0.7], [0.05, 0.9]]]))
    out = filter_matches(scores, threshold=0.3)
    m0 = np.asarray(out["matches0"][0])
    assert m0[0] == 0
    # row 1 and 2 both argmax to column 1; only the mutual one survives
    assert (m0[1] == -1) or (m0[2] == -1)
    m1 = np.asarray(out["matches1"][0])
    assert m1[0] == 0


def test_log_double_softmax_bins():
    b, n, m = 1, 5, 4
    sim = jnp.asarray(rng.normal(size=(b, n, m)), jnp.float32)
    out = log_double_softmax(sim, jnp.asarray(0.5))
    assert out.shape == (b, n + 1, m + 1)
    P = np.exp(np.asarray(out[0, :n, :]))
    assert np.all(P <= 1.0 + 1e-5)


def test_pallas_attention_interpret_matches_xla():
    """The Pallas kernel (interpret mode on CPU) must match the XLA path,
    including padding-mask semantics and non-multiple-of-block shapes."""
    from gluefactory_tpu.ops.attention import attention_pallas

    b, h, n, m, d = 2, 4, 100, 70, 64  # deliberately unaligned
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, m, d)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, m)) > 0.3)
    out_pl = attention_pallas(q, k, v, kv_mask=mask, interpret=True)
    out_ref = attention_xla(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=2e-5)
    # no mask
    out_pl2 = attention_pallas(q, k, v, interpret=True)
    out_ref2 = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out_pl2), np.asarray(out_ref2), atol=2e-5)


def test_pallas_rotary_attention_interpret():
    from gluefactory_tpu.ops.attention import (
        apply_rotary, attention_pallas_rotary, attention_xla,
    )

    b, h, n, d = 1, 2, 50, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    theta = jnp.asarray(rng.normal(size=(b, n, d // 2)), jnp.float32)
    cos = jnp.repeat(jnp.cos(theta), 2, -1)
    sin = jnp.repeat(jnp.sin(theta), 2, -1)
    mask = jnp.asarray(rng.uniform(size=(b, n)) > 0.2)
    k_rot = apply_rotary(k, cos, sin)
    out_fused = attention_pallas_rotary(q, k_rot, v, cos, sin, kv_mask=mask,
                                        interpret=True)
    out_ref = attention_xla(apply_rotary(q, cos, sin), k_rot, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref), atol=2e-5)


def test_zero_padding_samplers_match_torch_semantics():
    """nearest/bilinear zeros samplers vs torch grid_sample (parity layer for
    compat graphs)."""
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from gluefactory_tpu.ops.interpolate import (
        bilinear_sample_zeros, nearest_sample_zeros,
    )

    rng_l = np.random.default_rng(9)
    fmap = rng_l.normal(size=(1, 7, 9, 3)).astype(np.float32)
    pts = rng_l.uniform(-2, 10, (1, 40, 2)).astype(np.float32)

    t_map = torch.from_numpy(fmap.transpose(0, 3, 1, 2))
    h, w = 7, 9
    gx = (pts[..., 0] * 2 + 1) / w - 1  # unnormalized -> align_corners=False
    gy = (pts[..., 1] * 2 + 1) / h - 1
    grid = torch.from_numpy(
        np.stack([gx, gy], -1)[:, :, None]).float()
    for mode, fn in (("nearest", nearest_sample_zeros),
                     ("bilinear", bilinear_sample_zeros)):
        want = F.grid_sample(
            t_map, grid, mode=mode, padding_mode="zeros",
            align_corners=False)[0, :, :, 0].T.numpy()
        got = np.asarray(fn(jnp.asarray(fmap), jnp.asarray(pts)))[0]
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)


def test_com_refinement_reads_soft_bilinear_labels_exactly():
    """Soft bilinear cell labels + center-of-mass readout: a heatmap built
    from _cell_labels_soft must give back the float corner positions
    exactly (the stage-1c SuperPoint sub-pixel design)."""
    import numpy as np

    from gluefactory_tpu.models.extractors.superpoint import _cell_labels_soft
    from gluefactory_tpu.ops.nms import com_refinement

    rng2 = np.random.default_rng(5)
    hc = wc = 6
    base = np.stack(np.meshgrid([10, 25, 38], [10, 25]), -1).reshape(-1, 2)[:5]
    kp = jnp.asarray(
        base[None].repeat(2, 0) + rng2.uniform(-0.5, 0.5, (2, 5, 2)),
        jnp.float32,
    )
    valid = jnp.ones((2, 5), bool)
    target = _cell_labels_soft(kp, valid, hc, wc)
    # rows are normalized distributions
    np.testing.assert_allclose(np.asarray(target.sum(-1)), 1.0, atol=1e-5)
    heat = (
        target[..., :64].reshape(2, hc, wc, 8, 8)
        .transpose(0, 1, 3, 2, 4).reshape(2, 48, 48)
    )
    refined = com_refinement(jnp.round(kp - 0.5), heat, radius=1)
    err = np.asarray(jnp.linalg.norm(refined - (kp - 0.5), axis=-1))
    assert err.max() < 1e-4, err


def test_gt_anchored_loc_loss_trains_to_subpixel():
    """Direct optimization of random cell logits under the CoM-mode GT-
    anchored loc loss must reach sub-0.3px — the saturation check that
    caught the low-temperature softargmax plateau."""
    import numpy as np
    import optax

    from gluefactory_tpu.geometry.kp_losses import gt_anchored_loc_loss
    from gluefactory_tpu.ops.interpolate import cell_logits_to_heatmap

    rng2 = np.random.default_rng(1)
    kp = jnp.asarray([[[10.3, 20.7], [30.2, 15.6]]], jnp.float32)
    valid = jnp.ones((1, 2), bool)
    logits = jnp.asarray(rng2.normal(0, 0.1, (1, 4, 5, 65)), jnp.float32)
    opt = optax.adam(0.05)

    def loss_fn(lg):
        hr = cell_logits_to_heatmap(lg)
        return gt_anchored_loc_loss(
            hr, kp - 0.5, valid, radius=2, mode="com").mean()

    state = opt.init(logits)
    for _ in range(80):
        _, g = jax.value_and_grad(loss_fn)(logits)
        up, state = opt.update(g, state)
        logits = optax.apply_updates(logits, up)
    assert float(loss_fn(logits)) < 0.3
