import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import build_model

rng = np.random.default_rng(5)

B, N, D = 2, 32, 32


def make_match_data(n_common=20):
    """Two keypoint sets sharing n_common descriptors (shuffled)."""
    desc_common = rng.normal(size=(B, n_common, D)).astype(np.float32)
    d0_extra = rng.normal(size=(B, N - n_common, D)).astype(np.float32)
    d1_extra = rng.normal(size=(B, N - n_common, D)).astype(np.float32)
    d0 = np.concatenate([desc_common, d0_extra], axis=1)
    perm = rng.permutation(N)
    d1 = np.concatenate([desc_common, d1_extra], axis=1)[:, perm]
    gt_m0 = np.full((B, N), -1, np.int64)
    inv = np.argsort(perm)
    for j in range(n_common):
        gt_m0[:, j] = inv[j]
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 100, (B, N, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 100, (B, N, 2)), jnp.float32),
        "keypoint_scores0": jnp.ones((B, N), jnp.float32),
        "keypoint_scores1": jnp.ones((B, N), jnp.float32),
        "descriptors0": jnp.asarray(d0),
        "descriptors1": jnp.asarray(d1),
        "view0": {"image_size": jnp.full((B, 2), 100.0)},
        "view1": {"image_size": jnp.full((B, 2), 100.0)},
    }
    return data, gt_m0


def test_nn_matcher_exact():
    data, gt_m0 = make_match_data()
    model = build_model("matchers.nearest_neighbor_matcher", {})
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    m0 = np.asarray(pred["matches0"])
    matched = gt_m0 >= 0
    assert (m0[matched] == gt_m0[matched]).mean() > 0.99


LG_CONF = {
    "input_dim": D, "descriptor_dim": D, "n_layers": 2, "num_heads": 2,
    "checkpointed": False, "flash": False,
}


def test_lightglue_forward_and_loss():
    data, gt_m0 = make_match_data()
    model = build_model("matchers.lightglue", LG_CONF)
    data_init = {**data, "gt_matches0": jnp.asarray(gt_m0),
                 "gt_matches1": jnp.full((B, N), -2)}
    params = model.init(jax.random.key(0), data_init, method=model.forward_and_loss)
    pred = model.apply(params, data)
    assert pred["matches0"].shape == (B, N)
    assert pred["log_assignment"].shape == (B, N, N)
    data_l = {**data, "gt_matches0": jnp.asarray(gt_m0),
              "gt_matches1": jnp.full((B, N), -2)}
    losses, metrics = model.apply(params, pred, data_l, method=model.loss)
    assert np.isfinite(np.asarray(losses["total"])).all()
    # gradient flows
    def loss_fn(p):
        pr = model.apply(p, data)
        l, _ = model.apply(p, pr, data_l, method=model.loss)
        return jnp.mean(l["total"])

    g = jax.grad(loss_fn)(params)
    gn = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_lightglue_padding_invariance():
    """Masked (padded) keypoints must not change matches of valid ones."""
    data, _ = make_match_data()
    model = build_model("matchers.lightglue", LG_CONF)
    params = model.init(jax.random.key(0), data)
    full_valid = {**data,
                  "keypoint_valid0": jnp.ones((B, N), bool),
                  "keypoint_valid1": jnp.ones((B, N), bool)}
    pred_full = model.apply(params, full_valid)
    n_valid = N - 8
    mask = jnp.asarray([[True] * n_valid + [False] * 8] * B)
    # corrupt the padded slots: should have no effect when masked
    d0 = np.array(data["descriptors0"])
    d0[:, n_valid:] = 99.0
    masked = {**data, "descriptors0": jnp.asarray(d0),
              "keypoint_valid0": mask,
              "keypoint_valid1": jnp.ones((B, N), bool)}
    pred_trunc = model.apply(params, masked)
    m_full = np.asarray(pred_full["matches0"])[:, :n_valid]
    m_masked = np.asarray(pred_trunc["matches0"])[:, :n_valid]
    # matches that don't point into the masked region should agree
    keep = (m_full < n_valid)
    assert (m_full[keep] == m_masked[keep]).mean() > 0.9
    # masked slots are unmatched
    assert (np.asarray(pred_trunc["matches0"])[:, n_valid:] == -1).all()


def test_superglue_forward_and_loss():
    data, gt_m0 = make_match_data()
    conf = {"input_dim": D, "descriptor_dim": D, "n_layers": 2, "num_heads": 2,
            "sinkhorn_iterations": 20}
    model = build_model("matchers.superglue", conf)
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["log_assignment"].shape == (B, N + 1, N + 1)
    data_l = {**data, "gt_matches0": jnp.asarray(gt_m0),
              "gt_matches1": jnp.full((B, N), -2)}
    losses, metrics = model.apply(params, pred, data_l, method=model.loss)
    assert np.isfinite(np.asarray(losses["total"])).all()


def test_lightglue_trained_head_learns():
    """A couple of gradient steps on fixed data must reduce the loss."""
    import optax

    data, gt_m0 = make_match_data()
    data_l = {**data, "gt_matches0": jnp.asarray(gt_m0),
              "gt_matches1": jnp.full((B, N), -2)}
    model = build_model("matchers.lightglue", LG_CONF)
    params = model.init(jax.random.key(0), data_l, method=model.forward_and_loss)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pr = model.apply(p, data)
            l, _ = model.apply(p, pr, data_l, method=model.loss)
            return jnp.mean(l["total"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_lightglue_adaptive_inference():
    """Adaptive depth/width (mask-based): must run and keep plausible
    matches; pruned tokens are reported via prune0/1."""
    data, gt_m0 = make_match_data()
    model = build_model(
        "matchers.lightglue",
        {**LG_CONF, "depth_confidence": 0.95, "width_confidence": 0.95,
         "save_layer_outputs": False},
    )
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["matches0"].shape == (B, N)
    assert "prune0" in pred and pred["prune0"].shape == (B, N)
    assert np.asarray(pred["prune0"]).min() >= 1
    assert np.isfinite(np.asarray(pred["log_assignment"])).any()


def test_lightglue_torch_weight_converter():
    """The converter must produce exactly the model's param tree (structure +
    shapes) and permute the fused QKV rows correctly."""
    from gluefactory_tpu.models.matchers.lightglue import torch_weight_converter

    conf = {**LG_CONF}
    model = build_model("matchers.lightglue", conf)
    data, gt_m0 = make_match_data()
    data_init = {**data, "gt_matches0": jnp.asarray(gt_m0),
                 "gt_matches1": jnp.full((B, N), -2)}
    # forward_and_loss creates ALL per-layer assignment/confidence heads
    template = model.init(jax.random.key(0), data_init, method=model.forward_and_loss)

    d, h, L = D, conf["num_heads"], conf["n_layers"]
    g = np.random.default_rng(0)
    sd = {}

    def add_lin(name, out_d, in_d, bias=True):
        sd[f"{name}.weight"] = g.normal(size=(out_d, in_d)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = g.normal(size=(out_d,)).astype(np.float32)

    add_lin("input_proj", d, d)
    sd["posenc.Wr.weight"] = g.normal(size=(d // h // 2, 2)).astype(np.float32)
    for i in range(L):
        add_lin(f"transformers.{i}.self_attn.Wqkv", 3 * d, d)
        add_lin(f"transformers.{i}.self_attn.out_proj", d, d)
        add_lin(f"transformers.{i}.self_attn.ffn.0", 2 * d, 2 * d)
        add_lin(f"transformers.{i}.self_attn.ffn.1", 2 * d, 0)  # LayerNorm
        sd[f"transformers.{i}.self_attn.ffn.1.weight"] = g.normal(size=(2 * d,)).astype(np.float32)
        add_lin(f"transformers.{i}.self_attn.ffn.3", d, 2 * d)
        add_lin(f"transformers.{i}.cross_attn.to_qk", d, d)
        add_lin(f"transformers.{i}.cross_attn.to_v", d, d)
        add_lin(f"transformers.{i}.cross_attn.to_out", d, d)
        add_lin(f"transformers.{i}.cross_attn.ffn.0", 2 * d, 2 * d)
        sd[f"transformers.{i}.cross_attn.ffn.1.weight"] = g.normal(size=(2 * d,)).astype(np.float32)
        sd[f"transformers.{i}.cross_attn.ffn.1.bias"] = g.normal(size=(2 * d,)).astype(np.float32)
        add_lin(f"transformers.{i}.cross_attn.ffn.3", d, 2 * d)
        add_lin(f"log_assignment.{i}.final_proj", d, d)
        add_lin(f"log_assignment.{i}.matchability", 1, d)
        if i < L - 1:
            add_lin(f"token_confidence.{i}.token.0", 1, d)

    converted = torch_weight_converter(sd, conf)
    # identical tree structure and leaf shapes
    t_paths = jax.tree_util.tree_structure(template)
    c_paths = jax.tree_util.tree_structure(converted)
    assert t_paths == c_paths, (t_paths, c_paths)
    for a, b in zip(jax.tree.leaves(template), jax.tree.leaves(converted)):
        assert a.shape == b.shape, (a.shape, b.shape)

    # qkv permutation correctness: torch split vs our split must agree
    W = sd["transformers.0.self_attn.Wqkv.weight"]
    bvec = sd["transformers.0.self_attn.Wqkv.bias"]
    x = g.normal(size=(5, d)).astype(np.float32)
    y = x @ W.T + bvec
    hd = d // h
    theirs = y.reshape(5, h, hd, 3)
    q_t, k_t, v_t = theirs[..., 0], theirs[..., 1], theirs[..., 2]
    kern = np.asarray(converted["params"]["transformers_0"]["self_attn"]["Wqkv"]["kernel"])
    bias = np.asarray(converted["params"]["transformers_0"]["self_attn"]["Wqkv"]["bias"])
    y2 = x @ kern + bias
    ours = y2.reshape(5, h, 3, hd)
    np.testing.assert_allclose(ours[:, :, 0], q_t, atol=1e-5)
    np.testing.assert_allclose(ours[:, :, 1], k_t, atol=1e-5)
    np.testing.assert_allclose(ours[:, :, 2], v_t, atol=1e-5)


def test_adalam_filters_outliers_keeps_inliers():
    """AdaLAM filter-slot model (reference matchers/adalam.py is an EMPTY
    stub; this is a real batched implementation): putative NN matches with
    30% gross outliers under a global affine -> precision goes to ~1.0 at
    >=0.6 inlier recall, and matches1 stays consistent with matches0."""
    from gluefactory_tpu.models import build_model as build

    rng = np.random.default_rng(3)
    B, N = 2, 256
    kp0 = rng.uniform(0, 480, (B, N, 2)).astype(np.float32)
    A = np.array([[0.9, 0.1, 20], [-0.05, 1.05, -10]], np.float32)
    tgt = kp0 @ A[:, :2].T + A[:, 2] + rng.normal(0, 1.0, (B, N, 2))
    out_mask = rng.uniform(size=(B, N)) < 0.3
    tgt[out_mask] = rng.uniform(0, 480, (int(out_mask.sum()), 2))
    m0 = np.tile(np.arange(N), (B, 1))
    scores = rng.uniform(0.3, 1.0, (B, N)).astype(np.float32)
    model = build("matchers.adalam", {})
    data = {
        "keypoints0": jnp.asarray(kp0),
        "keypoints1": jnp.asarray(tgt.astype(np.float32)),
        "matches0": jnp.asarray(m0, jnp.int32),
        "matches1": jnp.asarray(m0, jnp.int32),
        "matching_scores0": jnp.asarray(scores),
        "matching_scores1": jnp.asarray(scores),
        "view0": {"image_size": jnp.full((B, 2), 480.0)},
    }
    params = model.init(jax.random.key(0), data)
    pred = jax.jit(model.apply)(params, data)
    keep = np.asarray(pred["matches0"]) > -1
    inl = ~out_mask
    assert (keep & inl).sum() / max(keep.sum(), 1) > 0.95
    assert (keep & inl).sum() / inl.sum() > 0.55
    m0_new = np.asarray(pred["matches0"])
    m1_new = np.asarray(pred["matches1"])
    for b in range(B):
        j = np.where(m1_new[b] > -1)[0]
        assert (m0_new[b, m1_new[b, j]] == j).all()
