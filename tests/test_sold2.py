"""SOLD2-class line detector + Needleman-Wunsch line matcher tests
(reference: gluefactory/models/lines/sold2.py wrapper + kornia SOLD2)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gluefactory_tpu.models import build_model
from gluefactory_tpu.models.matchers.wunsch_line_matcher import nw_scores

rng = np.random.default_rng(13)


def _nw_naive(M, gap):
    n, m = M.shape
    D = np.zeros((n + 1, m + 1))
    D[0, :] = gap * np.arange(m + 1)
    D[:, 0] = gap * np.arange(n + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i, j] = max(D[i - 1, j - 1] + M[i - 1, j - 1],
                          D[i - 1, j] + gap, D[i, j - 1] + gap)
    return D[n, m]


def test_nw_scores_matches_naive():
    M = rng.normal(size=(3, 4, 6, 5)).astype(np.float32)
    out = np.asarray(nw_scores(jnp.asarray(M), 0.1))
    for i in range(3):
        for j in range(4):
            np.testing.assert_allclose(
                out[i, j], _nw_naive(M[i, j], 0.1), rtol=1e-5)


def _desc_map(h=32, w=32, d=16):
    m = rng.normal(size=(1, h, w, d)).astype(np.float32)
    return jnp.asarray(m / np.linalg.norm(m, axis=-1, keepdims=True))


def test_wunsch_matcher_recovers_permutation():
    L = 6
    lines0 = jnp.asarray(rng.uniform(20, 100, (1, L, 2, 2)), jnp.float32)
    perm = rng.permutation(L)
    lines1 = lines0[:, perm]
    # reverse one line's endpoints: NW(max fwd/rev) must still match it
    lines1 = lines1.at[0, 0].set(lines1[0, 0, ::-1])
    dm = _desc_map(128, 128)
    data = {
        "lines0": lines0, "lines1": lines1,
        "descriptors_dense0": dm, "descriptors_dense1": dm,
    }
    model = build_model("matchers.wunsch_line_matcher", {
        "desc_stride": 1, "min_score": 0.0,
    })
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    np.testing.assert_array_equal(
        np.asarray(pred["line_matches0"][0]), np.argsort(perm))
    # and the inverse direction is consistent
    m1 = np.asarray(pred["line_matches1"][0])
    np.testing.assert_array_equal(m1, perm)


def test_sold2_forward_and_loss():
    model = build_model("lines.sold2", {
        "channels": [8, 16, 24], "descriptor_dim": 16,
        "max_num_junctions": 32, "max_num_lines": 64,
        "junction_threshold": 0.0, "mean_score_threshold": 0.0,
        "heatmap_threshold": 0.0, "inlier_ratio": 0.0, "min_length": 4.0,
    })
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), jnp.float32)
    gt_lines = jnp.asarray(
        [[[[10.0, 10.0], [50.0, 12.0]], [[20.0, 40.0], [60.0, 44.0]]]]
    )
    data = {"image": img, "lines": gt_lines,
            "valid_lines": jnp.ones((1, 2), bool)}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["lines"].shape == (1, 64, 2, 2)
    assert pred["line_heatmap"].shape == (1, 64, 64)
    assert pred["descriptors_dense"].shape[-1] == 16

    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            pr = model.apply(p, data)
            losses, _ = model.apply(p, pr, data, method=model.loss)
            return jnp.mean(losses["total"]), losses

        (v, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, state2 = opt.update(g, state)
        return optax.apply_updates(params, upd), state2, v

    vals = []
    for _ in range(20):
        params, state, v = step(params, state)
        vals.append(float(v))
    assert np.isfinite(vals).all()
    assert vals[-1] < vals[0], vals[:2] + vals[-2:]


def test_sold2_two_view_pairs_engine_training_path():
    """Joint SOLD2 recipe (configs/sold2_train_pairs.yaml): the two-view
    shapes engine emits per-view line/vertex GT + fields, and the pipeline
    loss combines per-view junction/heatmap terms with the cross-view
    descriptor InfoNCE — all with finite grads."""
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("synthetic_shapes_ondevice_pairs")({
        "pool_size": 3, "val_pool_size": 2, "source_size": [128, 128],
        "image_size": 96, "max_segments": 16, "max_vertices": 32,
        "train_batch_size": 2,
    })
    pool = {k: jnp.asarray(v) for k, v in ds.build_pool("train").items()}
    batch = ds.make_batch(pool, jax.random.key(0))
    assert batch["lines0"].shape == (2, 16, 2, 2)
    assert batch["gt_heatmap1"].shape == (2, 96, 96)
    model = build_model("two_view_pipeline", {
        "extractor": {
            "name": "lines.sold2", "sparse_outputs": False,
            "channels": [8, 16, 32], "descriptor_dim": 32,
            "loss": {"desc_nll_weight": 1.0},
        },
    })
    params = model.init(jax.random.key(1), batch)

    def loss_fn(p):
        pred = model.apply(p, batch)
        losses, _ = model.apply(p, pred, batch, method=model.loss)
        return losses["total"].mean(), losses

    (val, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(val))
    for k in ("junction_ce0", "heatmap_bce1", "desc_nll"):
        assert k in losses
    gn = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0
