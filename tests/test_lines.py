import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry.lines import (
    gt_line_matches_from_homography,
    orth_line_dist,
    overlap_fraction,
    point_to_seg_dist,
    struct_line_dist,
)
from gluefactory_tpu.models import build_model
from gluefactory_tpu.ops.cluster import cluster_means, fixed_radius_clusters

rng = np.random.default_rng(9)


def test_fixed_radius_clusters():
    pts = jnp.asarray(
        [[[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [10.0, 10.0], [10.5, 10.0], [50.0, 50.0]]]
    )
    valid = jnp.ones((1, 6), bool)
    labels = np.asarray(fixed_radius_clusters(pts, valid, eps=1.5)[0])
    # chain 0-1-2 merges transitively; 3-4 merge; 5 alone
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[3] == labels[4] == 3
    assert labels[5] == 5
    means, counts = cluster_means(pts, valid.astype(jnp.float32), jnp.asarray(labels)[None])
    np.testing.assert_allclose(np.asarray(means[0, 0]), [1.0, 0.0], atol=1e-5)
    assert counts[0, 0] == 3 and counts[0, 3] == 2 and counts[0, 1] == 0


def test_line_distances():
    segs0 = jnp.asarray([[[[0.0, 0.0], [10.0, 0.0]]]])  # horizontal
    segs1 = jnp.asarray([[[[0.0, 2.0], [10.0, 2.0]], [[0.0, 0.0], [0.0, 10.0]]]])
    d = np.asarray(orth_line_dist(segs0, segs1)[0])
    np.testing.assert_allclose(d[0, 0], 2.0, atol=1e-5)  # parallel, offset 2
    s = np.asarray(struct_line_dist(segs0, segs1)[0])
    np.testing.assert_allclose(s[0, 0], 2.0, atol=1e-5)
    ov = np.asarray(overlap_fraction(segs0, segs1)[0])
    assert ov[0, 0] > 0.99  # full overlap with the parallel segment
    p = jnp.asarray([[[5.0, 3.0]]])
    dps = np.asarray(point_to_seg_dist(p, segs1)[0])
    np.testing.assert_allclose(dps[0, 0], 1.0, atol=1e-5)


def test_gt_line_matches_identity():
    L = 8
    lines0 = rng.uniform(20, 200, size=(1, L, 2, 2)).astype(np.float32)
    perm = rng.permutation(L)
    lines1 = lines0[:, perm]
    H = jnp.eye(3, dtype=jnp.float32)[None]
    valid = jnp.ones((1, L), bool)
    out = gt_line_matches_from_homography(
        jnp.asarray(lines0), jnp.asarray(lines1), valid, valid, H
    )
    m0 = np.asarray(out["line_matches0"][0])
    np.testing.assert_array_equal(m0, np.argsort(perm))


def test_lsd_detects_synthetic_lines():
    img = np.zeros((1, 128, 128, 1), np.float32)
    img[0, 30:34, 10:110] = 1.0  # horizontal bar
    img[0, 60:110, 60:64] = 1.0  # vertical bar
    model = build_model("lines.lsd", {"max_num_lines": 32, "min_length": 20})
    params = model.init(jax.random.key(0), {"image": jnp.asarray(img)})
    pred = model.apply(params, {"image": jnp.asarray(img)})
    valid = np.asarray(pred["valid_lines"][0])
    lines = np.asarray(pred["lines"][0])[valid]
    assert valid.sum() >= 2
    # at least one ~horizontal and one ~vertical segment
    d = lines[:, 1] - lines[:, 0]
    ang = np.abs(np.arctan2(d[:, 1], d[:, 0]))
    assert (np.minimum(ang, np.pi - ang) < 0.1).any()
    assert (np.abs(ang - np.pi / 2) < 0.1).any()


def test_wireframe_extractor():
    img = np.zeros((1, 96, 96, 1), np.float32)
    img[0, 20:24, 10:90] = 1.0
    img[0, 40:90, 40:44] = 1.0
    conf = {
        "point_extractor": {
            "name": "extractors.superpoint",
            "max_num_keypoints": 32,
            "detection_threshold": 0.0,
            "channels": [8, 8, 16, 16, 32, 32, 32, 32],
            "head_channels": 32,
            "descriptor_dim": 32,
            "dense_outputs": True,
        },
        "line_extractor": {"name": "lines.lsd", "max_num_lines": 16, "min_length": 15},
    }
    model = build_model("lines.wireframe", conf)
    data = {"image": jnp.asarray(img)}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    L = 16
    assert pred["keypoints"].shape[1] == 2 * L + 32
    assert pred["descriptors"].shape == (1, 2 * L + 32, 32)
    assert pred["lines_junc_idx"].shape == (1, 2 * L)
    vj = np.asarray(pred["keypoint_valid"][0, : 2 * L])
    idx = np.asarray(pred["lines_junc_idx"][0])
    vl = np.asarray(pred["valid_lines"][0])
    # every valid line's endpoints map to valid junction slots
    assert vj[idx.reshape(L, 2)[vl]].all()


GS_CONF = {"input_dim": 32, "descriptor_dim": 32, "n_layers": 1, "num_heads": 2}


def _gluestick_data(B=2, N=16, L=4, D=32):
    n_junc = 2 * L
    data = {
        "keypoints0": jnp.asarray(rng.uniform(0, 100, (B, N, 2)), jnp.float32),
        "keypoints1": jnp.asarray(rng.uniform(0, 100, (B, N, 2)), jnp.float32),
        "keypoint_scores0": jnp.ones((B, N), jnp.float32),
        "keypoint_scores1": jnp.ones((B, N), jnp.float32),
        "descriptors0": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "descriptors1": jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32),
        "lines0": jnp.asarray(rng.uniform(0, 100, (B, L, 2, 2)), jnp.float32),
        "lines1": jnp.asarray(rng.uniform(0, 100, (B, L, 2, 2)), jnp.float32),
        "line_scores0": jnp.ones((B, L), jnp.float32),
        "line_scores1": jnp.ones((B, L), jnp.float32),
        "valid_lines0": jnp.ones((B, L), bool),
        "valid_lines1": jnp.ones((B, L), bool),
        "lines_junc_idx0": jnp.asarray(rng.integers(0, n_junc, (B, 2 * L)), jnp.int32),
        "lines_junc_idx1": jnp.asarray(rng.integers(0, n_junc, (B, 2 * L)), jnp.int32),
        "view0": {"image_size": jnp.full((B, 2), 100.0)},
        "view1": {"image_size": jnp.full((B, 2), 100.0)},
    }
    return data


def test_gluestick_forward_and_loss():
    B, N, L = 2, 16, 4
    data = _gluestick_data(B, N, L)
    model = build_model("matchers.gluestick", GS_CONF)
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["log_assignment"].shape == (B, N + 1, N + 1)
    assert pred["line_matches0"].shape == (B, L)
    assert pred["line_log_assignment"].shape == (B, L + 1, L + 1)
    data_l = {
        **data,
        "gt_matches0": jnp.asarray(rng.integers(-1, N, (B, N)), jnp.int32),
        "gt_matches1": jnp.full((B, N), -2, jnp.int32),
        "gt_line_matches0": jnp.asarray(rng.integers(-1, L, (B, L)), jnp.int32),
        "gt_line_matches1": jnp.full((B, L), -2, jnp.int32),
    }
    losses, metrics = model.apply(params, pred, data_l, method=model.loss)
    assert np.isfinite(np.asarray(losses["total"])).all()

    def loss_fn(p):
        pr = model.apply(p, data)
        l, _ = model.apply(p, pr, data_l, method=model.loss)
        return jnp.mean(l["total"])

    g = jax.grad(loss_fn)(params)
    gn = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_gluestick_checkpointed_inter_supervision():
    """remat-wrapped layers + intermediate line supervision heads produce
    extra loss terms and finite gradients (reference gluestick.py:371-455)."""
    B, N, L = 2, 16, 4
    data = _gluestick_data(B, N, L)
    data_l = {
        **data,
        "gt_matches0": jnp.asarray(rng.integers(-1, N, (B, N)), jnp.int32),
        "gt_matches1": jnp.full((B, N), -2, jnp.int32),
        "gt_line_matches0": jnp.asarray(rng.integers(-1, L, (B, L)), jnp.int32),
        "gt_line_matches1": jnp.full((B, L), -2, jnp.int32),
    }
    model = build_model(
        "matchers.gluestick",
        dict(GS_CONF, n_layers=3, checkpointed=True, inter_supervision=[1]),
    )
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert "line_1_log_assignment" in pred
    losses, _ = model.apply(params, pred, data_l, method=model.loss)
    assert "line_nll_1" in losses
    assert np.isfinite(np.asarray(losses["total"])).all()

    def loss_fn(p):
        pr = model.apply(p, data)
        l, _ = model.apply(p, pr, data_l, method=model.loss)
        return jnp.mean(l["total"])

    g = jax.grad(loss_fn)(params)
    flat = {
        "/".join(k): v
        for k, v in
        __import__("flax").traverse_util.flatten_dict(g["params"]).items()
    }
    inter = [k for k in flat if "inter_line_proj" in k]
    assert inter and all(
        np.isfinite(np.asarray(flat[k])).all() for k in inter
    )
    gn = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_homographies_deeplsd_dataset_and_training_step():
    """homographies_deeplsd serves warped pairs with EXACT LSD-derived DF/AF
    targets (reference datasets/homographies_deeplsd.py warps precomputed
    DeepLSD fields; here targets are recomputed per view — no teacher) and
    DeepLSD's loss consumes them."""
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("homographies_deeplsd")({
        "train_size": 4, "val_size": 2, "image_size": 128,
        "train_batch_size": 2, "num_workers": 0})
    batch = next(iter(ds.get_data_loader("train")))
    df = np.asarray(batch["view0"]["gt_distance_field"])
    af = np.asarray(batch["view0"]["gt_angle_field"])
    assert df.shape == (2, 128, 128) and (df >= 0).all()
    assert df.min() == 0.0  # zero exactly on drawn LSD segments
    assert (af >= 0).all() and (af <= np.pi + 1e-6).all()
    # DeepLSD trains on one view's targets
    model = build_model("lines.deeplsd", {"trainable": True})
    data = {"image": jnp.asarray(batch["view0"]["image"]),
            "gt_distance_field": jnp.asarray(df),
            "gt_angle_field": jnp.asarray(af)}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    losses, _ = model.apply(params, pred, data, method=model.loss)
    assert np.isfinite(float(np.asarray(losses["total"]).mean()))
