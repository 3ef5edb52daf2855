"""JPLDD + POLD2 + synthetic-shapes pipeline tests: the DF-based line path
must recover drawn segments exactly when fed the exact GT fields."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.datasets import get_dataset
from gluefactory_tpu.geometry.lines import struct_line_dist
from gluefactory_tpu.models import build_model

rng = np.random.default_rng(31)


def test_synthetic_shapes_gt_consistency():
    ds = get_dataset("synthetic_shapes")({"image_size": 96, "train_size": 4, "num_workers": 0})
    item = ds.get_dataset("train").getitem(0, rng)
    df = item["gt_distance_field"]
    segs = item["gt_segments"][item["gt_segment_valid"]]
    assert df.shape == (96, 96) and np.isfinite(df).all()
    # DF is ~0 on segment midpoints
    mids = (segs[:, 0] + segs[:, 1]) / 2
    mi = np.clip(np.round(mids).astype(int), 0, 95)
    assert df[mi[:, 1], mi[:, 0]].max() < 1.0
    # heatmap peaks at vertices
    assert item["gt_heatmap"].max() == 1.0
    af = item["gt_angle_field"]
    assert ((af >= 0) & (af <= np.pi)).all()


def test_pold2_extractor_recovers_segments_from_exact_df():
    ds = get_dataset("synthetic_shapes")({"image_size": 96, "train_size": 4, "num_workers": 0})
    item = ds.get_dataset("train").getitem(1, rng)
    segs = item["gt_segments"][item["gt_segment_valid"]]
    # feed exact segment endpoints as keypoints + exact DF
    n_max = 64
    endpoints = segs.reshape(-1, 2)[:n_max]
    kpts = np.zeros((1, n_max, 2), np.float32)
    valid = np.zeros((1, n_max), bool)
    kpts[0, : len(endpoints)] = endpoints
    valid[0, : len(endpoints)] = True
    # collinear_nms off: this test checks the DF-recovery machinery at GT
    # segment granularity; the NMS (which merges collinear chains into their
    # longest span by design) has its own unit test below
    model = build_model(
        "lines.pold2_extractor",
        {"max_num_points": n_max, "max_num_lines": 128, "min_length": 5.0,
         "mean_df_th": 1.0, "coarse_inlier_ratio": 0.85, "fine_inlier_ratio": 0.85,
         "collinear_nms": False, "selection_score": "inlier"},
    )
    data = {
        "keypoints": jnp.asarray(kpts),
        "keypoint_valid": jnp.asarray(valid),
        "distance_field": jnp.asarray(item["gt_distance_field"])[None],
    }
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    vl = np.asarray(pred["valid_lines"][0])
    lines = np.asarray(pred["lines"][0])[vl]
    assert len(lines) >= len(segs) * 0.7, (len(lines), len(segs))
    # every GT segment should have a recovered line nearby (struct dist)
    d = np.asarray(
        struct_line_dist(jnp.asarray(segs)[None], jnp.asarray(lines)[None])[0]
    )
    # most GT segments recovered (polygon chains can merge collinear
    # candidates, so a perfect 1:1 recovery is not expected)
    assert (d.min(axis=1) < 5.0).mean() >= 0.65


def test_pold2_collinear_nms_dedupes_overcomplete_candidates():
    """Three collinear keypoints yield 3 surviving spans of one physical
    line; the NMS must keep only the longest (plus any independent line).
    Without it the extractor emits hundreds of near-duplicate sub-segments
    (measured line repeatability 0.27 -> 0.79 on rendered HPatches)."""
    # exact DF for two lines: y=20 (x in [10,90]) and x=70 (y in [40,90])
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    d_line1 = np.where((xx >= 10) & (xx <= 90), np.abs(yy - 20), 1e6)
    d_line2 = np.where((yy >= 40) & (yy <= 90), np.abs(xx - 70), 1e6)
    df = np.minimum(d_line1, d_line2)
    kpts = np.array([[[10, 20], [50, 20], [90, 20], [70, 40], [70, 90]]],
                    np.float32)
    valid = np.ones((1, 5), bool)
    model = build_model("lines.pold2_extractor",
                        {"max_num_points": 5, "max_num_lines": 16,
                         "min_length": 5.0})
    data = {"keypoints": jnp.asarray(kpts), "keypoint_valid": jnp.asarray(valid),
            "distance_field": jnp.asarray(df)[None]}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    vl = np.asarray(pred["valid_lines"][0])
    lines = np.asarray(pred["lines"][0])[vl]
    assert len(lines) == 2, lines  # one span per physical line
    lens = np.linalg.norm(lines[:, 1] - lines[:, 0], axis=-1)
    assert {int(round(l)) for l in lens} == {80, 50}, lens  # longest spans


def test_jpldd_forward_and_loss_and_grad():
    ds = get_dataset("synthetic_shapes")(
        {"image_size": 64, "train_size": 4, "train_batch_size": 2, "num_workers": 0}
    )
    loader = ds.get_data_loader("train")
    batch = next(iter(loader))
    from gluefactory_tpu.train import filter_batch

    data = filter_batch(batch)
    model = build_model(
        "extractors.joint_point_line_extractor",
        {"channels": [4, 8, 16, 32], "dim": 32, "max_num_keypoints": 32,
         "detection_threshold": 0.0},
    )
    params = model.init(jax.random.key(0), data, method=model.forward_and_loss)
    pred = model.apply(params, data)
    assert pred["heatmap"].shape == (2, 64, 64)
    assert pred["distance_field"].shape == (2, 64, 64)
    assert pred["angle_field"].shape == (2, 64, 64)
    assert pred["descriptors"].shape == (2, 32, 32)
    losses, _ = model.apply(params, pred, data, method=model.loss)
    for k in ("heatmap", "df", "af", "total"):
        assert np.isfinite(np.asarray(losses[k])).all(), k

    def loss_fn(p):
        pr = model.apply(p, data)
        l, _ = model.apply(p, pr, data, method=model.loss)
        return jnp.mean(l["total"])

    g = jax.grad(loss_fn)(params)
    gn = float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.slow
def test_jpldd_overfits_df():
    """A few steps on one batch must clearly reduce the DF loss (the head can
    learn): sanity for the training objective."""
    import optax

    ds = get_dataset("synthetic_shapes")(
        {"image_size": 64, "train_size": 2, "train_batch_size": 2, "num_workers": 0}
    )
    batch = next(iter(ds.get_data_loader("train")))
    from gluefactory_tpu.train import filter_batch

    data = filter_batch(batch)
    model = build_model(
        "extractors.joint_point_line_extractor",
        {"channels": [4, 8, 16, 32], "dim": 32, "max_num_keypoints": 32,
         "detection_threshold": 0.0, "use_angle_field": False},
    )
    params = model.init(jax.random.key(0), data, method=model.forward_and_loss)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            pr = model.apply(p, data)
            l, _ = model.apply(p, pr, data, method=model.loss)
            return jnp.mean(l["df"]), l

        (df_loss, l), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, df_loss

    losses = []
    for _ in range(30):
        params, opt, df_loss = step(params, opt)
        losses.append(float(df_loss))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_jpldd_two_view_desc_nll_trains_only_desc_head():
    """Phase-B recipe (configs/jpldd_desc_stage.yaml): inside a
    two_view_pipeline on the homography engine, the InfoNCE branch must
    produce finite grads concentrated in desc_head when the freeze mask
    zeroes the trunk."""
    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.train import lr_scaling_masks

    ds = get_dataset("homographies_ondevice")({
        "pool_size": 3, "val_pool_size": 2, "source_size": [128, 128],
        "image_size": 96, "max_gt_points": 48, "train_batch_size": 2,
    })
    pool = {k: jnp.asarray(v) for k, v in ds.build_pool("train").items()}
    batch = ds.make_batch(pool, jax.random.key(0))
    model = build_model("two_view_pipeline", {
        "extractor": {
            "name": "extractors.joint_point_line_extractor",
            "channels": [4, 8, 16, 32], "dim": 16,
            "max_num_keypoints": 48, "detection_threshold": 0.0,
            "loss": {"desc_nll_weight": 1.0},
        },
    })
    params = model.init(jax.random.key(1), batch)

    def loss_fn(p):
        pred = model.apply(p, batch)
        losses, _ = model.apply(p, pred, batch, method=model.loss)
        return losses["total"].mean(), losses

    (val, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(val))
    assert "desc_nll" in losses
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    gdesc = sum(
        float(jnp.sum(g**2)) for path, g in flat
        if "desc_head" in jax.tree_util.keystr(path)
    )
    assert gdesc > 0
    # the freeze mask of the phase-B config hits every non-desc_head param
    masks = lr_scaling_masks(params, [[0.0, [
        "block", "agg_conv", "kp1", "kp2", "kp3", "df1", "df2", "df3",
        "af1", "af3", "backbone"]]])
    assert len(masks) == 1
    import jax.tree_util as jtu
    flat_mask = {
        jtu.keystr(p): v for p, v in jtu.tree_flatten_with_path(masks[0][1])[0]
    }
    for k, frozen in flat_mask.items():
        if "desc_head" in k:
            assert not frozen, f"desc_head param {k} would be frozen"
        else:
            assert frozen, f"trunk param {k} would stay trainable"


def test_jpldd_line_desc_samples_wunsch_self_matching():
    """line_desc_samples: the SDDH head evaluated along each extracted line
    feeds matchers.wunsch_line_matcher directly. Identical views must match
    their own lines (identity assignment) even with untrained weights —
    identical sample descriptors give the NW alignment its maximum."""
    from gluefactory_tpu.models import build_model as build

    model = build("two_view_pipeline", {
        "extractor": {"name": "extractors.joint_point_line_extractor",
                      "max_num_keypoints": 96, "extract_lines": True,
                      "line_desc_samples": 4,
                      "line_extractor": {"max_num_lines": 32}},
        "matcher": {"name": "matchers.wunsch_line_matcher",
                    "min_score": 0.0},
    })
    ds = get_dataset("synthetic_shapes")({"image_size": 96, "train_size": 2,
                                          "num_workers": 0})
    item = ds.get_dataset("train").getitem(0, rng)
    img = jnp.asarray(item["image"])[None]
    data = {"view0": {"image": img}, "view1": {"image": img}}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["line_desc_samples0"].shape[2] == 4
    m0 = np.asarray(pred["line_matches0"][0])
    v0 = np.asarray(pred["valid_lines0"][0])
    if v0.sum() >= 2:
        idx = np.where(v0)[0]
        assert (m0[idx] == idx).mean() > 0.8, (m0[idx], idx)
