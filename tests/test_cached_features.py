"""Cached-feature training path: homographies dataset with load_features +
TwoViewPipeline(allow_no_extract) — the stage-2 LightGlue training prep flow
(reference SURVEY.md §3.5)."""

import h5py
import jax
import numpy as np
import pytest

from gluefactory_tpu.datasets import get_dataset
from gluefactory_tpu.models import build_model
from gluefactory_tpu.train import filter_batch

rng = np.random.default_rng(61)


def test_homographies_with_cached_features(tmp_path):
    # build a fake feature cache for the synthetic source images
    cache = tmp_path / "feats.h5"
    n_img, n_kp, d = 4, 64, 16
    with h5py.File(str(cache), "w") as f:
        for i in range(n_img):
            g = f.create_group(f"synthetic/{i}")
            kpts = rng.uniform(50, 750, (n_kp, 2)).astype(np.float32)
            desc = rng.normal(size=(n_kp, d)).astype(np.float32)
            desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
            g.create_dataset("keypoints", data=kpts)
            g.create_dataset("descriptors", data=desc)
            g.create_dataset("keypoint_scores", data=np.ones(n_kp, np.float32))
    ds = get_dataset("homographies")(
        {
            "synthetic": True, "synthetic_size": n_img, "image_size": 128,
            "train_batch_size": 2, "num_workers": 0,
            "load_features": {"do": True, "path": str(cache), "padding_length": 64},
        }
    )
    batch = next(iter(ds.get_data_loader("train")))
    cache0 = batch["view0"]["cache"]
    assert cache0["keypoints"].shape == (2, 64, 2)
    assert cache0["descriptors"].shape == (2, 64, d)
    assert cache0["keypoint_valid"].any()

    # pipeline skips extraction and matches the cached descriptors
    pipe = build_model(
        "two_view_pipeline",
        {
            "matcher": {"name": "matchers.nearest_neighbor_matcher"},
            "ground_truth": {"name": "matchers.homography_matcher"},
            "allow_no_extract": True,
            "run_gt_in_forward": True,
        },
    )
    data = filter_batch(batch)
    params = pipe.init(jax.random.key(0), data)
    pred = pipe.apply(params, data)
    m0 = np.asarray(pred["matches0"])
    gt = np.asarray(pred["gt_matches0"])
    both = (gt >= 0) & (m0 >= 0)
    # descriptors are identical for true correspondences => NN must agree
    # with the geometric GT wherever both are defined
    if both.any():
        assert (m0[both] == gt[both]).mean() > 0.9
    assert (gt >= 0).sum() > 10  # enough overlap supervision exists


def test_cached_engine_generic_extractor_sift():
    """The on-device cached-feature engine with a non-SuperPoint extractor
    (SIFT on host via cv2 callback) feeding a matcher-only pipeline."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.datasets import get_dataset
    from gluefactory_tpu.models import build_model

    ds = get_dataset("homographies_ondevice_cached")({
        "pool_size": 6, "val_pool_size": 4, "source_size": [160, 160],
        "image_size": 128, "max_gt_points": 64, "pool_cache": False,
        "train_batch_size": 4, "val_batch_size": 4,
        "features_from": {"name": "extractors.sift",
                          "max_num_keypoints": 64,
                          "contrast_threshold": 0.01, "batch": 4,
                          "on_host": True},
    })
    pool = {k: jnp.asarray(v) for k, v in ds.build_pool("train").items()}
    batch = ds.make_batch(pool, jax.random.key(0))
    assert batch["view0"]["cache"]["descriptors"].shape[-1] == 128
    pipe = build_model("two_view_pipeline", {
        "extractor": {"name": None}, "allow_no_extract": True,
        "matcher": {"name": "matchers.lightglue", "input_dim": 128,
                    "n_layers": 2, "checkpointed": False},
        "ground_truth": {"name": "matchers.homography_matcher"},
        "run_gt_in_forward": True})
    params = pipe.init(jax.random.key(0), batch)
    pred = pipe.apply(params, batch)
    losses, _ = pipe.apply(params, pred, batch, method=pipe.loss)
    assert float(jnp.mean(losses["total"])) > 0


def test_cached_engine_train_step():
    """One real jitted engine train step with the CACHED-feature engine
    (regression: the step used view0['image'] for the batch size, which the
    cached engine does not serve)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.datasets import get_dataset
    from gluefactory_tpu.models import build_model
    from gluefactory_tpu.train import make_train_step

    ds = get_dataset("homographies_ondevice_cached")({
        "pool_size": 6, "val_pool_size": 4, "source_size": [160, 160],
        "image_size": 128, "max_gt_points": 64, "pool_cache": False,
        "train_batch_size": 8, "val_batch_size": 8,
        "features_from": {"max_num_keypoints": 64,
                          "detection_threshold": 0.0, "batch": 4},
    })
    pool = {k: jnp.asarray(v) for k, v in ds.build_pool("train").items()}
    model = build_model("two_view_pipeline", {
        "extractor": {"name": None}, "allow_no_extract": True,
        "matcher": {"name": "matchers.lightglue", "input_dim": 256,
                    "n_layers": 2, "checkpointed": False},
        "ground_truth": {"name": "matchers.homography_matcher"},
        "run_gt_in_forward": True})
    batch0 = ds.make_batch(pool, jax.random.key(0))
    params = model.init(jax.random.key(0), batch0,
                        method=model.forward_and_loss)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("data",))
    step, _, repl = make_train_step(model, tx, mesh,
                                    make_batch=ds.make_batch)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    _, _, scalars = step(params, opt_state, pool, 7)
    assert np.isfinite(float(scalars["loss/total"]))


def test_cached_wireframe_engine_gluestick():
    """Cached-WIREFRAME engine (host SP+LSD wireframe pool, in-jit warp of
    nodes AND line endpoints) feeding a matcher-only GlueStick step.
    Invariant: warped line endpoints == warped nodes gathered at
    lines_junc_idx (homographies preserve incidence)."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.datasets import get_dataset
    from gluefactory_tpu.models import build_model

    ds = get_dataset("homographies_ondevice_cached_wireframe")({
        "pool_size": 6, "val_pool_size": 4, "source_size": [160, 160],
        "image_size": 128, "pool_cache": False,
        "train_batch_size": 4, "val_batch_size": 4,
        "features_from": {
            "name": "lines.wireframe", "on_host": True, "batch": 4,
            "point_extractor": {"name": "extractors.superpoint",
                                "max_num_keypoints": 48,
                                "detection_threshold": 0.0,
                                "dense_outputs": True, "trainable": False},
            "line_extractor": {"name": "lines.lsd", "max_num_lines": 24},
            "nms_radius": 3.0,
        },
    })
    pool = {k: jnp.asarray(v) for k, v in ds.build_pool("train").items()}
    assert "lines" in pool and "lines_junc_idx" in pool
    batch = ds.make_batch(pool, jax.random.key(0))
    c0 = batch["view0"]["cache"]
    b, L = c0["lines"].shape[:2]
    eps = jnp.take_along_axis(
        c0["keypoints"], c0["lines_junc_idx"][..., None].repeat(2, -1), axis=1
    ).reshape(b, L, 2, 2)
    vl = np.asarray(c0["valid_lines"])
    err = np.asarray(jnp.abs(eps - c0["lines"]).max(axis=(-1, -2)))
    if vl.any():
        assert err[vl].max() < 1e-3

    pipe = build_model("two_view_pipeline", {
        "extractor": {"name": None}, "allow_no_extract": True,
        "matcher": {"name": "matchers.gluestick", "input_dim": 256,
                    "descriptor_dim": 256, "n_layers": 2,
                    "inter_supervision": [1]},
        "ground_truth": {"name": "matchers.homography_matcher",
                         "use_lines": True},
        "run_gt_in_forward": True})
    params = pipe.init(jax.random.key(0), batch)
    pred = pipe.apply(params, batch)
    losses, _ = pipe.apply(params, pred, batch, method=pipe.loss)
    assert np.isfinite(float(jnp.mean(losses["total"])))


def test_pool_disk_cache_roundtrip(tmp_path, monkeypatch):
    """The engine's pool disk cache: second build with the same conf loads
    from npz (no re-extraction); different conf gets a different key."""
    import gluefactory_tpu.settings as settings
    from gluefactory_tpu.datasets import get_dataset

    monkeypatch.setattr(settings, "DATA_PATH", tmp_path)
    conf = {
        "pool_size": 4, "val_pool_size": 2, "source_size": [160, 160],
        "image_size": 128, "max_gt_points": 32,
        "features_from": {"max_num_keypoints": 32,
                          "detection_threshold": 0.0, "batch": 4},
    }
    ds = get_dataset("homographies_ondevice_cached")(conf)
    pool = ds.build_pool("train")
    files = list((tmp_path / "engine_pool_cache").glob("*.npz"))
    assert len(files) == 1
    ds2 = get_dataset("homographies_ondevice_cached")(conf)
    pool2 = ds2.build_pool("train")
    np.testing.assert_array_equal(pool["keypoints"], pool2["keypoints"])
    # a different pool conf must not hit the same cache entry
    ds3 = get_dataset("homographies_ondevice_cached")(
        {**conf, "pool_size": 5})
    assert ds3._pool_cache_path("train") != ds._pool_cache_path("train")
