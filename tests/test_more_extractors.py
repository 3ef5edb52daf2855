import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import build_model

rng = np.random.default_rng(41)


def _img(b=1, h=64, w=64):
    return jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32)


def test_disk_forward():
    model = build_model("extractors.disk", {
        "max_num_keypoints": 32, "channels": [8, 16, 32, 32], "descriptor_dim": 32,
    })
    data = {"image": _img()}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["keypoints"].shape == (1, 32, 2)
    assert pred["descriptors"].shape == (1, 32, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pred["descriptors"]), axis=-1), 1.0, atol=1e-4
    )


def test_xfeat_forward():
    model = build_model("extractors.xfeat", {
        "max_num_keypoints": 32, "detection_threshold": 0.0,
    })
    data = {"image": _img()}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["keypoints"].shape == (1, 32, 2)
    assert pred["descriptors"].shape == (1, 32, 64)
    assert np.isfinite(np.asarray(pred["descriptors"])).all()


def test_superpoint_open_alias():
    model = build_model("extractors.superpoint_open", {"max_num_keypoints": 16})
    data = {"image": _img()}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["keypoints"].shape == (1, 16, 2)


def test_aliked_light_teacher():
    model = build_model("extractors.aliked_light", {"model_name": "aliked-t16"})
    kpts = jnp.asarray(rng.uniform(5, 59, (1, 16, 2)), jnp.float32)
    data = {"image": _img(), "keypoints": kpts}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["descriptors"].shape == (1, 16, 64)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pred["descriptors"]), axis=-1), 1.0, atol=1e-4
    )


def test_mixed_extractor():
    model = build_model("extractors.mixed", {
        "detector": {
            "name": "extractors.superpoint", "max_num_keypoints": 16,
            "detection_threshold": 0.0, "has_descriptor": False,
            "channels": [8, 8, 16, 16, 32, 32, 32, 32], "head_channels": 16,
        },
        "descriptor": {
            "name": "extractors.disk", "channels": [8, 16, 32, 32],
            "descriptor_dim": 16, "dense_outputs": True, "max_num_keypoints": 4,
        },
    })
    data = {"image": _img()}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["keypoints"].shape == (1, 16, 2)
    assert pred["descriptors"].shape == (1, 16, 16)


def test_nn_point_line_matcher():
    B, N, L, D, S = 1, 16, 4, 16, 8
    dense = jnp.asarray(rng.normal(size=(B, 32, 32, D)), jnp.float32)
    lines = jnp.asarray(rng.uniform(4, 28, (B, L, 2, 2)), jnp.float32)
    desc = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
    data = {
        "descriptors0": desc, "descriptors1": desc,
        "descriptors_dense0": dense, "descriptors_dense1": dense,
        "lines0": lines, "lines1": lines,
        "valid_lines0": jnp.ones((B, L), bool),
        "valid_lines1": jnp.ones((B, L), bool),
    }
    model = build_model("matchers.nn_point_line", {})
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    # identical inputs: self-matching must be the identity
    np.testing.assert_array_equal(np.asarray(pred["matches0"][0]), np.arange(N))
    np.testing.assert_array_equal(np.asarray(pred["line_matches0"][0]), np.arange(L))


def test_line_matcher_oracle():
    L = 6
    lines0 = jnp.asarray(rng.uniform(10, 90, (1, L, 2, 2)), jnp.float32)
    perm = rng.permutation(L)
    lines1 = lines0[:, perm]
    data = {
        "lines0": lines0, "lines1": lines1,
        "H_0to1": jnp.eye(3, dtype=jnp.float32)[None],
    }
    model = build_model("matchers.line_matcher", {})
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    np.testing.assert_array_equal(
        np.asarray(pred["gt_line_matches0"][0]), np.argsort(perm)
    )
