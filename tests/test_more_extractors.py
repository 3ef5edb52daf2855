import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import build_model

rng = np.random.default_rng(41)


def _img(b=1, h=64, w=64):
    return jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32)


def test_disk_forward():
    model = build_model("extractors.disk", {
        "max_num_keypoints": 32, "down": [8, 16, 32], "up": [16],
        "descriptor_dim": 32,
    })
    data = {"image": _img(1, 60, 68)}  # pad_if_not_divisible path
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
            "name": "extractors.disk", "down": [8, 16, 32], "up": [16],
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


# ---------------------------------------------------------------------------
# KeyNet + AffNet + HardNet


def test_keynet_hardnet_forward():
    model = build_model("extractors.keynet_affnet_hardnet", {
        "max_num_keypoints": 48, "pyramid_levels": 2, "up_levels": 1,
        "detection_threshold": 0.0,
    })
    data = {"image": _img(2, 72, 88)}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["keypoints"].shape == (2, 48, 2)
    assert pred["descriptors"].shape == (2, 48, 128)
    assert pred["lafs"].shape == (2, 48, 2, 3)
    assert pred["scales"].shape == (2, 48)
    v = np.asarray(pred["keypoint_valid"])
    assert v.any()
    d = np.asarray(pred["descriptors"])[v]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    kp = np.asarray(pred["keypoints"])[v]
    assert (kp[:, 0] >= 0).all() and (kp[:, 0] < 88).all()
    assert (kp[:, 1] >= 0).all() and (kp[:, 1] < 72).all()


def test_keynet_affine_and_upright_paths():
    model = build_model("extractors.keynet_affnet_hardnet", {
        "max_num_keypoints": 16, "pyramid_levels": 2, "up_levels": 0,
        "affine_shape": True, "upright": True, "detection_threshold": 0.0,
    })
    data = {"image": _img(1, 64, 64)}
    params = model.init(jax.random.key(1), data)
    pred = model.apply(params, data)
    # upright: orientation stays zero; affine shape keeps LAF det = scale^2
    np.testing.assert_array_equal(np.asarray(pred["oris"]), 0.0)
    a = np.asarray(pred["lafs"])[0, :, :, :2]
    det = np.abs(a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0])
    sc = np.asarray(pred["scales"])[0]
    np.testing.assert_allclose(det, sc**2, rtol=0.05)


def test_dominant_orientation_equivariance():
    from gluefactory_tpu.models.extractors.keynet_affnet_hardnet import (
        dominant_orientation,
    )

    # a patch with a single strong gradient direction
    p = 32
    xs = np.linspace(0, 1, p, dtype=np.float32)
    base = np.tile(xs[None, :], (p, 1))  # gradient along +x
    rot90 = np.rot90(base).copy()  # gradient along +y (image coords)
    patches = jnp.asarray(
        np.stack([base, rot90])[..., None]
    )
    ang = np.asarray(dominant_orientation(patches))
    # +x gradient -> angle ~0; rotating the patch 90deg shifts it by pi/2
    assert abs(ang[0]) < 0.2
    diff = (ang[1] - ang[0] + np.pi) % (2 * np.pi) - np.pi
    assert abs(abs(diff) - np.pi / 2) < 0.2
