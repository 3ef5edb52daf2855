import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import build_model

rng = np.random.default_rng(13)


def test_superpoint_shapes_and_masks():
    model = build_model(
        "extractors.superpoint",
        {
            "max_num_keypoints": 64,
            "detection_threshold": 0.0,
            "channels": [8, 8, 16, 16, 32, 32, 32, 32],
            "head_channels": 32,
            "descriptor_dim": 32,
        },
    )
    img = jnp.asarray(rng.uniform(0, 1, (2, 64, 96, 3)), jnp.float32)
    data = {"image": img, "image_size": jnp.asarray([[96.0, 64.0], [48.0, 32.0]])}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["keypoints"].shape == (2, 64, 2)
    assert pred["descriptors"].shape == (2, 64, 32)
    # keypoints of image 1 must respect its smaller valid area
    kp1 = np.asarray(pred["keypoints"][1])
    v1 = np.asarray(pred["keypoint_valid"][1])
    assert (kp1[v1, 0] <= 48).all() and (kp1[v1, 1] <= 32).all()
    # descriptors unit norm
    d = np.linalg.norm(np.asarray(pred["descriptors"]), axis=-1)
    np.testing.assert_allclose(d, 1.0, atol=1e-4)


def test_aliked_forward():
    model = build_model(
        "extractors.aliked",
        {"model_name": "aliked-t16", "max_num_keypoints": 32, "detection_threshold": 0.0},
    )
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    data = {"image": img}
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["keypoints"].shape == (1, 32, 2)
    assert pred["descriptors"].shape == (1, 32, 64)
    assert np.isfinite(np.asarray(pred["descriptors"])).all()
    d = np.linalg.norm(np.asarray(pred["descriptors"]), axis=-1)
    np.testing.assert_allclose(d, 1.0, atol=1e-4)


def test_superpoint_bf16_close_to_f32():
    conf = {
        "max_num_keypoints": 32,
        "detection_threshold": 0.0,
        "channels": [8, 8, 16, 16, 32, 32, 32, 32],
        "head_channels": 32,
        "descriptor_dim": 32,
    }
    img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    m32 = build_model("extractors.superpoint", conf)
    params = m32.init(jax.random.key(0), {"image": img})
    p32 = m32.apply(params, {"image": img})
    m16 = build_model("extractors.superpoint", {**conf, "dtype": "bf16"})
    p16 = m16.apply(params, {"image": img})
    # same top keypoints modulo bf16 noise: compare score maps loosely
    s32 = np.asarray(p32["keypoint_scores"][0])
    s16 = np.asarray(p16["keypoint_scores"][0])
    np.testing.assert_allclose(s16, s32, atol=0.02)
