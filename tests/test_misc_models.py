import cv2
import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.datasets import get_dataset
from gluefactory_tpu.datasets.homographies import generate_structured_image
from gluefactory_tpu.models import build_model

rng = np.random.default_rng(17)


def test_sift_extractor():
    img = generate_structured_image(rng, (160, 120))
    data = {"image": jnp.asarray(img)[None]}
    model = build_model("extractors.sift", {"max_num_keypoints": 128})
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    valid = np.asarray(pred["keypoint_valid"][0])
    assert valid.sum() > 10
    desc = np.asarray(pred["descriptors"][0])[valid]
    np.testing.assert_allclose(np.linalg.norm(desc, axis=-1), 1.0, atol=1e-4)
    assert np.asarray(pred["scales"][0])[valid].min() > 0


def test_sift_matches_self():
    """SIFT + NN on an image vs itself: near-perfect self-matching."""
    img = generate_structured_image(rng, (160, 120))
    pipe = build_model(
        "two_view_pipeline",
        {
            "extractor": {"name": "extractors.sift", "max_num_keypoints": 64},
            "matcher": {"name": "matchers.nearest_neighbor_matcher"},
        },
    )
    data = {
        "view0": {"image": jnp.asarray(img)[None]},
        "view1": {"image": jnp.asarray(img)[None]},
    }
    params = pipe.init(jax.random.key(0), data)
    pred = pipe.apply(params, data)
    m0 = np.asarray(pred["matches0"][0])
    valid = np.asarray(pred["keypoint_valid0"][0])
    idx = np.arange(len(m0))
    agree = (m0[valid] == idx[valid]).mean()
    assert agree > 0.9, agree


def test_triplet_pipeline_forward_loss():
    B, s = 1, 64
    imgs = [jnp.asarray(rng.uniform(0, 1, (B, s, s, 3)), jnp.float32) for _ in range(3)]
    H_id = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    data = {
        "view0": {"image": imgs[0], "image_size": jnp.full((B, 2), float(s))},
        "view1": {"image": imgs[0], "image_size": jnp.full((B, 2), float(s))},
        "view2": {"image": imgs[0], "image_size": jnp.full((B, 2), float(s))},
        "H_0to1": H_id, "H_0to2": H_id, "H_1to2": H_id,
    }
    pipe = build_model(
        "triplet_pipeline",
        {
            "extractor": {
                "name": "extractors.superpoint", "max_num_keypoints": 32,
                "detection_threshold": 0.0,
                "channels": [8, 8, 16, 16, 32, 32, 32, 32],
                "head_channels": 32, "descriptor_dim": 32,
            },
            "matcher": {
                "name": "matchers.lightglue", "input_dim": 32, "descriptor_dim": 32,
                "n_layers": 2, "num_heads": 2, "checkpointed": False, "flash": False,
            },
            "ground_truth": {"name": "matchers.homography_matcher"},
        },
    )
    params = pipe.init(jax.random.key(0), data, method=pipe.forward_and_loss)
    pred = pipe.apply(params, data)
    for name in ("0to1", "0to2", "1to2"):
        assert f"matches0_{name}" in pred
    losses, _ = pipe.apply(params, pred, data, method=pipe.loss)
    assert np.isfinite(np.asarray(losses["total"])).all()


def test_image_folder_and_merge(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        img = (generate_structured_image(rng, (64, 48)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"{i}.png"), img)
    ds = get_dataset("image_folder")(
        {"images": str(d), "preprocessing": {"resize": 48, "side": "long"}}
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape[2] == 3
    merged = get_dataset("merge_datasets")(
        {
            "datasets": {
                "a": {"name": "synthetic_shapes", "image_size": 48, "train_size": 3},
                "b": {"name": "synthetic_shapes", "image_size": 48, "train_size": 2},
            }
        }
    )
    split = merged.get_dataset("train")
    assert len(split) == 5
    item = split.getitem(4, rng)
    assert item["dataset"] in ("a", "b")
