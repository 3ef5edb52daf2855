"""On-device homography data engine: in-jit batch construction, GT
consistency, homography sampling sanity, SuperPoint training-loss path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.core.config import Config
from gluefactory_tpu.datasets import get_dataset
from gluefactory_tpu.geometry.homography import (
    sample_homography_batch,
    warp_points,
)
from gluefactory_tpu.ops.photometric import photometric_augment
from gluefactory_tpu.ops.warp import warp_image


def small_engine(**over):
    conf = {
        "name": "homographies_ondevice",
        "pool_size": 6,
        "val_pool_size": 3,
        "source_size": [192, 192],
        "image_size": 128,
        "max_gt_points": 48,
        "train_batch_size": 4,
        "val_batch_size": 4,
        "steps_per_epoch": 2,
        "val_steps": 1,
        **over,
    }
    return get_dataset("homographies_ondevice")(Config(conf))


def test_sample_homography_batch_valid():
    H, coords = jax.jit(
        sample_homography_batch, static_argnums=(1, 2, 3)
    )(jax.random.key(3), 64, (320, 240), (160, 160))
    H = np.asarray(H)
    coords = np.asarray(coords)
    assert np.isfinite(H).all() and np.isfinite(coords).all()
    # quads stay inside the source image
    assert coords[..., 0].min() >= -1e-3 and coords[..., 0].max() <= 320 + 1e-3
    assert coords[..., 1].min() >= -1e-3 and coords[..., 1].max() <= 240 + 1e-3
    # H maps each source quad corner onto the canvas corner
    target = np.array([[0, 0], [160, 0], [160, 160], [0, 160]], np.float32)
    mapped = np.asarray(warp_points(jnp.asarray(coords), jnp.asarray(H)))
    assert np.abs(mapped - target).max() < 1e-2
    # all quads convex: positive cross products in a consistent orientation
    d = np.roll(coords, -1, axis=1) - coords
    d2 = np.roll(d, -1, axis=1)
    cross = d[..., 0] * d2[..., 1] - d[..., 1] * d2[..., 0]
    assert ((cross > 0).all(axis=1) | (cross < 0).all(axis=1)).all()


def test_warp_image_identity_and_shift():
    img = jnp.arange(64.0).reshape(1, 8, 8, 1)
    eye = jnp.eye(3)[None]
    out = warp_image(img, eye, (8, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # integer translation by (1, 0): dst(x) = src(x - 1)
    T = jnp.asarray(np.array([[[1, 0, 1], [0, 1, 0], [0, 0, 1]]], np.float32))
    out = np.asarray(warp_image(img, T, (8, 8)))[0, :, :, 0]
    ref = np.asarray(img)[0, :, :, 0]
    np.testing.assert_allclose(out[:, 1:], ref[:, :-1], atol=1e-5)
    assert np.all(out[:, 0] == 0.0)  # fill outside


def test_photometric_augment_bounds():
    key = jax.random.key(0)
    img = jax.random.uniform(jax.random.key(1), (6, 32, 32, 1))
    out = photometric_augment(key, img, p=1.0, strength=1.0)
    out = np.asarray(out)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # stochastic: different keys give different outputs
    out2 = np.asarray(photometric_augment(jax.random.key(2), img))
    assert np.abs(out - out2).max() > 1e-3


def test_engine_batch_gt_consistency():
    ds = small_engine()
    pool = ds.build_pool("train")
    assert pool["images"].dtype == np.uint8
    batch = jax.jit(ds.make_batch, static_argnames="split")(
        pool, jax.random.key(0), split="train"
    )
    wp = np.asarray(warp_points(batch["gt_keypoints0"], batch["H_0to1"]))
    kp1 = np.asarray(batch["gt_keypoints1"])
    both = np.asarray(batch["gt_keypoint_valid0"] & batch["gt_keypoint_valid1"])
    assert both.any()
    assert np.abs((wp - kp1))[both].max() < 1e-2
    im = np.asarray(batch["view0"]["image"])
    assert im.shape == (4, 128, 128, 1) and im.min() >= 0 and im.max() <= 1


def test_engine_batch_deterministic_per_seed():
    ds = small_engine()
    pool = ds.build_pool("train")
    fn = jax.jit(ds.make_batch, static_argnames="split")
    a = fn(pool, jax.random.key(5), split="train")
    b = fn(pool, jax.random.key(5), split="train")
    np.testing.assert_array_equal(
        np.asarray(a["view1"]["image"]), np.asarray(b["view1"]["image"])
    )
    c = fn(pool, jax.random.key(6), split="train")
    assert np.abs(
        np.asarray(a["view1"]["image"]) - np.asarray(c["view1"]["image"])
    ).max() > 1e-3


def test_engine_loader_seeds_disjoint():
    ds = small_engine()
    tr = ds.get_data_loader("train")
    va = ds.get_data_loader("val")
    tr.set_epoch(0)
    s_tr = [b["seed"] for b in tr]
    s_va = [b["seed"] for b in va]
    assert len(set(s_tr) & set(s_va)) == 0
    tr.set_epoch(1)
    s_tr2 = [b["seed"] for b in tr]
    assert len(set(s_tr) & set(s_tr2)) == 0


def test_superpoint_loss_and_grads():
    from gluefactory_tpu.models import build_model

    ds = small_engine()
    pool = ds.build_pool("train")
    batch = jax.jit(ds.make_batch, static_argnames="split")(
        pool, jax.random.key(1), split="train"
    )
    model = build_model(
        "two_view_pipeline",
        {
            "extractor": {
                "name": "extractors.superpoint",
                "max_num_keypoints": 64,
                "detection_threshold": 0.0,
                "training_outputs": True,
            }
        },
    )
    params = model.init(jax.random.key(0), batch, method=model.forward_and_loss)

    def loss_fn(p):
        pred = model.apply(p, batch)
        losses, metrics = model.apply(p, pred, batch, method=model.loss)
        return jnp.mean(losses["total"]), (losses, metrics)

    (total, (losses, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )
    assert np.isfinite(float(total))
    for k in ["det_ce0", "det_ce1", "desc_hinge"]:
        assert np.isfinite(np.asarray(losses[k])).all(), k
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads)))
    )
    assert gnorm > 0 and np.isfinite(gnorm)
    assert 0 <= float(np.mean(np.asarray(metrics["kp_recall0"]))) <= 1


def test_cell_labels_exact():
    from gluefactory_tpu.models.extractors.superpoint import _cell_labels

    kp = jnp.asarray([[[3.0, 2.0], [9.0, 8.0], [1000.0, 2.0], [5.0, 5.0]]])
    valid = jnp.asarray([[True, True, True, False]])
    labels = np.asarray(_cell_labels(kp, valid, 2, 2))
    assert labels.shape == (1, 2, 2)
    assert labels[0, 0, 0] == 2 * 8 + 3  # (x=3, y=2) -> cell(0,0), within row2 col3
    assert labels[0, 1, 1] == 0 * 8 + 1  # (9, 8) -> cell(1,1), within row0 col1
    assert labels[0, 0, 1] == 64  # out-of-range kp dropped
    assert labels[0, 1, 0] == 64  # invalid kp ignored


@pytest.mark.parametrize("split", ["train", "val"])
def test_engine_val_pool_disjoint(split):
    ds = small_engine()
    pool = ds.build_pool(split)
    n = 3 if split == "val" else 6
    assert pool["images"].shape[0] == n


def test_superpoint_loc_peaky_losses():
    """loc_weight/peaky_weight wire kp_losses into SuperPoint.loss: the extra
    terms appear, are finite, contribute to total, and gradients flow."""
    from gluefactory_tpu.models import build_model

    ds = small_engine()
    pool = ds.build_pool("train")
    batch = jax.jit(ds.make_batch, static_argnames="split")(
        pool, jax.random.key(1), split="train"
    )
    model = build_model(
        "two_view_pipeline",
        {
            "extractor": {
                "name": "extractors.superpoint",
                "max_num_keypoints": 64,
                "detection_threshold": 0.0,
                "refinement_radius": 2,
                "training_outputs": True,
                "loss": {"loc_weight": 2.0, "peaky_weight": 0.5},
            }
        },
    )
    params = model.init(jax.random.key(0), batch, method=model.forward_and_loss)

    def loss_fn(p):
        pred = model.apply(p, batch)
        losses, _ = model.apply(p, pred, batch, method=model.loss)
        return jnp.mean(losses["total"]), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    for k in ["kp_loc0", "kp_loc1", "kp_peaky0", "kp_peaky1"]:
        assert k in losses and np.isfinite(np.asarray(losses[k])).all(), k
    # loc loss is a mean pixel distance within the window -> bounded by its
    # diagonal; peaky in [0, 1]
    assert 0 <= float(np.mean(np.asarray(losses["kp_loc0"]))) < 6.0
    assert 0 <= float(np.mean(np.asarray(losses["kp_peaky0"]))) <= 1.0
    assert np.isfinite(float(total))
    gnorm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))))
    assert gnorm > 0 and np.isfinite(gnorm)
