"""MegaDepth loader + depth-GT pipeline on a synthetic on-disk scene:
rendered from a known 3D plane so the depth/pose supervision has an exact
analytic check (validates datasets/megadepth.py + geometry/gt_generation
depth path end-to-end without any downloads)."""

import cv2
import h5py
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gluefactory_tpu.core.config import Config
from gluefactory_tpu.datasets import get_dataset
from gluefactory_tpu.datasets.base_dataset import collate
from gluefactory_tpu.geometry.wrappers import Pose


@pytest.fixture(scope="module")
def fake_megadepth(tmp_path_factory):
    """Two views of a textured fronto-parallel plane at z=5, camera 1 shifted."""
    root = tmp_path_factory.mktemp("megadepth")
    scene = "0000"
    (root / "images").mkdir()
    (root / "depths").mkdir()
    (root / "scene_info").mkdir()
    rng = np.random.default_rng(3)
    H, W = 120, 160
    f = 200.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    # plane at z=5 with random texture; view i translated by t_i
    tex = (rng.uniform(0, 255, (400, 400, 3))).astype(np.uint8)
    tex = cv2.GaussianBlur(tex, (5, 5), 0)
    z = 5.0
    poses, image_paths, depth_paths = [], [], []
    # baseline 0.6 => disparity f*tx/z = 24px, a multiple of the 8px test grid
    for vi, tx in enumerate([0.0, 0.6]):
        # camera at (tx, 0, 0) looking down +z; world->cam: x_c = x_w - t
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -tx
        poses.append(T)
        # render: pixel (u,v) -> world point ((u-cx)/f*z + tx, (v-cy)/f*z, z)
        us, vs = np.meshgrid(np.arange(W), np.arange(H))
        xw = (us - W / 2) / f * z + tx
        yw = (vs - H / 2) / f * z
        # texture lookup: map world plane coords [-2,2] -> [0,400)
        ti = np.clip(((xw + 2) / 4 * 400).astype(int), 0, 399)
        tj = np.clip(((yw + 2) / 4 * 400).astype(int), 0, 399)
        img = tex[tj, ti]
        cv2.imwrite(str(root / "images" / f"{vi}.jpg"), img)
        with h5py.File(str(root / "depths" / f"{vi}.h5"), "w") as hf:
            hf.create_dataset("depth", data=np.full((H, W), z, np.float32))
        image_paths.append(f"images/{vi}.jpg")
        depth_paths.append(f"depths/{vi}.h5")
    np.savez(
        root / "scene_info" / f"{scene}.npz",
        image_paths=np.array(image_paths, dtype=object),
        depth_paths=np.array(depth_paths, dtype=object),
        intrinsics=np.stack([K, K]),
        poses=np.stack(poses),
        overlap_matrix=np.array([[0.0, 0.8], [0.8, 0.0]]),
    )
    return root


def test_megadepth_loader_and_depth_gt(fake_megadepth):
    conf = {
        "data_dir": str(fake_megadepth),
        "preprocessing": {"resize": 160, "side": "long", "square_pad": True},
        "train_num_per_scene": 2,
        "num_workers": 0,
        "train_batch_size": 1,
    }
    ds = get_dataset("megadepth")(conf)
    loader = ds.get_data_loader("train")
    batch = next(iter(loader))
    assert batch["view0"]["image"].shape == (1, 160, 160, 3)
    assert batch["view0"]["depth"].shape == (1, 160, 160)
    T: Pose = batch["T_0to1"]
    assert np.asarray(T.t).shape == (1, 3)
    # relative translation magnitude = 0.6 (camera baseline)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(T.t)), 0.6, atol=1e-5)

    # depth-GT supervision: project grid keypoints of view0 into view1 — the
    # plane geometry means matches must exist and be consistent.
    from gluefactory_tpu.models import build_model
    from gluefactory_tpu.train import filter_batch

    pipe = build_model(
        "two_view_pipeline",
        {
            "extractor": {"name": "extractors.grid_extractor", "cell_size": 8},
            "ground_truth": {"name": "matchers.depth_matcher", "th_positive": 3.0},
            "run_gt_in_forward": True,
        },
    )
    data = filter_batch(batch)
    params = pipe.init(jax.random.key(0), data)
    pred = pipe.apply(params, data)
    m0 = np.asarray(pred["gt_matches0"][0])
    n_matched = (m0 >= 0).sum()
    assert n_matched > 20, n_matched
    # matched pairs obey the analytic disparity: x1 = x0 - f*tx/z = x0 - 20px
    k0 = np.asarray(pred["keypoints0"][0])
    k1 = np.asarray(pred["keypoints1"][0])
    matched = m0 >= 0
    dx = k1[m0[matched], 0] - k0[matched, 0]
    dy = k1[m0[matched], 1] - k0[matched, 1]
    np.testing.assert_allclose(dx, -24.0, atol=3.0)
    np.testing.assert_allclose(dy, 0.0, atol=3.0)


@pytest.fixture(scope="module")
def fake_megadepth4(tmp_path_factory):
    """Four views of the textured plane with a spread of overlaps."""
    root = tmp_path_factory.mktemp("megadepth4")
    scene = "0004"
    (root / "images").mkdir()
    (root / "depths").mkdir()
    (root / "scene_info").mkdir()
    rng = np.random.default_rng(5)
    H, W = 96, 128
    f = 180.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    tex = cv2.GaussianBlur(
        rng.uniform(0, 255, (400, 400, 3)).astype(np.uint8), (5, 5), 0
    )
    z = 5.0
    poses, image_paths, depth_paths = [], [], []
    for vi, tx in enumerate([0.0, 0.3, 0.6, 0.9]):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -tx
        poses.append(T)
        us, vs = np.meshgrid(np.arange(W), np.arange(H))
        xw = (us - W / 2) / f * z + tx
        yw = (vs - H / 2) / f * z
        ti = np.clip(((xw + 2) / 4 * 400).astype(int), 0, 399)
        tj = np.clip(((yw + 2) / 4 * 400).astype(int), 0, 399)
        cv2.imwrite(str(root / "images" / f"{vi}.jpg"), tex[tj, ti])
        with h5py.File(str(root / "depths" / f"{vi}.h5"), "w") as hf:
            hf.create_dataset("depth", data=np.full((H, W), z, np.float32))
        image_paths.append(f"images/{vi}.jpg")
        depth_paths.append(f"depths/{vi}.h5")
    ov = np.array([
        [0.0, 0.9, 0.6, 0.35],
        [0.9, 0.0, 0.9, 0.6],
        [0.6, 0.9, 0.0, 0.9],
        [0.35, 0.6, 0.9, 0.0],
    ])
    np.savez(
        root / "scene_info" / f"{scene}.npz",
        image_paths=np.array(image_paths, dtype=object),
        depth_paths=np.array(depth_paths, dtype=object),
        intrinsics=np.stack([K] * 4),
        poses=np.stack(poses),
        overlap_matrix=ov,
    )
    return root


def test_megadepth_overlap_bins_and_sort(fake_megadepth4):
    base = {
        "data_dir": str(fake_megadepth4),
        "preprocessing": {"resize": 128, "side": "long", "square_pad": True},
        "num_workers": 0,
        "train_batch_size": 1,
        "min_overlap": 0.3,
        "max_overlap": 1.0,
    }
    # bin-balanced: with 2 bins over (0.3, 1.0] both low (0.35, 0.6) and
    # high (0.9) overlap pairs must appear
    ds = get_dataset("megadepth")(
        {**base, "num_overlap_bins": 2, "train_num_per_scene": 8}
    )
    split = ds.get_dataset("train")
    ovs = np.array([it[-1] for it in split.items])
    assert (ovs <= 0.65).any() and (ovs > 0.65).any(), ovs
    # sort_by_overlap: served in decreasing-overlap order
    ds = get_dataset("megadepth")(
        {**base, "sort_by_overlap": True, "train_num_per_scene": 6}
    )
    split = ds.get_dataset("train")
    ovs = [it[-1] for it in split.items]
    assert ovs == sorted(ovs, reverse=True)


def test_megadepth_triplets_with_pipeline(fake_megadepth4):
    ds = get_dataset("megadepth")(
        {
            "data_dir": str(fake_megadepth4),
            "preprocessing": {"resize": 128, "side": "long", "square_pad": True},
            "views": 3,
            "train_num_per_scene": 4,
            "num_workers": 0,
            "train_batch_size": 1,
        }
    )
    loader = ds.get_data_loader("train")
    batch = next(iter(loader))
    assert "view2" in batch and "T_1to2" in batch
    # T_0to1 * T_1to2 == T_0to2 (composition consistency)
    T_0to2 = batch["T_1to2"].compose(batch["T_0to1"])
    np.testing.assert_allclose(
        np.asarray(T_0to2.t), np.asarray(batch["T_0to2"].t), atol=1e-5
    )
    # 3-view smoke through TripletPipeline (grid extractor + NN matcher)
    from gluefactory_tpu.models import build_model
    from gluefactory_tpu.train import filter_batch

    model = build_model(
        "triplet_pipeline",
        {
            "extractor": {
                "name": "extractors.grid_extractor", "cell_size": 16,
            },
            "matcher": {"name": "matchers.nearest_neighbor_matcher"},
        },
    )
    data = filter_batch(batch)
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    for k in ["matches0_0to1", "matches0_0to2", "matches0_1to2"]:
        assert k in pred, sorted(pred.keys())[:20]


def test_megadepth_cached_features_training_path(fake_megadepth, tmp_path):
    """Cached-feature serving (load_features.do) feeds a matcher-only train
    step with allow_no_extract (reference stage-2 recipe)."""
    # build a fake per-scene feature cache keyed by relative image path
    cache = tmp_path / "0000.h5"
    rng2 = np.random.default_rng(0)
    with h5py.File(str(cache), "w") as f:
        for vi in range(2):
            g = f.create_group(f"images/{vi}.jpg")
            n = 40 + vi * 5
            g.create_dataset(
                "keypoints", data=rng2.uniform(0, 120, (n, 2)).astype(np.float32)
            )
            g.create_dataset(
                "descriptors", data=rng2.normal(size=(n, 32)).astype(np.float32)
            )
            g.create_dataset(
                "keypoint_scores", data=rng2.uniform(0.1, 1, n).astype(np.float32)
            )
    ds = get_dataset("megadepth")(
        {
            "data_dir": str(fake_megadepth),
            "preprocessing": {"resize": 160, "side": "long", "square_pad": True},
            "train_num_per_scene": 2,
            "num_workers": 0,
            "train_batch_size": 1,
            "load_features": {
                "do": True, "path": str(cache).replace("0000", "{scene}"),
                "padding_length": 64,
            },
        }
    )
    loader = ds.get_data_loader("train")
    batch = next(iter(loader))
    assert batch["view0"]["cache"]["keypoints"].shape == (1, 64, 2)
    assert batch["view0"]["cache"]["keypoint_valid"].sum() == 40
    from gluefactory_tpu.models import build_model
    from gluefactory_tpu.train import filter_batch

    model = build_model(
        "two_view_pipeline",
        {
            "extractor": {"name": None},
            "allow_no_extract": True,
            "matcher": {
                "name": "matchers.lightglue",
                "input_dim": 32, "descriptor_dim": 32,
                "n_layers": 2, "num_heads": 2, "flash": False,
                "checkpointed": False,
            },
            "ground_truth": {"name": "matchers.depth_matcher"},
            "run_gt_in_forward": True,
        },
    )
    data = filter_batch(batch)
    params = model.init(jax.random.key(0), data, method=model.forward_and_loss)
    import jax as _jax

    def loss_fn(p):
        pred = model.apply(p, data)
        losses, _ = model.apply(p, pred, data, method=model.loss)
        return jnp.mean(losses["total"])

    val, g = _jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    gn = float(jnp.sqrt(sum(jnp.sum(x**2) for x in _jax.tree.leaves(g))))
    assert np.isfinite(gn)
