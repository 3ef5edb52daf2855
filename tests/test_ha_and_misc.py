import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.geometry.homography_adaptation import (
    homography_adaptation,
    sample_homographies_np,
    warp_dense,
)

rng = np.random.default_rng(23)


def test_warp_dense_identity_and_shift():
    field = jnp.asarray(rng.uniform(0, 1, (1, 16, 16)), jnp.float32)
    H_id = jnp.eye(3)[None]
    out, valid = warp_dense(field, H_id)
    np.testing.assert_allclose(np.asarray(out), np.asarray(field), atol=1e-5)
    assert bool(valid.all())
    # shift by +2 in x: out(x) = field(x - 2)
    H_shift = jnp.asarray(np.array([[[1, 0, 2.0], [0, 1, 0], [0, 0, 1]]]), jnp.float32)
    out, valid = warp_dense(field, H_shift)
    np.testing.assert_allclose(
        np.asarray(out[0, :, 2:]), np.asarray(field[0, :, :-2]), atol=1e-5
    )
    assert not bool(valid[0, :, :2].any())


def test_homography_adaptation_identity_model():
    """A model returning the image itself must aggregate back to the image
    (up to interpolation) — validates warp/unwarp inverse consistency."""
    # smooth image: warp+unwarp interpolation error on white noise would
    # dominate, so low-pass the test field
    import cv2

    raw = rng.uniform(0, 1, (2, 32, 32)).astype(np.float32)
    smooth = np.stack([cv2.GaussianBlur(x, (7, 7), 2.0) for x in raw])
    img = jnp.asarray(smooth[..., None], jnp.float32)
    Hs = jnp.asarray(sample_homographies_np(6, (32, 32), np.random.default_rng(0),
                                            difficulty=0.3))

    def fwd(images):
        return {"heatmap": images[..., 0]}

    out = homography_adaptation(img, Hs, fwd, field_keys=("heatmap",))
    agg = np.asarray(out["heatmap"])
    # center crop (borders lose coverage)
    err = np.abs(agg[:, 8:-8, 8:-8] - np.asarray(img[..., 0])[:, 8:-8, 8:-8])
    assert np.median(err) < 0.1, np.median(err)
    assert np.asarray(out["heatmap_count"]).max() <= 6


def test_timing_harness_runs():
    from gluefactory_tpu.eval.timing_measurement import measure_pipeline
    from gluefactory_tpu.models import build_model

    model = build_model(
        "two_view_pipeline",
        {
            "extractor": {
                "name": "extractors.superpoint", "max_num_keypoints": 16,
                "detection_threshold": 0.0,
                "channels": [4, 4, 8, 8, 16, 16, 16, 16], "head_channels": 16,
                "descriptor_dim": 16,
            },
            "matcher": {"name": "matchers.nearest_neighbor_matcher"},
        },
    )
    out = measure_pipeline(model, batch=1, size=32, iters=2, warmup=1)
    assert out["pairs_per_s"] > 0 and np.isfinite(out["ms_per_pair"])


def test_scannet_scene_sampling_and_multiscale(tmp_path):
    """Scene-structured equidistant sampling + per-epoch multiscale cycling
    (reference scannet.py:145-211, 509-598)."""
    import cv2
    import h5py

    from gluefactory_tpu.datasets import get_dataset

    root = tmp_path / "scannet" / "images"
    gt_file = tmp_path / "scannet" / "gt_fields.h5"
    gt_file.parent.mkdir(parents=True, exist_ok=True)
    rng2 = np.random.default_rng(0)
    with h5py.File(str(gt_file), "w") as f:
        for s in range(3):
            scene = root / f"scene{s:04d}" / "color"
            scene.mkdir(parents=True)
            for i in range(12):
                img = (rng2.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
                cv2.imwrite(str(scene / f"{i:03d}.jpg"), img)
                g = f.create_group(f"scene{s:04d}/color/{i:03d}.jpg")
                g.create_dataset("heatmap", data=rng2.uniform(0, 1, (48, 64)).astype(np.float32))
    ds = get_dataset("scannet")(
        {
            "images": str(root), "gt_file": str(gt_file),
            "num_images": 8,  # budget < total -> equidistant subsampling
            "val_scene_frac": 0.34,
            "multiscale_sizes": [64, 96],
            "preprocessing": {"resize": 64, "side": "long", "square_pad": True},
            "num_workers": 0, "train_batch_size": 2,
            "fields": ["heatmap"],
        }
    )
    tr = ds.get_dataset("train")
    va = ds.get_dataset("val")
    # scenes are disjoint between splits
    tr_scenes = {p.parts[-3] for p in tr.paths}
    va_scenes = {p.parts[-3] for p in va.paths}
    assert tr_scenes and va_scenes and not (tr_scenes & va_scenes)
    # equidistant budget: ~4/scene from 12 frames, spread across the range
    per_scene = [p.stem for p in tr.paths if p.parts[-3] == sorted(tr_scenes)[0]]
    assert 3 <= len(per_scene) <= 5
    assert per_scene[0] == "000" and int(per_scene[-1]) >= 9
    # multiscale: epoch cycles the resize
    loader = ds.get_data_loader("train")
    loader.set_epoch(0)
    b0 = next(iter(loader))
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert b0["image"].shape[1:3] == (64, 64)
    assert b1["image"].shape[1:3] == (96, 96)
    assert b0["gt_heatmap"].shape[1:] == (64, 64)


def test_cached_gt_scene_list_splits(tmp_path):
    """Scene-list txt files override the positional val split
    (reference minidepth.py:77-78 train/val_scenes_file_path)."""
    import cv2
    import h5py

    from gluefactory_tpu.datasets import get_dataset

    root = tmp_path / "mini" / "images"
    gt_file = tmp_path / "mini" / "gt_fields.h5"
    gt_file.parent.mkdir(parents=True, exist_ok=True)
    rng2 = np.random.default_rng(1)
    with h5py.File(str(gt_file), "w") as f:
        for s in range(4):
            scene = root / f"scene{s}"
            scene.mkdir(parents=True)
            for i in range(3):
                img = (rng2.uniform(0, 255, (32, 40, 3))).astype(np.uint8)
                cv2.imwrite(str(scene / f"{i}.jpg"), img)
                g = f.create_group(f"scene{s}/{i}.jpg")
                g.create_dataset(
                    "heatmap",
                    data=rng2.uniform(0, 1, (32, 40)).astype(np.float32))
    (tmp_path / "train.txt").write_text("scene0\nscene2\n\n# comment\n")
    (tmp_path / "val.txt").write_text("scene3\n")
    ds = get_dataset("cached_gt_dataset")(
        {
            "images": str(root), "gt_file": str(gt_file),
            "train_scenes_file": str(tmp_path / "train.txt"),
            "val_scenes_file": str(tmp_path / "val.txt"),
            "preprocessing": {"resize": 32, "side": "long", "square_pad": True},
            "num_workers": 0, "train_batch_size": 2,
            "fields": ["heatmap"],
        }
    )
    tr = ds.get_dataset("train")
    va = ds.get_dataset("val")
    assert {p.parts[-2] for p in tr.paths} == {"scene0", "scene2"}
    assert {p.parts[-2] for p in va.paths} == {"scene3"}
    # scene1 is in neither split; 'all' still serves everything
    assert len(ds.get_dataset("all").paths) == 12
    item = tr[0]
    assert item["gt_heatmap"].shape == (32, 40) or item["gt_heatmap"].shape == (32, 32)


def test_cached_gt_multiscale_and_point_gt(tmp_path):
    """Per-epoch multiscale (one static shape per epoch) + sparse keypoint
    GT slots served from the cache (reference minidepth.py
    multiscale_learning:42-46, load_features.point_gt:50-63)."""
    import cv2
    import h5py

    from gluefactory_tpu.datasets import get_dataset

    root = tmp_path / "mini" / "images"
    gt_file = tmp_path / "mini" / "gt_fields.h5"
    gt_file.parent.mkdir(parents=True, exist_ok=True)
    rng2 = np.random.default_rng(2)
    with h5py.File(str(gt_file), "w") as f:
        root.mkdir(parents=True, exist_ok=True)
        for i in range(6):
            img = (rng2.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
            cv2.imwrite(str(root / f"{i}.jpg"), img)
            g = f.create_group(f"{i}.jpg")
            g.create_dataset(
                "heatmap", data=rng2.uniform(0, 1, (48, 64)).astype(np.float32))
            g.create_dataset(
                "keypoints",
                data=rng2.uniform(0, 40, (10, 2)).astype(np.float32))
            g.create_dataset(
                "keypoint_scores",
                data=np.arange(10, 0, -1).astype(np.float32))
    ds = get_dataset("cached_gt_dataset")(
        {
            "images": str(root), "gt_file": str(gt_file),
            "preprocessing": {"resize": 32, "side": "long",
                              "square_pad": True},
            "num_workers": 0, "train_batch_size": 2, "val_size": 2,
            "fields": ["heatmap"],
            "multiscale": {"do": True, "scales_list": [32, 48],
                           "scale_selection": "round-robin"},
            "point_gt": {"load_points": True, "max_num_keypoints": 6},
        }
    )
    loader = ds.get_data_loader("train")
    loader.set_epoch(0)
    b0 = next(iter(loader))
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert b0["image"].shape[1:3] == (32, 32)
    assert b1["image"].shape[1:3] == (48, 48)
    # sparse GT: fixed slots, top-k by score, scaled into the view frame
    assert b0["gt_keypoints"].shape == (2, 6, 2)
    assert b0["gt_keypoint_valid"].all()  # 10 cached > 6 slots
    assert (b0["gt_keypoint_scores"][:, 0] >= b0["gt_keypoint_scores"][:, -1]).all()
    assert float(b0["gt_keypoints"].max()) <= 32.0
