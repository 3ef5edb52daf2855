"""End-to-end drives of the offline tooling CLIs: feature export and
homography-adaptation pseudo-GT generation (reference §2.11 scripts)."""

import sys

import cv2
import h5py
import numpy as np
import pytest

from gluefactory_tpu.datasets.homographies import generate_structured_image


@pytest.fixture()
def image_dir(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(5)
    for i in range(2):
        img = (generate_structured_image(rng, (96, 72)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"im{i}.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return d


def test_export_features_cli(image_dir, tmp_path, monkeypatch):
    from gluefactory_tpu.scripts.export_features import main

    out = tmp_path / "feats.h5"
    monkeypatch.setattr(
        sys, "argv",
        ["export_features", "--dataset", "image_folder",
         "--method", "extractors.superpoint", "--output", str(out),
         f"data.images={image_dir}", "data.preprocessing.resize=72",
         "model.max_num_keypoints=32", "model.detection_threshold=0.0",
         "model.channels=[8,8,16,16,32,32,32,32]", "model.head_channels=16",
         "model.descriptor_dim=16"],
    )
    main()
    with h5py.File(str(out), "r") as f:
        names = sorted(f.keys())
        assert len(names) == 2
        g = f[names[0]]
        assert g["keypoints"].shape == (32, 2)
        assert g["descriptors"].shape == (32, 16)
        assert np.asarray(g["keypoint_valid"]).any()


def test_generate_gt_cli(image_dir, tmp_path, monkeypatch):
    from gluefactory_tpu.scripts.generate_gt import main

    out = tmp_path / "gt.h5"
    monkeypatch.setattr(
        sys, "argv",
        ["generate_gt", "--dataset", "image_folder",
         "--model", "extractors.superpoint", "--fields", "heatmap",
         "--num_H", "4", "--output", str(out),
         f"data.images={image_dir}", "data.preprocessing.resize=64",
         "model.max_num_keypoints=16", "model.detection_threshold=0.0",
         "model.channels=[8,8,16,16,32,32,32,32]", "model.head_channels=16",
         "model.descriptor_dim=16"],
    )
    main()
    with h5py.File(str(out), "r") as f:
        names = sorted(f.keys())
        assert len(names) == 2
        heat = np.asarray(f[names[0]]["heatmap"], np.float32)
        assert heat.shape == (64, 64)
        assert np.isfinite(heat).all() and heat.max() > 0
