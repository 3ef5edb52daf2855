"""ETH3D two-view dataset for point/line matching AP evaluation
(reference: gluefactory/datasets/eth3d.py:63-255).

Expects the undistorted ETH3D training scenes on disk:
  <root>/<scene>/images/... + COLMAP text model in
  <root>/<scene>/dslr_calibration_undistorted/{cameras,images,points3D}.txt
  and ground-truth depth in <root>/<scene>/ground_truth_depth/<image_name>
  (raw float32, as distributed by ETH3D).

Pairs are built from covisibility: images sharing >= min_covisible 3D points
(reference eth3d.py:100-150)."""

from __future__ import annotations

from pathlib import Path
from typing import ClassVar

import numpy as np

from .. import logger
from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x**2 - 2 * y**2],
        ]
    )


def read_colmap_model_text(model_dir: Path):
    """Minimal COLMAP .txt model reader (cameras + images)."""
    cameras = {}
    for line in (model_dir / "cameras.txt").read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        el = line.split()
        cam_id, model, w, h = int(el[0]), el[1], int(el[2]), int(el[3])
        params = [float(x) for x in el[4:]]
        cameras[cam_id] = (model, w, h, params)
    images = {}
    lines = [
        l for l in (model_dir / "images.txt").read_text().splitlines()
        if not l.startswith("#") and l.strip()
    ]
    for i in range(0, len(lines), 2):
        el = lines[i].split()
        img_id = int(el[0])
        q = [float(x) for x in el[1:5]]
        t = [float(x) for x in el[5:8]]
        cam_id = int(el[8])
        name = el[9]
        pts = lines[i + 1].split()
        p3d_ids = np.array([int(x) for x in pts[2::3]], np.int64)
        images[img_id] = {
            "R": qvec2rotmat(q), "t": np.array(t), "camera_id": cam_id,
            "name": name, "p3d_ids": p3d_ids[p3d_ids >= 0],
        }
    return cameras, images


class ETH3DDataset(BaseDataset):
    default_conf: ClassVar[dict] = {
        "name": "eth3d",
        "data_dir": "ETH3D_undistorted",
        "min_covisible": 500,
        "max_pairs_per_scene": 50,
        "preprocessing": {"resize": 1024, "side": "long", "square_pad": True},
        "read_depth": False,
        "test_batch_size": 1,
        "num_workers": 2,
    }

    def _init(self, conf):
        root = Path(conf.data_dir)
        if not root.is_absolute():
            root = DATA_PATH / conf.data_dir
        if not root.exists():
            raise FileNotFoundError(f"ETH3D not found at {root} (zero-egress build)")
        self.root = root
        self.items = []
        rng = np.random.default_rng(int(conf.seed))
        for scene_dir in sorted(root.iterdir()):
            model_dir = scene_dir / "dslr_calibration_undistorted"
            if not model_dir.exists():
                continue
            cameras, images = read_colmap_model_text(model_dir)
            ids = sorted(images)
            pairs = []
            for a_i, a in enumerate(ids):
                for b in ids[a_i + 1 :]:
                    cov = len(
                        np.intersect1d(images[a]["p3d_ids"], images[b]["p3d_ids"])
                    )
                    if cov >= int(conf.min_covisible):
                        pairs.append((a, b, cov))
            if len(pairs) > int(conf.max_pairs_per_scene):
                sel = rng.choice(len(pairs), int(conf.max_pairs_per_scene), replace=False)
                pairs = [pairs[i] for i in sel]
            for a, b, cov in pairs:
                self.items.append((scene_dir.name, cameras, images, a, b))
        logger.info("[eth3d] %d covisible pairs", len(self.items))
        self.preprocessor = ImagePreprocessor(conf.preprocessing.to_dict())

    def get_dataset(self, split: str = "test"):
        return self

    def __len__(self):
        return len(self.items)

    def _view(self, scene: str, cameras, im) -> dict:
        img_path = self.root / scene / "images" / im["name"]
        view = self.preprocessor(read_image(img_path))
        model, w, h, params = cameras[im["camera_id"]]
        if model in ("PINHOLE", "OPENCV"):
            f = np.array(params[0:2])
            c = np.array(params[2:4])
        else:  # SIMPLE_PINHOLE / SIMPLE_RADIAL
            f = np.array([params[0], params[0]])
            c = np.array(params[1:3])
        cam = Camera.from_fc(
            size=np.array([w, h], np.float32), f=f.astype(np.float32),
            c=c.astype(np.float32),
        ).scale(view["scales"])
        view["camera"] = cam
        return view

    def __getitem__(self, idx: int) -> dict:
        scene, cameras, images, a, b = self.items[idx]
        im0, im1 = images[a], images[b]
        view0 = self._view(scene, cameras, im0)
        view1 = self._view(scene, cameras, im1)
        T0 = Pose.from_Rt(im0["R"].astype(np.float32), im0["t"].astype(np.float32))
        T1 = Pose.from_Rt(im1["R"].astype(np.float32), im1["t"].astype(np.float32))
        return {
            "view0": view0,
            "view1": view1,
            "T_0to1": T1.compose(T0.inv()),
            "idx": np.int32(idx),
            "name": f"{scene}/{a}_{b}",
        }


__main_dataset__ = ETH3DDataset
