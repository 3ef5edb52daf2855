"""On-device homography data engine — TPU-native stage-1 training data
(reference: gluefactory/datasets/homographies.py:47-311, re-designed).

The reference (and the round-1 ``homographies`` dataset here) generates each
training pair on the host CPU — decode/draw a source image, cv2.warpPerspective
twice, photometric augmentation — and ships the full image batch to the
accelerator every step. Through a remote TPU link that is the bottleneck
(measured ~2 samples/s end-to-end).

This engine instead keeps a fixed *pool* of source images resident in HBM
(uint8, uploaded once) and performs ALL per-step work inside the jitted train
step, keyed by a single scalar seed:

  pool gather -> sample_homography_batch (geometry/homography.py, in-jit)
  -> warp_image (ops/warp.py) -> photometric_augment (ops/photometric.py)
  -> exact keypoint GT warping + H_0to1 composition.

Per-step host->device traffic is ONE int seed. The same engine serves
SuperPoint training (``gt_keypoints*`` labels come from the procedural
drawing's exact vertices) and LightGlue/GlueStick training (``H_0to1`` feeds
the homography ground-truth matcher in-jit).

The pool can be procedural (zero downloads; default) or built from a folder
of real images when data is present.
"""

from __future__ import annotations

from typing import ClassVar

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.homography import sample_homography_batch, warp_points
from ..ops.photometric import photometric_augment
from ..ops.warp import warp_image
from .base_dataset import BaseDataset


def generate_structured_scene(
    rng: np.random.Generator, size: tuple[int, int], max_points: int,
    max_segments: int = 0,
):
    """Procedural grayscale scene with exact corner ground truth.

    Draws filled polygons, rectangles, checkerboards, lines and ellipses on a
    shaded background; every polygon vertex / rectangle corner / checker
    corner / line endpoint is recorded as a GT keypoint.

    Returns (image (h, w, 1) float32 in [0,1], points (max_points, 2),
    valid (max_points,)). With ``max_segments > 0`` additionally returns
    (segments (max_segments, 2, 2), segment_valid) — the drawn EDGES
    (polygon/rectangle sides, checker grid lines, line segments), recorded
    from the same data the drawing already uses (NO extra rng draws, so
    images are bit-identical with or without segment recording; line models
    can therefore train on the exact family every benchmark renders)."""
    w, h = size
    gx = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    gy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    a, b, c = rng.uniform(0.1, 0.9, 3)
    img = np.ascontiguousarray((a * gx + b * gy + c) / (a + b + c + 1e-8))
    img *= rng.uniform(0.3, 0.9)
    points: list[np.ndarray] = []
    segments: list[np.ndarray] = []

    def add_pts(pts):
        for p in np.atleast_2d(pts):
            if 2 <= p[0] < w - 2 and 2 <= p[1] < h - 2:
                points.append(np.asarray(p, np.float32))

    def add_seg(p0, p1):
        seg = np.asarray([p0, p1], np.float32)
        if np.linalg.norm(seg[1] - seg[0]) >= 8.0:
            segments.append(seg)

    n_shapes = int(rng.integers(12, 26))
    for _ in range(n_shapes):
        color = float(rng.uniform(0, 1))
        kind = int(rng.integers(0, 5))
        if kind == 0:  # polygon
            n_pts = int(rng.integers(3, 7))
            cx, cy = rng.uniform(0, w), rng.uniform(0, h)
            r = rng.uniform(10, min(w, h) / 4)
            ang = np.sort(rng.uniform(0, 2 * np.pi, n_pts))
            pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], -1)
            cv2.fillPoly(img, [pts.astype(np.int32)], color)
            ipts = pts.astype(np.int32).astype(np.float32)
            add_pts(ipts)
            for e in range(n_pts):
                add_seg(ipts[e], ipts[(e + 1) % n_pts])
        elif kind == 1:  # rectangle
            x0, y0 = rng.uniform(0, w - 20), rng.uniform(0, h - 20)
            x1, y1 = x0 + rng.uniform(10, w / 3), y0 + rng.uniform(10, h / 3)
            x0, y0, x1, y1 = int(x0), int(y0), int(x1), int(y1)
            cv2.rectangle(img, (x0, y0), (x1, y1), color, -1)
            add_pts(np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32))
            rc = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)
            for e in range(4):
                add_seg(rc[e], rc[(e + 1) % 4])
        elif kind == 2:  # checkerboard patch
            rows, cols = int(rng.integers(2, 5)), int(rng.integers(2, 5))
            cell = int(rng.uniform(8, min(w, h) / 10))
            x0, y0 = int(rng.uniform(0, w - cols * cell)), int(rng.uniform(0, h - rows * cell))
            c2 = float(rng.uniform(0, 1))
            for i in range(rows):
                for j in range(cols):
                    cv2.rectangle(
                        img,
                        (x0 + j * cell, y0 + i * cell),
                        (x0 + (j + 1) * cell, y0 + (i + 1) * cell),
                        color if (i + j) % 2 == 0 else c2,
                        -1,
                    )
            corners = np.stack(
                np.meshgrid(
                    x0 + cell * np.arange(cols + 1), y0 + cell * np.arange(rows + 1)
                ),
                -1,
            ).reshape(-1, 2)
            add_pts(corners.astype(np.float32))
            # checker grid lines (full-span rows/columns)
            for r in range(rows + 1):
                add_seg((x0, y0 + r * cell), (x0 + cols * cell, y0 + r * cell))
            for cidx in range(cols + 1):
                add_seg((x0 + cidx * cell, y0), (x0 + cidx * cell, y0 + rows * cell))
        elif kind == 3:  # line
            p0 = rng.uniform([0, 0], [w, h]).astype(int)
            p1 = rng.uniform([0, 0], [w, h]).astype(int)
            cv2.line(img, tuple(p0), tuple(p1), color, int(rng.integers(1, 4)))
            add_pts(np.stack([p0, p1]).astype(np.float32))
            add_seg(p0.astype(np.float32), p1.astype(np.float32))
        else:  # ellipse (texture, no corner GT)
            cv2.ellipse(
                img,
                (int(rng.uniform(0, w)), int(rng.uniform(0, h))),
                (int(rng.uniform(5, w / 6)), int(rng.uniform(5, h / 6))),
                float(rng.uniform(0, 180)), 0, 360, color, -1,
            )
    img += rng.normal(0, 0.015, img.shape).astype(np.float32)
    img = np.clip(img, 0.0, 1.0)[..., None]

    pts = np.zeros((max_points, 2), np.float32)
    valid = np.zeros((max_points,), bool)
    if points:
        arr = np.unique(np.stack(points), axis=0)
        if len(arr) > max_points:
            arr = arr[rng.permutation(len(arr))[:max_points]]
        pts[: len(arr)] = arr
        valid[: len(arr)] = True
    if max_segments <= 0:
        return img, pts, valid
    segs = np.zeros((max_segments, 2, 2), np.float32)
    seg_valid = np.zeros((max_segments,), bool)
    if segments:
        sarr = np.stack(segments)[:max_segments]
        segs[: len(sarr)] = sarr
        seg_valid[: len(sarr)] = True
    return img, pts, valid, segs, seg_valid


class OnDeviceHomographyDataset(BaseDataset):
    """Pool-in-HBM homography pair engine. ``device_engine = True`` switches
    the trainer (train.py) to the in-jit batch construction path."""

    device_engine: ClassVar[bool] = True

    default_conf: ClassVar[dict] = {
        "name": "homographies_ondevice",
        "pool_size": 512,
        "val_pool_size": 48,
        "source_size": [448, 448],  # pool image size (w, h)
        "image_size": 320,  # canvas per view
        "max_gt_points": 192,
        "data_dir": None,  # folder of real images for the pool (else procedural)
        "glob": ["*.jpg", "*.png", "*.jpeg", "*.ppm"],
        "train_batch_size": 32,
        "val_batch_size": 32,
        "batch_size": 32,
        "num_workers": 0,
        "steps_per_epoch": 500,
        "val_steps": 4,
        "seed": 0,
        "homography": {
            "difficulty": 0.7,
            "translation": 0.3,
            "max_angle": 45.0,
        },
        "photometric": {"p": 0.95, "strength": 1.0},
        "right_only": False,  # view0 gets a milder warp when True
    }

    def _init(self, conf):
        self._pools: dict[str, dict] = {}

    # -- pool ---------------------------------------------------------------

    def build_pool(self, split: str = "train") -> dict:
        """Generate (or load) the source-image pool as host numpy arrays.
        uint8 images keep HBM cost at ~0.2 MB per 448x448 source."""
        if split in self._pools:
            return self._pools[split]
        conf = self.conf
        n = int(conf.val_pool_size if split == "val" else conf.pool_size)
        w, h = (int(x) for x in conf.source_size)
        k = int(conf.max_gt_points)
        images = np.zeros((n, h, w, 1), np.uint8)
        points = np.zeros((n, k, 2), np.float32)
        valid = np.zeros((n, k), bool)
        if conf.data_dir:
            from pathlib import Path

            from ..settings import DATA_PATH
            from ..utils.image import read_image

            root = Path(conf.data_dir)
            if not root.is_absolute():
                root = DATA_PATH / root
            paths = sorted(p for pat in conf.glob for p in root.glob("**/" + pat))
            if not paths:
                raise FileNotFoundError(f"no pool images under {root}")
            # ONE shared permutation so the val tail is disjoint from the
            # train head (independently-seeded permutations leaked val
            # images into the train pool)
            rng = np.random.default_rng(int(conf.seed))
            sel = rng.permutation(len(paths))
            sel = sel[-n:] if split == "val" else sel[:n]
            if len(paths) < n + (int(conf.val_pool_size) if split != "val"
                                 else 0):
                logger_warn = __import__(
                    "gluefactory_tpu", fromlist=["logger"]).logger.warning
                logger_warn(
                    "pool wants %d+val images but only %d available; "
                    "train/val pools will overlap", n, len(paths))
            for i, pi in enumerate(sel):
                img = read_image(paths[pi % len(paths)]).astype(np.float32) / 255.0
                if img.ndim == 3:
                    img = img.mean(-1)
                img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
                images[i, ..., 0] = np.clip(img * 255, 0, 255).astype(np.uint8)
                # corner GT for real images comes from HA / cached features,
                # not from the pool; valid stays False
        else:
            salt = 104729 if split == "val" else 0
            for i in range(n):
                g = np.random.default_rng((int(conf.seed) + salt, i))
                img, pts, val = generate_structured_scene(g, (w, h), k)
                images[i] = np.clip(img * 255, 0, 255).astype(np.uint8)
                points[i] = pts
                valid[i] = val
        pool = {"images": images, "points": points, "point_valid": valid}
        self._pools[split] = pool
        return pool

    # -- in-jit batch construction -----------------------------------------

    def make_batch(self, pool: dict, key: jax.Array, split: str = "train") -> dict:
        """Pure jittable: (pool arrays, PRNG key) -> training batch dict.
        Called inside the jitted train step; the only traced input is the key."""
        conf = self.conf
        bsz = int(conf.val_batch_size if split == "val" else conf.train_batch_size)
        s = int(conf.image_size)
        hs, ws = pool["images"].shape[1:3]
        m = pool["images"].shape[0]
        k_idx, k_h0, k_h1, k_p0, k_p1 = jax.random.split(key, 5)
        idx = jax.random.randint(k_idx, (bsz,), 0, m)
        images = pool["images"][idx].astype(jnp.float32) / 255.0
        gt_pts = pool["points"][idx]
        gt_valid = pool["point_valid"][idx]

        hconf = conf.homography
        diff = float(hconf.difficulty)
        H0, _ = sample_homography_batch(
            k_h0, bsz, (ws, hs), (s, s),
            difficulty=diff * (0.3 if conf.right_only else 1.0),
            translation=float(hconf.translation),
            max_angle=float(hconf.max_angle) * (0.3 if conf.right_only else 1.0),
        )
        H1, _ = sample_homography_batch(
            k_h1, bsz, (ws, hs), (s, s),
            difficulty=diff,
            translation=float(hconf.translation),
            max_angle=float(hconf.max_angle),
        )
        im0 = warp_image(images, H0, (s, s))
        im1 = warp_image(images, H1, (s, s))
        p = float(conf.photometric.p)
        strength = float(conf.photometric.strength)
        im0 = photometric_augment(k_p0, im0, p=p, strength=strength)
        im1 = photometric_augment(k_p1, im1, p=p, strength=strength)

        kp0 = warp_points(gt_pts, H0)
        kp1 = warp_points(gt_pts, H1)

        def inside(kp):
            return (
                (kp[..., 0] >= 2.0) & (kp[..., 0] <= s - 3.0)
                & (kp[..., 1] >= 2.0) & (kp[..., 1] <= s - 3.0)
            )

        size = jnp.full((bsz, 2), float(s), jnp.float32)
        return {
            "view0": {"image": im0, "image_size": size},
            "view1": {"image": im1, "image_size": size},
            "H_0to1": H1 @ jnp.linalg.inv(H0),
            "gt_keypoints0": kp0,
            "gt_keypoint_valid0": gt_valid & inside(kp0),
            "gt_keypoints1": kp1,
            "gt_keypoint_valid1": gt_valid & inside(kp1),
        }

    # -- loaders ------------------------------------------------------------

    def batch_size(self, split: str) -> int:
        key = f"{split}_batch_size"
        return int(self.conf.get(key, self.conf.batch_size))

    def get_dataset(self, split: str):  # pragma: no cover - engine path
        raise NotImplementedError("device-engine dataset has no host split")

    def get_data_loader(self, split: str, shard: int = 0, num_shards: int = 1):
        steps = int(self.conf.val_steps if split == "val" else self.conf.steps_per_epoch)
        return _SeedLoader(int(self.conf.seed), split, steps, shard, num_shards)

    def get_overfit_loader(self, split: str, num_items: int = 1):
        return _SeedLoader(int(self.conf.seed), split, 1, 0, 1, frozen=True)


class _SeedLoader:
    """Yields one scalar seed per step; the jitted step folds it into a key."""

    def __init__(self, base_seed, split, steps, shard=0, num_shards=1, frozen=False):
        self.base = base_seed
        self.split = split
        self.steps = steps
        self.epoch = 0
        self.shard = shard
        self.num_shards = num_shards
        self.frozen = frozen

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.steps

    def __iter__(self):
        salt = 1 << 40 if self.split == "val" else 0  # disjoint seed streams
        for i in range(self.steps):
            step = 0 if self.frozen else self.epoch * self.steps + i
            yield {
                "seed": np.int64(
                    self.base + salt + step * self.num_shards + self.shard
                )
            }


__main_dataset__ = OnDeviceHomographyDataset


class OnDeviceCachedFeatureDataset(OnDeviceHomographyDataset):
    """Cached-feature variant (≙ the reference's stage-1 recipe with
    load_features.do, homographies.py:175-278): the pool holds SuperPoint
    features extracted ONCE from the source images; each step warps keypoint
    positions analytically by the sampled homographies and perturbs the
    descriptors, so the jitted train step contains ONLY the matcher —
    compiles in seconds and steps are matcher-bound.

    Both views reuse the source image's descriptors (exactly like the
    reference's cached path); ``desc_noise``/``desc_dropout`` decorrelate the
    views so the matcher can't shortcut on bit-identical descriptors.
    """

    default_conf: ClassVar[dict] = {
        **OnDeviceHomographyDataset.default_conf,
        "name": "homographies_ondevice_cached",
        "features_from": {
            "name": "extractors.superpoint",  # any extractor works (sift,
            # aliked, disk, ...); unknown keys are filtered per extractor
            "experiment": None,  # checkpoint experiment holding the extractor
            "max_num_keypoints": 512,
            "detection_threshold": 0.0005,
            "nms_radius": 4,
            "batch": 16,
            "on_host": False,  # extract on CPU (callback extractors)
        },
        "desc_noise": 0.05,
        "desc_dropout": 0.05,
        "kp_noise": 0.0,  # px stddev of per-view keypoint-position jitter —
        # the cached path warps positions ANALYTICALLY (zero detection
        # noise), so a matcher trained here never sees the extractor's real
        # cross-view localization jitter; ~0.5 px matches the measured SP
        # consistency error class
        "pool_cache": True,  # persist extracted pools to disk so the
        # resilient-train restart loop (tunnel outages) skips re-extraction
    }

    def _pool_cache_path(self, split: str):
        if not self.conf.get("pool_cache", True):
            return None
        import hashlib
        import json

        from ..settings import DATA_PATH

        keys = ["pool_size", "val_pool_size", "source_size", "seed",
                "data_dir", "glob", "max_gt_points", "features_from"]
        spec = {k: self.conf.get(k) for k in keys}
        spec = {k: (v.to_dict() if hasattr(v, "to_dict") else v)
                for k, v in spec.items()}
        spec["split"] = split
        h = hashlib.sha1(
            json.dumps(spec, sort_keys=True, default=str).encode()
        ).hexdigest()[:16]
        d = DATA_PATH / "engine_pool_cache"
        d.mkdir(parents=True, exist_ok=True)
        return d / f"{type(self).__name__}_{h}.npz"

    def build_pool(self, split: str = "train") -> dict:
        if split in self._pools:
            return self._pools[split]
        cpath = self._pool_cache_path(split)
        if cpath is not None and cpath.exists():
            blob = np.load(cpath)
            pool = {k: blob[k] for k in blob.files}
            self._pools[split] = pool
            return pool
        pool = self._build_pool_uncached(split)
        if cpath is not None:
            tmp = cpath.with_suffix(".tmp.npz")
            np.savez(tmp, **pool)
            tmp.replace(cpath)
        return pool

    def _build_pool_uncached(self, split: str = "train") -> dict:
        import jax

        from ..models import build_model
        from ..utils.experiments import load_experiment, restore_from_flat_dict

        base = OnDeviceHomographyDataset.build_pool(self, split)
        self._pools.pop(split)  # replace the image pool with a feature pool
        fconf = self.conf.features_from
        from ..models import get_model

        ext_name = fconf.get("name", "extractors.superpoint")
        known = get_model(ext_name).default_conf
        ext_conf = {
            k: v for k, v in fconf.to_dict().items()
            if k in known and k != "name"
        }
        if fconf.get("on_host", False):
            # host-callback extractors (sift/lsd via cv2 pure_callback)
            # cannot even TRACE on the axon TPU backend ("does not support
            # host send/recv callbacks") — this must run BEFORE any
            # extractor.init — and a TPU-pinned process may have no CPU
            # platform registered at all; shell out to a GFTPU_PLATFORM=cpu
            # subprocess instead
            return self._extract_on_host(split, base, ext_name, ext_conf,
                                         fconf)
        extractor = build_model(ext_name, ext_conf)
        images = base["images"].astype(np.float32) / 255.0
        n, h, w = images.shape[:3]
        bs = int(fconf.batch)
        data0 = {
            "image": jnp.asarray(images[:1]),
            "image_size": jnp.full((1, 2), float(w), jnp.float32),
        }
        params = extractor.init(jax.random.key(0), data0)
        if fconf.experiment:
            blob, _ = load_experiment(str(fconf.experiment), best=False)
            flat = blob["state"]["params"]
            # accept both standalone-extractor and pipeline checkpoints
            flat = {
                k.replace("['extractor']", ""): v for k, v in flat.items()
            }
            params = restore_from_flat_dict(params, flat)
        apply_fn = jax.jit(extractor.apply)
        kpts, descs, scores, valid = [], [], [], []
        size = jnp.asarray([[float(w), float(h)]], jnp.float32)
        for i in range(0, n, bs):
            chunk = jnp.asarray(images[i : i + bs])
            pred = apply_fn(
                params,
                {"image": chunk,
                 "image_size": jnp.broadcast_to(size, (chunk.shape[0], 2))},
            )
            kpts.append(np.asarray(pred["keypoints"]))
            descs.append(np.asarray(pred["descriptors"], np.float16))
            scores.append(np.asarray(pred["keypoint_scores"]))
            valid.append(np.asarray(pred["keypoint_valid"]))
        pool = {
            "keypoints": np.concatenate(kpts),
            "descriptors": np.concatenate(descs),
            "keypoint_scores": np.concatenate(scores),
            "keypoint_valid": np.concatenate(valid),
            "source_size": np.asarray([w, h], np.float32),
        }
        self._pools[split] = pool
        return pool

    def _extract_on_host(self, split, base, ext_name, ext_conf, fconf):
        import json
        import os
        import subprocess
        import sys
        import tempfile
        from pathlib import Path

        with tempfile.TemporaryDirectory() as td:
            img_npz = Path(td) / "pool.npz"
            out_npz = Path(td) / "feats.npz"
            np.savez(img_npz, images=base["images"])
            cmd = [
                sys.executable, "-m",
                "gluefactory_tpu.scripts.extract_pool_features",
                "--images", str(img_npz), "--out", str(out_npz),
                "--extractor", ext_name, "--conf", json.dumps(ext_conf),
                "--batch", str(int(fconf.batch)),
            ]
            if fconf.experiment:
                cmd += ["--experiment", str(fconf.experiment)]
            if fconf.get("weights"):
                from ..settings import WEIGHTS_PATH

                wpath = Path(str(fconf.weights))
                if not wpath.exists():
                    wpath = WEIGHTS_PATH / str(fconf.weights)
                cmd += ["--weights", str(wpath)]
            if fconf.get("remap"):
                cmd += ["--remap", str(fconf.remap)]
            env = {**os.environ, "GFTPU_PLATFORM": "cpu"}
            res = subprocess.run(
                cmd, env=env, capture_output=True, text=True, timeout=3600,
                cwd=str(Path(__file__).resolve().parents[2]),
            )
            if res.returncode != 0:
                raise RuntimeError(
                    f"host feature extraction failed: {res.stderr[-2000:]}")
            blob = np.load(out_npz)
            h, w = base["images"].shape[1:3]
            pool = {k: blob[k] for k in blob.files}
            pool["source_size"] = np.asarray([w, h], np.float32)
        self._pools[split] = pool
        return pool

    def make_batch(self, pool: dict, key: jax.Array, split: str = "train") -> dict:
        conf = self.conf
        bsz = int(conf.val_batch_size if split == "val" else conf.train_batch_size)
        s = int(conf.image_size)
        ws, hs = (float(x) for x in conf.source_size)  # static (conf), the
        # pool entry only documents the extraction frame
        m = pool["keypoints"].shape[0]
        (k_idx, k_h0, k_h1, k_n0, k_n1, k_d0, k_d1, k_j0, k_j1) = (
            jax.random.split(key, 9)
        )
        idx = jax.random.randint(k_idx, (bsz,), 0, m)
        kp_src = pool["keypoints"][idx]
        desc = pool["descriptors"][idx].astype(jnp.float32)
        sc = pool["keypoint_scores"][idx]
        kv = pool["keypoint_valid"][idx]

        hconf = conf.homography
        H0, _ = sample_homography_batch(
            k_h0, bsz, (int(ws), int(hs)), (s, s),
            difficulty=float(hconf.difficulty) * (0.3 if conf.right_only else 1.0),
            translation=float(hconf.translation),
            max_angle=float(hconf.max_angle) * (0.3 if conf.right_only else 1.0),
        )
        H1, _ = sample_homography_batch(
            k_h1, bsz, (int(ws), int(hs)), (s, s),
            difficulty=float(hconf.difficulty),
            translation=float(hconf.translation),
            max_angle=float(hconf.max_angle),
        )

        def view(H, k_noise, k_drop, k_jit):
            kp = warp_points(kp_src, H)
            if float(conf.kp_noise) > 0:
                kp = kp + float(conf.kp_noise) * jax.random.normal(
                    k_jit, kp.shape
                )
            inside = (
                (kp[..., 0] >= 0.0) & (kp[..., 0] <= s - 1.0)
                & (kp[..., 1] >= 0.0) & (kp[..., 1] <= s - 1.0)
            )
            d = desc + float(conf.desc_noise) * jax.random.normal(
                k_noise, desc.shape
            )
            d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
            drop = jax.random.bernoulli(
                k_drop, float(conf.desc_dropout), kv.shape
            )
            return {
                "cache": {
                    "keypoints": kp,
                    "descriptors": d,
                    "keypoint_scores": sc,
                    "keypoint_valid": kv & inside & ~drop,
                },
                "image_size": jnp.full((bsz, 2), float(s), jnp.float32),
            }

        return {
            "view0": view(H0, k_n0, k_d0, k_j0),
            "view1": view(H1, k_n1, k_d1, k_j1),
            "H_0to1": H1 @ jnp.linalg.inv(H0),
        }



class OnDeviceCachedWireframeDataset(OnDeviceCachedFeatureDataset):
    """Cached-WIREFRAME variant for GlueStick training on the tunnel: the
    pool holds full wireframe features (junction+keypoint nodes, node
    descriptors, line segments, ``lines_junc_idx``) extracted ONCE on the
    host (lines.wireframe = SuperPoint dense + LSD + junction clustering —
    LSD is a cv2 host callback, untraceable on the axon backend), and each
    jitted step warps node positions AND line endpoints analytically by the
    sampled homographies. A homography preserves the incidence structure,
    so the cached ``lines_junc_idx`` topology is exact in every view; crop
    masks give partial visibility, desc noise/dropout decorrelate the
    views. The train step contains only the GlueStick matcher.

    (Reference recipe equivalence: gluestick training with cached features,
    gluefactory configs/gluestick_*; here TPU-first via the HBM-pool
    engine.)"""

    default_conf: ClassVar[dict] = {
        **OnDeviceCachedFeatureDataset.default_conf,
        "name": "homographies_ondevice_cached_wireframe",
        "features_from": {
            "name": "lines.wireframe",
            "on_host": True,  # LSD host callback
            "batch": 8,
            "experiment": None,
            "weights": None,  # e.g. sp_tpu_stage0b.f16.msgpack
            "remap": "['extractor']=['point_extractor']",
            "point_extractor": {
                "name": "extractors.superpoint",
                "max_num_keypoints": 256,
                "detection_threshold": 0.0005,
                "dense_outputs": True,
                "trainable": False,
            },
            "line_extractor": {"name": "lines.lsd", "max_num_lines": 96},
            "nms_radius": 3.0,
        },
    }

    def make_batch(self, pool: dict, key: jax.Array, split: str = "train") -> dict:
        conf = self.conf
        bsz = int(conf.val_batch_size if split == "val" else conf.train_batch_size)
        s = int(conf.image_size)
        ws, hs = (float(x) for x in conf.source_size)
        m = pool["keypoints"].shape[0]
        (k_idx, k_h0, k_h1, k_n0, k_n1, k_d0, k_d1) = jax.random.split(key, 7)
        idx = jax.random.randint(k_idx, (bsz,), 0, m)
        kp_src = pool["keypoints"][idx]          # (B, N, 2) junctions+kps
        desc = pool["descriptors"][idx].astype(jnp.float32)
        sc = pool["keypoint_scores"][idx]
        kv = pool["keypoint_valid"][idx]
        lines_src = pool["lines"][idx]           # (B, L, 2, 2)
        lsc = pool["line_scores"][idx]
        lv = pool["valid_lines"][idx]
        ljidx = pool["lines_junc_idx"][idx]      # (B, 2L)

        hconf = conf.homography
        H0, _ = sample_homography_batch(
            k_h0, bsz, (int(ws), int(hs)), (s, s),
            difficulty=float(hconf.difficulty) * (0.3 if conf.right_only else 1.0),
            translation=float(hconf.translation),
            max_angle=float(hconf.max_angle) * (0.3 if conf.right_only else 1.0),
        )
        H1, _ = sample_homography_batch(
            k_h1, bsz, (int(ws), int(hs)), (s, s),
            difficulty=float(hconf.difficulty),
            translation=float(hconf.translation),
            max_angle=float(hconf.max_angle),
        )

        def view(H, k_noise, k_drop):
            kp = warp_points(kp_src, H)
            inside = (
                (kp[..., 0] >= 0.0) & (kp[..., 0] <= s - 1.0)
                & (kp[..., 1] >= 0.0) & (kp[..., 1] <= s - 1.0)
            )
            b, L = lines_src.shape[:2]
            eps = warp_points(lines_src.reshape(b, 2 * L, 2), H)
            ep_in = (
                (eps[..., 0] >= 0.0) & (eps[..., 0] <= s - 1.0)
                & (eps[..., 1] >= 0.0) & (eps[..., 1] <= s - 1.0)
            ).reshape(b, L, 2)
            lines = eps.reshape(b, L, 2, 2)
            d = desc + float(conf.desc_noise) * jax.random.normal(
                k_noise, desc.shape
            )
            d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
            drop = jax.random.bernoulli(
                k_drop, float(conf.desc_dropout), kv.shape
            )
            node_valid = kv & inside & ~drop
            # a line is only servable if BOTH its junction nodes survive the
            # crop/dropout — otherwise its gathered assignment score is the
            # mask value and a GT-positive there explodes the NLL
            ep_nodes = jnp.take_along_axis(node_valid, ljidx, axis=1)
            junc_ok = ep_nodes.reshape(b, L, 2).all(-1)
            return {
                "cache": {
                    "keypoints": kp,
                    "descriptors": d,
                    "keypoint_scores": sc,
                    "keypoint_valid": node_valid,
                    "lines": lines,
                    "line_scores": lsc,
                    "valid_lines": lv & ep_in.all(-1) & junc_ok,
                    "lines_junc_idx": ljidx,
                },
                "image_size": jnp.full((bsz, 2), float(s), jnp.float32),
            }

        return {
            "view0": view(H0, k_n0, k_d0),
            "view1": view(H1, k_n1, k_d1),
            "H_0to1": H1 @ jnp.linalg.inv(H0),
        }
