"""On-device single-view engine for point+line detector training (JPLDD /
DeepLSD-class models): a pool of procedurally drawn shape scenes lives in
HBM together with their analytic GT (vertices + segments); each jitted
train step samples a homography per item, warps image AND geometry, and
recomputes exact supervision fields in-jit:

  gt_heatmap        — gaussian splats at warped vertices,
  gt_distance_field — exact distance to the nearest warped segment
                      (homographies map segments to segments, so warping
                      the two endpoints is exact),
  gt_angle_field    — orientation (mod pi) of the nearest warped segment.

This is the TPU-native replacement for the host `synthetic_shapes` loader
(reference: gluefactory/datasets/oxford_paris_mini_1view_jpldd.py +
ground_truth_generation/ — which pre-caches homography-adaptation heatmaps
and DeepLSD DF/AF fields on disk): per-step host traffic is one int seed,
and the supervision follows the warp exactly instead of being re-warped
cached fields. Throughput on the remote-TPU tunnel: engine-class (tens of
samples/s) vs ~2-3 for the host pipeline."""

from __future__ import annotations

from typing import ClassVar

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.homography import sample_homography_batch, warp_points
from ..ops.photometric import photometric_augment
from ..ops.warp import warp_image
from .homographies_ondevice import OnDeviceHomographyDataset
from .synthetic_shapes import draw_scene


class OnDeviceSyntheticShapesDataset(OnDeviceHomographyDataset):
    device_engine: ClassVar[bool] = True

    default_conf: ClassVar[dict] = {
        "name": "synthetic_shapes_ondevice",
        "pool_size": 512,
        "val_pool_size": 48,
        "source_size": [448, 448],
        "image_size": 320,
        "max_segments": 48,
        "max_vertices": 96,
        "train_batch_size": 8,
        "val_batch_size": 8,
        "batch_size": 8,
        "num_workers": 0,
        "steps_per_epoch": 500,
        "val_steps": 4,
        "seed": 0,
        "homography": {
            "difficulty": 0.6,
            "translation": 0.3,
            "max_angle": 35.0,
        },
        "photometric": {"p": 0.9, "strength": 1.0},
        "heatmap_sigma": 1.0,
        "df_clip": 16.0,  # distance field saturates here (model normalizes)
        # pool generator family: 'shapes' = draw_scene (clean polygon/line
        # scenes); 'structured' = the SAME generator every benchmark renders
        # (homographies_ondevice.generate_structured_scene with segment
        # recording) — line models must train in-family to be evaluable
        "scene_family": "shapes",
    }

    # -- pool ---------------------------------------------------------------

    def build_pool(self, split: str = "train") -> dict:
        if split in self._pools:
            return self._pools[split]
        conf = self.conf
        n = int(conf.val_pool_size if split == "val" else conf.pool_size)
        w, h = (int(x) for x in conf.source_size)
        assert w == h, "draw_scene uses a square canvas"
        L = int(conf.max_segments)
        K = int(conf.max_vertices)
        images = np.zeros((n, h, w, 3), np.uint8)
        segments = np.zeros((n, L, 2, 2), np.float32)
        seg_valid = np.zeros((n, L), bool)
        vertices = np.zeros((n, K, 2), np.float32)
        vert_valid = np.zeros((n, K), bool)
        salt = 104729 if split == "val" else 0
        structured = str(conf.get("scene_family", "shapes")) == "structured"
        for i in range(n):
            g = np.random.default_rng((int(conf.seed) + salt, i))
            if structured:
                from .homographies_ondevice import generate_structured_scene

                img, pts, pval, segs_a, segv_a = generate_structured_scene(
                    g, (w, h), K, max_segments=L
                )
                images[i] = np.clip(
                    np.repeat(img, 3, axis=-1) * 255, 0, 255
                ).astype(np.uint8)
                segments[i] = segs_a
                seg_valid[i] = segv_a
                vertices[i] = pts
                vert_valid[i] = pval
                continue
            img, segs, verts = draw_scene(g, w, L)
            images[i] = np.clip(img * 255, 0, 255).astype(np.uint8)
            segments[i, : len(segs)] = segs
            seg_valid[i, : len(segs)] = True
            verts = np.unique(np.round(verts).astype(np.float32), axis=0) \
                if len(verts) else verts
            verts = verts[:K]
            vertices[i, : len(verts)] = verts
            vert_valid[i, : len(verts)] = True
        pool = {
            "images": images,
            "segments": segments,
            "segment_valid": seg_valid,
            "vertices": vertices,
            "vertex_valid": vert_valid,
        }
        self._pools[split] = pool
        return pool

    # -- in-jit batch construction -----------------------------------------

    def make_batch(self, pool: dict, key: jax.Array, split: str = "train") -> dict:
        conf = self.conf
        bsz = int(conf.val_batch_size if split == "val" else conf.train_batch_size)
        s = int(conf.image_size)
        hs, ws = pool["images"].shape[1:3]
        m = pool["images"].shape[0]
        k_idx, k_h, k_p = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (bsz,), 0, m)
        images = pool["images"][idx].astype(jnp.float32) / 255.0
        segs = pool["segments"][idx]  # (B, L, 2, 2)
        seg_valid = pool["segment_valid"][idx]
        verts = pool["vertices"][idx]  # (B, K, 2)
        vert_valid = pool["vertex_valid"][idx]

        hconf = conf.homography
        H, _ = sample_homography_batch(
            k_h, bsz, (ws, hs), (s, s),
            difficulty=float(hconf.difficulty),
            translation=float(hconf.translation),
            max_angle=float(hconf.max_angle),
        )
        img = warp_image(images, H, (s, s))
        img = photometric_augment(
            k_p, img, p=float(conf.photometric.p),
            strength=float(conf.photometric.strength))

        # geometry follows the warp exactly
        w_verts = warp_points(verts, H)
        w_segs = warp_points(segs.reshape(bsz, -1, 2), H).reshape(segs.shape)
        inside = (
            (w_verts[..., 0] >= 1.0) & (w_verts[..., 0] <= s - 2.0)
            & (w_verts[..., 1] >= 1.0) & (w_verts[..., 1] <= s - 2.0)
        )
        vert_ok = vert_valid & inside

        heat = _splat_heatmap(w_verts, vert_ok, s, float(conf.heatmap_sigma))
        df, af = _df_af_from_segments(
            w_segs, seg_valid, s, float(conf.df_clip))

        size = jnp.full((bsz, 2), float(s), jnp.float32)
        return {
            "image": img,
            "image_size": size,
            "gt_heatmap": heat,
            "gt_distance_field": df,
            "gt_angle_field": af,
            "gt_segments": w_segs,
            "gt_segment_valid": seg_valid,
            "gt_keypoints": w_verts,
            "gt_keypoint_valid": vert_ok,
        }


def _splat_heatmap(pts: jnp.ndarray, valid: jnp.ndarray, s: int,
                   sigma: float) -> jnp.ndarray:
    """(B, K, 2) points -> (B, s, s) heatmap: max over per-point gaussians,
    evaluated only on a local window via a full-grid distance (K is small)."""
    ys = jnp.arange(s, dtype=jnp.float32)
    xs = jnp.arange(s, dtype=jnp.float32)

    def one(p, v):
        # (s, s, K) squared distances — K<=96 keeps this ~10M floats at 320px
        dx = xs[None, :, None] - p[None, None, :, 0]
        dy = ys[:, None, None] - p[None, None, :, 1]
        d2 = dx * dx + dy * dy
        g = jnp.exp(-d2 / (2.0 * sigma * sigma))
        g = jnp.where(v[None, None, :], g, 0.0)
        return jnp.max(g, axis=-1)

    return jax.vmap(one)(pts, valid)


def _df_af_from_segments(segs: jnp.ndarray, valid: jnp.ndarray, s: int,
                         clip: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L, 2, 2) segments -> exact (B, s, s) distance + nearest-segment
    orientation fields (the jit analog of synthetic_shapes.exact_df_af)."""
    ys = jnp.arange(s, dtype=jnp.float32)
    xs = jnp.arange(s, dtype=jnp.float32)
    grid = jnp.stack(
        [jnp.tile(xs[None, :], (s, 1)), jnp.tile(ys[:, None], (1, s))], -1
    ).reshape(-1, 2)  # (P, 2)

    def one(sg, v):
        a = sg[:, 0]  # (L, 2)
        b = sg[:, 1]
        ab = b - a
        denom = jnp.sum(ab * ab, -1) + 1e-8
        ap = grid[:, None, :] - a[None]  # (P, L, 2)
        t = jnp.clip(jnp.sum(ap * ab[None], -1) / denom[None], 0.0, 1.0)
        proj = a[None] + t[..., None] * ab[None]
        d = jnp.linalg.norm(grid[:, None] - proj, axis=-1)  # (P, L)
        d = jnp.where(v[None], d, 1e9)
        nearest = jnp.argmin(d, -1)
        df = jnp.minimum(jnp.min(d, -1), clip).reshape(s, s)
        ang = jnp.mod(jnp.arctan2(ab[:, 1], ab[:, 0]), jnp.pi)
        af = ang[nearest].reshape(s, s)
        return df, af

    return jax.vmap(one)(segs, valid)


__main_dataset__ = OnDeviceSyntheticShapesDataset


class OnDeviceSyntheticShapesPairsDataset(OnDeviceSyntheticShapesDataset):
    """TWO-VIEW variant: each step warps the same drawn scene by two
    independent homographies and emits per-view images + exact line/vertex
    GT + supervision fields + ``H_0to1``. One engine thereby serves joint
    detector training (per-view junction/heatmap/DF/AF losses) AND
    cross-view descriptor supervision (the views' ``gt_keypoints`` are the
    SAME source vertices, so correspondence is the identity where both
    validity masks hold) — used by the SOLD2 recipe
    (configs/sold2_train_pairs.yaml)."""

    default_conf: ClassVar[dict] = {
        **OnDeviceSyntheticShapesDataset.default_conf,
        "name": "synthetic_shapes_ondevice_pairs",
        "right_only": False,  # milder view-0 warp when True
    }

    def make_batch(self, pool: dict, key: jax.Array, split: str = "train") -> dict:
        conf = self.conf
        bsz = int(conf.val_batch_size if split == "val" else conf.train_batch_size)
        s = int(conf.image_size)
        hs, ws = pool["images"].shape[1:3]
        m = pool["images"].shape[0]
        k_idx, k_h0, k_h1, k_p0, k_p1 = jax.random.split(key, 5)
        idx = jax.random.randint(k_idx, (bsz,), 0, m)
        images = pool["images"][idx].astype(jnp.float32) / 255.0
        segs = pool["segments"][idx]
        seg_valid = pool["segment_valid"][idx]
        verts = pool["vertices"][idx]
        vert_valid = pool["vertex_valid"][idx]

        hconf = conf.homography
        mild = 0.3 if conf.right_only else 1.0
        H0, _ = sample_homography_batch(
            k_h0, bsz, (ws, hs), (s, s),
            difficulty=float(hconf.difficulty) * mild,
            translation=float(hconf.translation),
            max_angle=float(hconf.max_angle) * mild,
        )
        H1, _ = sample_homography_batch(
            k_h1, bsz, (ws, hs), (s, s),
            difficulty=float(hconf.difficulty),
            translation=float(hconf.translation),
            max_angle=float(hconf.max_angle),
        )

        out = {"H_0to1": H1 @ jnp.linalg.inv(H0)}
        for i, (H, k_p) in enumerate(((H0, k_p0), (H1, k_p1))):
            img = warp_image(images, H, (s, s))
            img = photometric_augment(
                k_p, img, p=float(conf.photometric.p),
                strength=float(conf.photometric.strength))
            w_verts = warp_points(verts, H)
            b, L = segs.shape[:2]
            w_segs = warp_points(segs.reshape(b, -1, 2), H).reshape(segs.shape)
            inside_v = (
                (w_verts[..., 0] >= 1.0) & (w_verts[..., 0] <= s - 2.0)
                & (w_verts[..., 1] >= 1.0) & (w_verts[..., 1] <= s - 2.0)
            )
            ep_in = (
                (w_segs[..., 0] >= 0.0) & (w_segs[..., 0] <= s - 1.0)
                & (w_segs[..., 1] >= 0.0) & (w_segs[..., 1] <= s - 1.0)
            ).all(-1)  # (B, L): both endpoints inside
            seg_ok = seg_valid & ep_in
            vert_ok = vert_valid & inside_v
            heat = _splat_heatmap(w_verts, vert_ok, s, float(conf.heatmap_sigma))
            df, af = _df_af_from_segments(w_segs, seg_ok, s, float(conf.df_clip))
            size = jnp.full((bsz, 2), float(s), jnp.float32)
            out[f"view{i}"] = {"image": img, "image_size": size}
            out.update({
                f"lines{i}": w_segs,
                f"valid_lines{i}": seg_ok,
                f"gt_keypoints{i}": w_verts,
                f"gt_keypoint_valid{i}": vert_ok,
                f"gt_heatmap{i}": heat,
                f"gt_distance_field{i}": df,
                f"gt_angle_field{i}": af,
            })
        return out
