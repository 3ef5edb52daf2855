"""Wireframe builder: compose a point extractor + line extractor into the
junction-graph input contract of GlueStick
(reference: gluefactory/models/lines/wireframe.py:22-312).

TPU-first re-design:
  - sklearn-DBSCAN endpoint clustering -> batched fixed-radius label
    propagation (ops/cluster.py), fully jittable, no per-image Python loops;
  - everything static-shape: exactly ``2 * max_num_lines`` junction slots
    with validity masks (empty slots are masked, not dropped);
  - keypoints near line endpoints are masked out (not filtered) and the
    remaining keypoints are appended after the junction block, so
    ``lines_junc_idx`` indices stay stable across the batch.

Output contract (matching the reference's keys, wireframe.py:163-290):
  keypoints/descriptors/keypoint_scores: junctions then keypoints,
  lines (B, L, 2, 2), line_scores, valid_lines,
  lines_junc_idx (B, 2L) — junction slot of each line endpoint.
"""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp

from ...ops.cluster import cluster_means, fixed_radius_clusters
from ...ops.interpolate import sample_descriptors
from ..base_model import BaseModel, make_submodel


class WireframeExtractor(BaseModel):
    default_conf: ClassVar[dict] = {
        "point_extractor": {"name": "extractors.superpoint", "trainable": False},
        "line_extractor": {"name": "lines.lsd", "trainable": False},
        "nms_radius": 3.0,  # junction merge radius (reference wireframe.py:34)
        "trainable": False,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        self.point_extractor = make_submodel(self.conf.point_extractor)
        self.line_extractor = make_submodel(self.conf.line_extractor)

    def _forward(self, data: dict) -> dict:
        pred_pts = self.point_extractor(data)
        pred_lines = self.line_extractor(data)
        lines = pred_lines["lines"]  # (B, L, 2, 2)
        line_scores = pred_lines["line_scores"]
        valid_lines = pred_lines["valid_lines"]
        kpts = pred_pts["keypoints"]  # (B, K, 2)
        kp_scores = pred_pts["keypoint_scores"]
        kp_valid = pred_pts.get(
            "keypoint_valid", jnp.ones(kpts.shape[:-1], bool)
        )
        b, L = lines.shape[0], lines.shape[1]
        radius = float(self.conf.nms_radius)

        # --- 1. cluster endpoints into junctions (B, 2L) -------------------
        endpoints = lines.reshape(b, 2 * L, 2)
        ep_valid = jnp.repeat(valid_lines, 2, axis=-1)
        labels = fixed_radius_clusters(endpoints, ep_valid, eps=radius)
        ep_w = jnp.repeat(line_scores, 2, axis=-1)
        junctions, counts = cluster_means(endpoints, ep_w * ep_valid, labels)
        junc_valid = counts > 0  # slot i used iff it is a canonical label
        # lines_junc_idx: canonical label of each endpoint (B, 2L)
        lines_junc_idx = labels.astype(jnp.int32)
        # junction score: max member line score (approx by weighted mean here)
        junc_scores, _ = cluster_means(ep_w[..., None], ep_valid.astype(ep_w.dtype), labels)
        junc_scores = junc_scores[..., 0]
        # snap line endpoints to their junction positions so the node set and
        # the segment geometry agree exactly (reference wireframe.py rebuilds
        # lines from junctions after clustering)
        lines = jnp.take_along_axis(
            junctions, lines_junc_idx[..., None].astype(jnp.int32).repeat(2, -1), axis=1
        ).reshape(b, L, 2, 2)

        # --- 2. mask keypoints near junctions/endpoints --------------------
        d2 = jnp.sum(
            (kpts[:, :, None, :] - junctions[:, None, :, :]) ** 2, axis=-1
        )
        near = jnp.any((d2 <= radius * radius) & junc_valid[:, None, :], axis=-1)
        kp_keep = kp_valid & ~near

        # --- 3. assemble node set: junction block then keypoint block ------
        all_pts = jnp.concatenate([junctions, kpts], axis=1)
        all_scores = jnp.concatenate([junc_scores, kp_scores], axis=1)
        all_valid = jnp.concatenate([junc_valid, kp_keep], axis=1)
        pred = {
            "keypoints": all_pts,
            "keypoint_scores": all_scores,
            "keypoint_valid": all_valid,
            "lines": lines,
            "line_scores": line_scores,
            "valid_lines": valid_lines,
            "lines_junc_idx": lines_junc_idx,
            "n_junctions": jnp.full((b,), 2 * L, jnp.int32),
        }
        # --- 4. descriptors: sample the dense map at every node ------------
        if "descriptors_dense" in pred_pts:
            desc = sample_descriptors(
                pred_pts["descriptors_dense"], all_pts, stride=8
            )
            pred["descriptors"] = desc
        elif "descriptors" in pred_pts:
            # descriptor only at keypoints: sample junction descs from kp descs
            # is impossible — require dense maps from the point extractor.
            kdesc = pred_pts["descriptors"]
            jdesc = jnp.zeros((b, 2 * L, kdesc.shape[-1]), kdesc.dtype)
            pred["descriptors"] = jnp.concatenate([jdesc, kdesc], axis=1)
        return pred

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = WireframeExtractor
