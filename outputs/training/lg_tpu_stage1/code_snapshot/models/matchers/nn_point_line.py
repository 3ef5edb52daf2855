"""Nearest-neighbor point + line matcher
(reference: gluefactory/models/matchers/nn_point_line.py:194-345).

Points match by descriptor NN with mutual check (shared with
nearest_neighbor_matcher); lines match by the descriptors of their sampled
points (mean of per-sample NN similarity over the best endpoint ordering),
with mutual check over the line similarity matrix."""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp

from ...ops.interpolate import bilinear_sample
from ..base_model import BaseModel
from .nearest_neighbor_matcher import NEG_INF, find_nn, mutual_check


class NNPointLine(BaseModel):
    default_conf: ClassVar[dict] = {
        "n_line_samples": 8,
        "line_score_th": 0.2,
        "trainable": False,
    }
    required_data_keys: ClassVar[list] = ["descriptors0", "descriptors1"]

    def _point_matches(self, data):
        sim = jnp.einsum("bnd,bmd->bnm", data["descriptors0"], data["descriptors1"])
        mask0 = data.get("keypoint_valid0")
        mask1 = data.get("keypoint_valid1")
        if mask0 is not None:
            sim = jnp.where(mask0[:, :, None], sim, NEG_INF)
        if mask1 is not None:
            sim = jnp.where(mask1[:, None, :], sim, NEG_INF)
        m0, ms0 = find_nn(sim, None, None)
        m1, ms1 = find_nn(jnp.swapaxes(sim, -1, -2), None, None)
        m0_new = mutual_check(m0, m1)
        m1 = mutual_check(m1, m0)
        return {"matches0": m0_new, "matches1": m1,
                "matching_scores0": ms0, "matching_scores1": ms1}

    def _line_matches(self, data):
        """Match lines by averaged dense-descriptor similarity along the
        segments (needs descriptors_dense0/1)."""
        if "lines0" not in data or "descriptors_dense0" not in data:
            return {}
        S = int(self.conf.n_line_samples)
        out = {}
        descs = []
        for i in ("0", "1"):
            lines = data[f"lines{i}"]  # (B, L, 2, 2)
            b, L = lines.shape[:2]
            t = jnp.linspace(0.0, 1.0, S)
            pts = lines[:, :, None, 0, :] + t[None, None, :, None] * (
                lines[:, :, 1, :] - lines[:, :, 0, :]
            )[:, :, None, :]
            d = bilinear_sample(data[f"descriptors_dense{i}"], pts.reshape(b, L * S, 2))
            d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
            descs.append(d.reshape(b, L, S, -1))
        d0, d1 = descs
        # similarity over orderings: straight and flipped sample order
        sim = jnp.einsum("blsd,bmsd->blm", d0, d1) / S
        sim_f = jnp.einsum("blsd,bmsd->blm", d0, d1[:, :, ::-1]) / S
        sim = jnp.maximum(sim, sim_f)
        vl0 = data.get("valid_lines0")
        vl1 = data.get("valid_lines1")
        if vl0 is not None:
            sim = jnp.where(vl0[:, :, None], sim, NEG_INF)
        if vl1 is not None:
            sim = jnp.where(vl1[:, None, :], sim, NEG_INF)
        m0, ms0 = find_nn(sim, None, None)
        m1, ms1 = find_nn(jnp.swapaxes(sim, -1, -2), None, None)
        m0 = mutual_check(m0, m1)
        ok = ms0 > self.conf.line_score_th
        out["line_matches0"] = jnp.where(ok, m0, -1)
        out["line_matching_scores0"] = jnp.where(ok, ms0, 0.0)
        out["line_matches1"] = mutual_check(m1, m0)
        out["line_matching_scores1"] = ms1
        return out

    def _forward(self, data: dict) -> dict:
        return {**self._point_matches(data), **self._line_matches(data)}

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = NNPointLine
