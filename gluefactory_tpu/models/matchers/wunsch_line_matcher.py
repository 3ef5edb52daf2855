"""Needleman-Wunsch descriptor line matcher (SOLD2's WunschLineMatcher;
reference surface: the kornia SOLD2 wheel behind
gluefactory/models/lines/sold2.py + configs/eval/sold2+LM.yaml).

Matches line segments by sampling ``num_samples`` descriptor points along
each segment from a semi-dense descriptor map and aligning the two sample
sequences with Needleman-Wunsch dynamic programming (gap score ``gap``),
which tolerates partial occlusion and different endpoint extents. Each
pair is scored as max(NW(forward), NW(reversed)) to handle orientation
flips; mutual-max with a score threshold gives the assignment.

TPU-first formulation: all B x L0 x L1 alignments run as one batched DP.
The NW recurrence's in-row dependency (D[i,j-1] + gap) is a prefix max of
D[i,j] - gap*j, so each row updates with one vectorized ``cummax`` and the
only sequential loop is a ``lax.scan`` over the ``num_samples`` rows —
no per-pair Python loops (the kornia original loops over pairs on CPU).
"""

from __future__ import annotations

from typing import ClassVar

import jax
import jax.numpy as jnp

from ...ops.interpolate import sample_descriptors
from ..base_model import BaseModel


def nw_scores(sim: jnp.ndarray, gap: float) -> jnp.ndarray:
    """Needleman-Wunsch terminal scores for a batch of similarity matrices
    sim (..., n, m) -> (...,). D[0,j]=gap*j, D[i,0]=gap*i."""
    n, m = sim.shape[-2:]
    batch = sim.shape[:-2]
    M = sim.reshape(-1, n, m)
    js = jnp.arange(m + 1, dtype=sim.dtype) * gap
    row0 = jnp.broadcast_to(js, (M.shape[0], m + 1))

    def step(row_prev, Mi):
        # candidates for D[i, 1..m] from the previous row
        a = jnp.maximum(row_prev[:, :-1] + Mi, row_prev[:, 1:] + gap)
        start = row_prev[:, :1] + gap  # D[i, 0]
        b = jnp.concatenate([start, a - js[None, 1:]], axis=1)
        d = jax.lax.cummax(b, axis=1) + js[None]
        return d, None

    last, _ = jax.lax.scan(step, row0, jnp.moveaxis(M, 1, 0))
    return last[:, -1].reshape(batch)


class WunschLineMatcher(BaseModel):
    default_conf: ClassVar[dict] = {
        "num_samples": 8,
        "gap_score": 0.1,
        "desc_stride": 4,  # stride of descriptors_dense w.r.t. the image
        "min_score": 0.2,
        "cross_check": True,
    }
    # descriptors come from EITHER descriptors_dense{0,1} (sampled here) or
    # precomputed line_desc_samples{0,1}; enforced in _forward
    required_data_keys: ClassVar[list] = ["lines0", "lines1"]

    def _sample(self, desc_map, lines):
        b, l = lines.shape[:2]
        n = int(self.conf.num_samples)
        t = jnp.linspace(0.0, 1.0, n)[None, None, :, None]
        pts = lines[:, :, None, 0] + (
            lines[:, :, 1] - lines[:, :, 0])[:, :, None] * t
        d = sample_descriptors(
            desc_map, pts.reshape(b, l * n, 2),
            stride=int(self.conf.desc_stride))
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        return d.reshape(b, l, n, -1)

    def _forward(self, data: dict) -> dict:
        lines0, lines1 = data["lines0"], data["lines1"]
        b, l0 = lines0.shape[:2]
        l1 = lines1.shape[1]
        v0 = data.get("valid_lines0", jnp.ones((b, l0), bool))
        v1 = data.get("valid_lines1", jnp.ones((b, l1), bool))
        if "line_desc_samples0" in data:
            # precomputed per-line descriptor samples (B, L, S, D) — e.g.
            # JPLDD's SDDH head evaluated along each extracted line; lets
            # learned keypoint descriptors drive line matching without a
            # dense descriptor map
            d0, d1 = data["line_desc_samples0"], data["line_desc_samples1"]
            d0 = d0 / jnp.maximum(
                jnp.linalg.norm(d0, axis=-1, keepdims=True), 1e-8)
            d1 = d1 / jnp.maximum(
                jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-8)
        else:
            d0 = self._sample(data["descriptors_dense0"], lines0)
            d1 = self._sample(data["descriptors_dense1"], lines1)

        sim = jnp.einsum("bind,bjmd->bijnm", d0, d1)
        gap = float(self.conf.gap_score)
        n = d0.shape[-2]  # sample count (may come from line_desc_samples)
        fwd = nw_scores(sim, gap)
        rev = nw_scores(sim[..., ::-1], gap)
        scores = jnp.maximum(fwd, rev) / n  # normalized to [-1, 1]-ish
        scores = jnp.where(v0[:, :, None] & v1[:, None, :], scores, -jnp.inf)

        best0 = jnp.argmax(scores, axis=2)
        best1 = jnp.argmax(scores, axis=1)
        sc0 = jnp.max(scores, axis=2)
        mutual = jnp.take_along_axis(best1, best0, axis=1) == jnp.arange(l0)
        ok = sc0 > float(self.conf.min_score)
        if self.conf.cross_check:
            ok = ok & mutual
        m0 = jnp.where(ok & v0, best0, -1)
        valid1 = jnp.take_along_axis(
            scores > float(self.conf.min_score), best1[:, None, :], axis=1
        )[:, 0]
        ok1 = valid1 & v1
        if self.conf.cross_check:
            ok1 = ok1 & (jnp.take_along_axis(best0, best1, axis=1)
                         == jnp.arange(l1))
        m1 = jnp.where(ok1, best1, -1)
        return {
            "line_matches0": m0,
            "line_matches1": m1,
            "line_matching_scores0": jnp.where(ok & v0, sc0, 0.0),
            "line_matching_scores1": jnp.where(
                m1 >= 0, jnp.max(scores, axis=1), 0.0),
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = WunschLineMatcher
