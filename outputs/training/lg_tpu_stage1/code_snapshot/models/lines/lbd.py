"""LBD-style line band descriptor + matcher
(reference: gluefactory/models/lines/lbd.py:7-229 wraps pytlsd's C++ LBD;
here the Line Band Descriptor is re-derived as a batched JAX computation:
bands parallel to each segment, per-band statistics of the image gradient
projected onto the line direction/normal, concatenated and normalized —
the same structure as Zhang & Koch's LBD, fully on-device and batched over
(B, L, bands, samples) with no per-line loops)."""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp

from ...ops.interpolate import bilinear_sample
from ..base_model import BaseModel
from ..matchers.nearest_neighbor_matcher import NEG_INF, find_nn, mutual_check


def image_gradients(gray: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central differences (B, H, W) -> (gx, gy)."""
    gx = jnp.zeros_like(gray)
    gy = jnp.zeros_like(gray)
    gx = gx.at[:, :, 1:-1].set(0.5 * (gray[:, :, 2:] - gray[:, :, :-2]))
    gy = gy.at[:, 1:-1, :].set(0.5 * (gray[:, 2:, :] - gray[:, :-2, :]))
    return gx, gy


def lbd_describe(
    gray: jnp.ndarray,
    lines: jnp.ndarray,
    valid: jnp.ndarray,
    n_bands: int = 9,
    band_width: float = 7.0,
    n_samples: int = 32,
) -> jnp.ndarray:
    """gray (B, H, W); lines (B, L, 2, 2) -> descriptors (B, L, n_bands*8)."""
    b, L = lines.shape[:2]
    gx, gy = image_gradients(gray)
    d = lines[..., 1, :] - lines[..., 0, :]
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dn = d / jnp.maximum(length, 1e-6)  # direction (B, L, 2)
    nrm = jnp.stack([-dn[..., 1], dn[..., 0]], axis=-1)  # normal
    # sample grid: S points along the line x n_bands offsets along the normal
    t = jnp.linspace(0.0, 1.0, n_samples)
    offsets = (jnp.arange(n_bands) - (n_bands - 1) / 2.0) * band_width / max(n_bands - 1, 1) * 2.0
    base = lines[..., None, 0, :] + t[:, None] * d[..., None, :]  # (B, L, S, 2)
    pts = base[..., None, :] + offsets[:, None] * nrm[..., None, None, :]
    # (B, L, S, n_bands, 2)
    flat = pts.reshape(b, L * n_samples * n_bands, 2)
    gxs = bilinear_sample(gx[..., None], flat)[..., 0].reshape(b, L, n_samples, n_bands)
    gys = bilinear_sample(gy[..., None], flat)[..., 0].reshape(b, L, n_samples, n_bands)
    # project gradient onto line direction / normal
    g_d = gxs * dn[..., None, None, 0] + gys * dn[..., None, None, 1]
    g_n = gxs * nrm[..., None, None, 0] + gys * nrm[..., None, None, 1]
    feats = []
    for g in (g_d, g_n):
        pos = jnp.maximum(g, 0.0)
        neg = jnp.maximum(-g, 0.0)
        feats += [
            pos.mean(axis=2), pos.std(axis=2),
            neg.mean(axis=2), neg.std(axis=2),
        ]  # each (B, L, n_bands)
    desc = jnp.concatenate(feats, axis=-1)  # (B, L, 8 * n_bands)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return jnp.where(valid[..., None], desc, 0.0)


class LBDDescriptor(BaseModel):
    """Adds ``line_descriptors`` to a prediction carrying lines."""

    default_conf: ClassVar[dict] = {
        "n_bands": 9,
        "band_width": 7.0,
        "n_samples": 32,
        "trainable": False,
    }
    required_data_keys: ClassVar[list] = ["image", "lines"]

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        if image.shape[-1] == 3:
            scale = jnp.array([0.299, 0.587, 0.114], dtype=image.dtype)
            gray = jnp.sum(image * scale, axis=-1)
        else:
            gray = image[..., 0]
        valid = data.get("valid_lines", jnp.ones(data["lines"].shape[:2], bool))
        desc = lbd_describe(
            gray, data["lines"], valid,
            n_bands=int(self.conf.n_bands),
            band_width=float(self.conf.band_width),
            n_samples=int(self.conf.n_samples),
        )
        return {"line_descriptors": desc}

    def loss(self, pred, data):
        raise NotImplementedError


class LineMatcherLBD(BaseModel):
    """NN matching of LBD line descriptors with mutual check
    (reference: gluefactory/models/matchers/line_matcher_lbd.py:13-91)."""

    default_conf: ClassVar[dict] = {
        "score_th": 0.1,
        "trainable": False,
    }
    required_data_keys: ClassVar[list] = ["line_descriptors0", "line_descriptors1"]

    def _forward(self, data: dict) -> dict:
        sim = jnp.einsum(
            "bld,bmd->blm", data["line_descriptors0"], data["line_descriptors1"]
        )
        vl0 = data.get("valid_lines0")
        vl1 = data.get("valid_lines1")
        if vl0 is not None:
            sim = jnp.where(vl0[:, :, None], sim, NEG_INF)
        if vl1 is not None:
            sim = jnp.where(vl1[:, None, :], sim, NEG_INF)
        m0, ms0 = find_nn(sim, None, None)
        m1, ms1 = find_nn(jnp.swapaxes(sim, -1, -2), None, None)
        m0 = mutual_check(m0, m1)
        ok = ms0 > float(self.conf.score_th)
        return {
            "line_matches0": jnp.where(ok, m0, -1),
            "line_matches1": mutual_check(m1, m0),
            "line_matching_scores0": jnp.where(ok, ms0, 0.0),
            "line_matching_scores1": ms1,
        }

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = LBDDescriptor
