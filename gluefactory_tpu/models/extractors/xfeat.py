"""XFeat: accelerated lightweight keypoint detector-descriptor
(reference: gluefactory/models/extractors/xfeat.py:91-221 — the verlab XFeat
CNN, re-designed in flax/NHWC).

Official multi-scale topology, kept exactly: instance-normalized grayscale
input; a 1/4-resolution stem (block1) with an avg-pool skip; block3/4/5
pyramid to 1/32; bilinear pyramid fusion back to 1/8 with a fusion block
producing the 64-d descriptor map; a reliability head on the fused features;
and a 65-channel cell-logit keypoint head fed by the 8x8 pixel-unshuffled
*image* (reference xfeat.py:150-155,212-214), not the CNN features.

Two sparse paths:

- native (default): TPU-canonical ops — iterated simple_nms, one static
  top-k, bilinear pixel-center descriptor sampling, GroupNorm in the conv
  blocks (batch-independent, shards cleanly over a mesh; the official
  BatchNorm(affine=False) is an inference-time constant anyway and is folded
  away by the converter).
- compat (``compat: true``): bit-faithful official inference semantics for
  converted checkpoints — exact-equality 5x5 NMS (reference xfeat.py:298-323),
  nearest(heatmap) x bilinear(reliability) scoring with the official
  (W-1)-normalized grid quirk (xfeat.py:28-33), descending-score top-k with
  the (0,0)-keypoint invalidation (xfeat.py:364-372), and bicubic
  grid_sample descriptor interpolation (xfeat.py:274,375).

``torch_weight_converter`` maps the official verlab ``xfeat.pt`` state dict
(reference xfeat.py:239-241) onto the compat graph, folding every
BatchNorm(affine=False) into its conv. The dense ``fine_matcher`` MLP of
xfeat-dense is not replicated: the reference loads but never calls it
(xfeat.py:158-173 is dead weight in glue-factory's forward).
"""

from __future__ import annotations

from typing import ClassVar

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ...ops.interpolate import (
    bicubic_sample_zeros,
    bilinear_sample,
    cell_logits_to_heatmap,
    sample_descriptors,
)
from ...ops.nms import max_pool_2d, select_top_k_keypoints, simple_nms
from ..base_model import BaseModel


class BasicLayer(nn.Module):
    """Conv -> (norm) -> ReLU (reference xfeat.py:52-83). The conv always
    carries a bias so folded-BN checkpoints land in the same param tree."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "none"  # "none" (compat / folded) or "group" (native)

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel,) * 2, strides=(self.stride,) * 2,
            padding=[(p, p), (p, p)], name="conv",
        )(x)
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=4, name="gn")(x)
        return nn.relu(x)


def _unfold8(x: jnp.ndarray) -> jnp.ndarray:
    """8x8 pixel-unshuffle of a single-channel image (reference
    xfeat.py:175-181): (B, H, W, 1) -> (B, H/8, W/8, 64), channel = wy*8+wx.
    Truncates any remainder rows/cols like torch.Tensor.unfold."""
    b, h, w, _ = x.shape
    hc, wc = h // 8, w // 8
    x = x[:, : hc * 8, : wc * 8, 0]
    x = x.reshape(b, hc, 8, wc, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, hc, wc, 64)


# softmax + dustbin-drop + 8x8 pixel-unshuffle (reference xfeat.py:289-296)
# lives in ops.interpolate.cell_logits_to_heatmap, shared with SuperPoint.


def _normgrid_pixels(pts: jnp.ndarray, full_hw, map_hw) -> jnp.ndarray:
    """Official XFeat grid mapping (reference xfeat.py:28-33 + grid_sample
    align_corners=False): full-res pixel (x, y) -> feature-map coords
    x * map_w / (full_w - 1) - 0.5 (and likewise y)."""
    fh, fw = full_hw
    mh, mw = map_hw
    x = pts[..., 0] * (mw / (fw - 1.0)) - 0.5
    y = pts[..., 1] * (mh / (fh - 1.0)) - 0.5
    return jnp.stack([x, y], axis=-1)


def _interp_rows_zeros(n_out: int, n_map: int, n_full: int) -> jnp.ndarray:
    """Dense (n_out, n_map) 1-D bilinear interpolation matrix for the
    official grid mapping, zeros padding. Row i holds the two tap weights of
    output position i; a matmul with it IS the grid_sample — MXU-friendly."""
    p = np.arange(n_out) * (n_map / (n_full - 1.0)) - 0.5
    i0 = np.floor(p).astype(np.int64)
    f = p - i0
    rows = np.zeros((n_out, n_map), np.float32)
    for tap, wgt in ((i0, 1.0 - f), (i0 + 1, f)):
        ok = (tap >= 0) & (tap < n_map)
        rows[np.arange(n_out)[ok], tap[ok]] += wgt[ok]
    return jnp.asarray(rows)


def _nearest_index_zeros(n_out: int, n_map: int, n_full: int):
    """Index vector + in-bounds mask for dense nearest sampling under the
    official grid mapping (round half-to-even, zeros padding)."""
    p = np.arange(n_out) * (n_map / (n_full - 1.0)) - 0.5
    i = np.round(p).astype(np.int64)  # numpy rounds half-to-even like torch
    ok = (i >= 0) & (i < n_map)
    return jnp.asarray(np.clip(i, 0, n_map - 1)), jnp.asarray(ok)


class XFeat(BaseModel):
    default_conf: ClassVar[dict] = {
        "max_num_keypoints": 4096,
        "detection_threshold": 0.05,  # reference NMS.threshold
        "nms_radius": 2,  # kernel 5 (reference NMS.kernel_size)
        "descriptor_dim": 64,
        "dense_outputs": False,
        "compat": False,  # official inference semantics for converted weights
        "weights": None,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        norm = "none" if self.conf.compat else "group"

        def BL(f, k=3, s=1):
            return BasicLayer(f, kernel=k, stride=s, norm=norm)

        # reference xfeat.py:103-155
        self.skip_conv = nn.Conv(24, (1, 1), name="skip_conv")
        self.block1 = [BL(4), BL(8, s=2), BL(8), BL(24, s=2)]
        self.block2 = [BL(24), BL(24)]
        self.block3 = [BL(64, s=2), BL(64), BL(64, k=1)]
        self.block4 = [BL(64, s=2), BL(64), BL(64)]
        self.block5 = [BL(128, s=2), BL(128), BL(128), BL(64, k=1)]
        self.fusion = [BL(64), BL(64)]
        self.fusion_conv = nn.Conv(64, (1, 1), name="fusion_conv")
        self.heat_blocks = [BL(64, k=1), BL(64, k=1)]
        self.heat_conv = nn.Conv(1, (1, 1), name="heat_conv")
        self.kp_blocks = [BL(64, k=1), BL(64, k=1), BL(64, k=1)]
        self.kp_conv = nn.Conv(65, (1, 1), name="kp_conv")

    def _dense_maps(self, image: jnp.ndarray):
        """Backbone forward (reference xfeat.py:183-220). image (B, H, W, C)
        -> (desc_map (B, H/8, W/8, 64), kp_logits (B, H/8, W/8, 65),
        reliability (B, H/8, W/8))."""
        x = image
        if x.shape[-1] != 1:
            x = jnp.mean(x, axis=-1, keepdims=True)
        # InstanceNorm2d(1), affine=False, eps 1e-5; no grad through the
        # normalization (reference xfeat.py:193-196)
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        x = jax.lax.stop_gradient((x - mu) * jax.lax.rsqrt(var + 1e-5))

        h = x
        for blk in self.block1:
            h = blk(h)
        skip = nn.avg_pool(x, (4, 4), strides=(4, 4))
        x2 = h + self.skip_conv(skip)
        for blk in self.block2:
            x2 = blk(x2)
        x3 = x2
        for blk in self.block3:
            x3 = blk(x3)
        x4 = x3
        for blk in self.block4:
            x4 = blk(x4)
        x5 = x4
        for blk in self.block5:
            x5 = blk(x5)
        tgt = (x3.shape[0], x3.shape[1], x3.shape[2], x3.shape[3])
        x4u = jax.image.resize(x4, tgt, "bilinear")
        x5u = jax.image.resize(x5, tgt, "bilinear")
        feats = x3 + x4u + x5u
        for blk in self.fusion:
            feats = blk(feats)
        desc_map = self.fusion_conv(feats)

        rel = desc_map
        for blk in self.heat_blocks:
            rel = blk(rel)
        rel = jax.nn.sigmoid(self.heat_conv(rel)[..., 0])

        kp = _unfold8(x)
        for blk in self.kp_blocks:
            kp = blk(kp)
        kp_logits = self.kp_conv(kp)
        return desc_map, kp_logits, rel

    # ---- official sparse semantics (compat) ------------------------------

    def _sparse_compat(self, image, desc_map, kp_logits, rel):
        b, h, w, _ = image.shape
        k = int(self.conf.max_num_keypoints)
        heat = cell_logits_to_heatmap(kp_logits)  # (B, Hh, Wh)
        _, hh, wh = heat.shape
        hc, wc = rel.shape[1], rel.shape[2]

        # exact-equality NMS, kernel 2r+1 (reference xfeat.py:298-323)
        local_max = max_pool_2d(heat, int(self.conf.nms_radius))
        mask = (heat == local_max) & (
            heat > float(self.conf.detection_threshold)
        )

        # dense combined score: nearest(heat) * bilinear(reliability), both
        # under the official (full-res - 1)-normalized grid (xfeat.py:357-362)
        ix, okx = _nearest_index_zeros(wh, wh, w)
        iy, oky = _nearest_index_zeros(hh, hh, h)
        heat_n = heat[:, iy][:, :, ix] * (oky[:, None] & okx[None, :])
        ah = _interp_rows_zeros(hh, hc, h)
        aw = _interp_rows_zeros(wh, wc, w)
        rel_d = jnp.einsum("Hh,bhw,Ww->bHW", ah, rel, aw)
        cscore = jnp.where(mask, heat_n * rel_d, -1.0)
        # the official path invalidates any keypoint at (0, 0) — padded or
        # genuine (reference xfeat.py:364-365)
        cscore = cscore.at[:, 0, 0].set(-1.0)

        scores, idx = jax.lax.top_k(cscore.reshape(b, hh * wh), k)
        ky = (idx // wh).astype(jnp.float32)
        kx = (idx % wh).astype(jnp.float32)
        padded = scores <= -1.0
        kx = jnp.where(padded, 0.0, kx)
        ky = jnp.where(padded, 0.0, ky)
        kpts = jnp.stack([kx, ky], axis=-1)

        # bicubic descriptor interpolation of the L2-normalized map at the
        # official grid coords; renormalize after (xfeat.py:350,374-378)
        dmap_n = desc_map / jnp.maximum(
            jnp.linalg.norm(desc_map, axis=-1, keepdims=True), 1e-12
        )
        pts_map = _normgrid_pixels(kpts, (h, w), (hc, wc))
        desc = bicubic_sample_zeros(dmap_n, pts_map)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )
        return {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "keypoint_valid": scores > 0,
            "descriptors": desc,
        }

    # ---- TPU-canonical sparse path (native) ------------------------------

    def _sparse_native(self, data, desc_map, kp_logits, rel):
        heat = cell_logits_to_heatmap(kp_logits)
        heat = simple_nms(heat, int(self.conf.nms_radius))
        keypoints, scores, valid = select_top_k_keypoints(
            heat, k=int(self.conf.max_num_keypoints),
            threshold=float(self.conf.detection_threshold), border=4,
            image_size=data.get("image_size"),
        )
        dmap_n = desc_map / jnp.maximum(
            jnp.linalg.norm(desc_map, axis=-1, keepdims=True), 1e-12
        )
        desc = sample_descriptors(dmap_n, keypoints, stride=8)
        rel_kp = bilinear_sample(
            rel[..., None], (keypoints - 3.5) / 8.0
        )[..., 0]
        return {
            "keypoints": keypoints + 0.5,  # pixel-center convention
            "keypoint_scores": scores * rel_kp,
            "keypoint_valid": valid,
            "descriptors": desc,
        }

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        desc_map, kp_logits, rel = self._dense_maps(image)
        if self.conf.compat:
            pred = self._sparse_compat(image, desc_map, kp_logits, rel)
        else:
            pred = self._sparse_native(data, desc_map, kp_logits, rel)
        if self.conf.dense_outputs:
            pred["descriptors_dense"] = desc_map
            pred["keypoint_logit_map"] = kp_logits
            pred["reliability"] = rel
        return pred

    def loss(self, pred, data):
        raise NotImplementedError  # parity: reference xfeat.py:430-431


def torch_weight_converter(state_dict: dict) -> dict:
    """Map the official verlab ``xfeat.pt`` state dict (the checkpoint the
    reference downloads at xfeat.py:239-241) onto the ``compat: true`` param
    tree, folding each BatchNorm2d(affine=False) into its conv (the conv is
    bias-free in torch, so the folded graph is exactly conv+bias+relu)."""
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}
    params = {}

    def fold(dst, src):
        w = sd[f"{src}.layer.0.weight"]
        mean = sd[f"{src}.layer.1.running_mean"]
        var = sd[f"{src}.layer.1.running_var"]
        s = np.sqrt(var + 1e-5)
        params[dst] = {"conv": {
            "kernel": (w / s[:, None, None, None]).transpose(2, 3, 1, 0),
            "bias": -mean / s,
        }}

    def plain(dst, src):
        params[dst] = {
            "kernel": sd[f"{src}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{src}.bias"],
        }

    plain("skip_conv", "skip1.1")
    for name, n in (("block1", 4), ("block2", 2), ("block3", 3),
                    ("block4", 3), ("block5", 4)):
        for i in range(n):
            fold(f"{name}_{i}", f"{name}.{i}")
    for i in range(2):
        fold(f"fusion_{i}", f"block_fusion.{i}")
    plain("fusion_conv", "block_fusion.2")
    for i in range(2):
        fold(f"heat_blocks_{i}", f"heatmap_head.{i}")
    plain("heat_conv", "heatmap_head.2")
    for i in range(3):
        fold(f"kp_blocks_{i}", f"keypoint_head.{i}")
    plain("kp_conv", "keypoint_head.3")
    return {"params": jax.tree.map(jnp.asarray, params)}


__main_model__ = XFeat
