"""Configurable dense backbone encoders (reference: gluefactory/models/
backbones/backbone_encoder.py:1-328 — the ALIKED encoder family with the
``aliked-{t16,n16,n16rot,n32}`` channel configurations that JPLDD/POLD2 use
as their trunk).

``AlikedEncoder`` is the multi-scale conv/res/DCN trunk: two conv blocks,
two deformable res blocks, each scale projected to ``dim // 4`` channels,
bilinearly upsampled to full resolution, concatenated and SELU-gated
(reference backbone_encoder.py:55-180).

INTENTIONAL DEVIATION from the reference scale schedule: the reference
stacks pool2/pool4/pool4 (scales 1/2/8/32) with ResBlocks at blocks 2-4;
this trunk uses strides 1/2/4/8 with a plain ConvBlock at block2 — a
denser pyramid whose receptive field tops out at H/8 instead of H/32,
which preserves thin structures (lines/junctions) for the JPLDD/POLD2
consumers at the cost of less global context. Official ALIKED encoder
weights therefore do NOT graft into this module — the weight-compatible
topology lives in extractors/aliked.py (CompatResBlock + converter).
``make_backbone`` is the selector used by the JPLDD/POLD2
``backbone.name`` conf slot.

TPU notes: NHWC throughout; average-pool downsampling and bilinear
``jax.image.resize`` upsampling are XLA-fusable; the DCN is a gather+GEMM
(see extractors/aliked.py DeformableConv) so the whole trunk maps onto the
MXU with no custom scatter ops.
"""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..base_model import BaseModel

ALIKED_CFGS = {
    # reference backbone_encoder.py:15-52
    "aliked-t16": {"c1": 8, "c2": 16, "c3": 32, "c4": 64, "dim": 64},
    "aliked-n16": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128},
    "aliked-n16rot": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128},
    "aliked-n32": {"c1": 16, "c2": 32, "c3": 64, "c4": 128, "dim": 128},
}


class AlikedEncoder(nn.Module):
    """(B, H, W, C) image -> (B, H, W, dim) fused multi-scale features."""

    c1: int = 16
    c2: int = 32
    c3: int = 64
    c4: int = 128
    dim: int = 128

    @nn.compact
    def __call__(self, image):
        # local import: extractors.aliked also imports backbones for cfgs
        from ..extractors.aliked import ConvBlock, ResBlock

        x1 = ConvBlock(self.c1, name="block1")(image)
        x2 = ConvBlock(self.c2, stride=2, name="block2")(x1)
        x3 = ResBlock(self.c3, deformable=True, name="block3")(
            nn.avg_pool(x2, (2, 2), strides=(2, 2))
        )
        x4 = ResBlock(self.c4, deformable=True, name="block4")(
            nn.avg_pool(x3, (2, 2), strides=(2, 2))
        )
        b, h, w, _ = image.shape
        d4 = self.dim // 4
        outs = []
        for i, x in enumerate((x1, x2, x3, x4), start=1):
            f = nn.Conv(d4, (1, 1), name=f"agg_conv{i}")(x)
            if f.shape[1:3] != (h, w):
                f = jax.image.resize(f, (b, h, w, d4), "bilinear")
            outs.append(f)
        return nn.selu(jnp.concatenate(outs, axis=-1))


class AlikedBackbone(BaseModel):
    """Registered wrapper: ``backbones.backbone_encoder`` /
    ``make_backbone({"name": "aliked", ...})``."""

    default_conf: ClassVar[dict] = {"model_name": "aliked-n16"}
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        cfg = ALIKED_CFGS[self.conf.model_name]
        self.net = AlikedEncoder(**cfg, name="encoder")

    @property
    def out_dim(self) -> int:
        return ALIKED_CFGS[self.conf.model_name]["dim"]

    def _forward(self, data: dict) -> dict:
        return {"features": self.net(data["image"])}


def make_backbone(conf) -> BaseModel:
    """Build a dense backbone by conf ``name``: ``aliked`` (+ cfg
    ``model_name``), ``vgg_unet`` (+ ``tiny``), or ``dinov2`` (+ variant
    conf). Every returned model maps ``{"image"}`` -> ``{"features"}`` and
    exposes ``out_dim`` (reference backbone_encoder.py's role as the JPLDD
    trunk selector, joint_point_line_extractor.py:135-143)."""
    conf = dict(conf)
    name = conf.pop("name")
    if name in ("aliked", "backbone_encoder"):
        return AlikedBackbone.from_conf(conf)
    if name == "vgg_unet":
        from .vgg_unet import VGGUNetBackbone

        return VGGUNetBackbone.from_conf(conf)
    if name == "dinov2":
        from .dinov2 import DinoV2

        return DinoV2.from_conf(conf)
    raise ValueError(f"Unknown backbone '{name}'")


__main_model__ = AlikedBackbone
