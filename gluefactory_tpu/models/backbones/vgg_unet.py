"""VGG-style UNet backbone (reference: gluefactory/models/backbones/
vgg_unet.py:6-100 — 4 encoder blocks of [Conv3x3-ReLU-BN]x2 with avg-pool
downsampling, 4 decoder blocks with bilinear-upsample + skip concat; output
is a full-resolution feature map of dim 32 (tiny) or 64).

TPU-native deviations from the reference:
  - GroupNorm instead of BatchNorm: batch-size independent, no mutable
    running statistics to thread through jit, and no cross-device batch-stat
    synchronisation under SPMD data parallelism.
  - NHWC layout and ``jax.image.resize`` bilinear upsampling (XLA fuses the
    resize+concat+conv chain; channels-last feeds the MXU directly).
"""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..base_model import BaseModel


class _DoubleConv(nn.Module):
    """[Conv3x3 -> ReLU -> GroupNorm] x 2 (≙ reference encoder/decoder
    block, vgg_unet.py:16-83)."""

    features: int
    mid_features: int | None = None

    @nn.compact
    def __call__(self, x):
        mid = self.mid_features or self.features
        for i, f in enumerate((mid, self.features)):
            x = nn.Conv(f, (3, 3), padding="SAME", name=f"conv{i + 1}")(x)
            x = nn.relu(x)
            x = nn.GroupNorm(num_groups=min(8, f), name=f"norm{i + 1}")(x)
        return x


class VGGUNet(nn.Module):
    """Encoder-decoder trunk; input (B, H, W, 1) grayscale, output
    (B, H, W, sizes[0]) (reference vgg_unet.py:85-100)."""

    tiny: bool = False

    @nn.compact
    def __call__(self, x):
        sizes = [32, 64, 128, 256] if self.tiny else [64, 128, 256, 512]
        feats = [_DoubleConv(sizes[0], name="block1")(x)]
        for i, s in enumerate(sizes[1:], start=2):
            down = nn.avg_pool(feats[-1], (2, 2), strides=(2, 2))
            feats.append(_DoubleConv(s, name=f"block{i}")(down))
        # decoder: deepest block first, then upsample + skip concat.
        # channel schedule matches the reference's decoder blocks (vgg_unet
        # deblock3: s2->s1, deblock2: s1->s0, deblock1: s0->s0) — one step
        # narrower than an earlier revision that carried 2-4x the params
        mids = sizes[:-1][::-1]
        outs = [sizes[1], sizes[0], sizes[0]]
        out = _DoubleConv(sizes[2], name="deblock4")(feats[-1])
        for i, (s_mid, s_out, skip) in enumerate(
            zip(mids, outs, feats[:-1][::-1])
        ):
            b, h, w, _ = skip.shape
            up = jax.image.resize(out, (b, h, w, out.shape[-1]), "bilinear")
            out = _DoubleConv(
                s_out, mid_features=s_mid, name=f"deblock{3 - i}"
            )(jnp.concatenate([up, skip], axis=-1))
        return out


class VGGUNetBackbone(BaseModel):
    """Registered wrapper so ``backbones.vgg_unet`` is usable as a submodel
    (e.g. the JPLDD/POLD2 ``backbone`` slot, reference pold2.py:37)."""

    default_conf: ClassVar[dict] = {"tiny": False}
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        self.net = VGGUNet(tiny=bool(self.conf.tiny), name="unet")

    @property
    def out_dim(self) -> int:
        return 32 if self.conf.tiny else 64

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        if image.shape[-1] != 1:  # luminance: reference trains grayscale
            image = jnp.mean(image, axis=-1, keepdims=True)
        feats = self.net(image)
        return {"features": feats}


__main_model__ = VGGUNetBackbone
