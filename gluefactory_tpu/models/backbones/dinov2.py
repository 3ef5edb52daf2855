"""DINOv2 ViT dense backbone (reference: gluefactory/models/backbones/
dinov2.py:7-29 — wraps ``torch.hub facebookresearch/dinov2`` and returns the
last intermediate layer as a dense feature map + class token).

Here the ViT is implemented natively in flax so it runs on TPU (the
reference's torch.hub download is unavailable and a torch wrapper would not
jit): patch-14 conv embedding, pre-norm transformer blocks with LayerScale,
bicubic positional-embedding interpolation for arbitrary input sizes, and an
optional SwiGLU MLP (the vitg14 variant). ``torch_weight_converter`` maps an
official DINOv2 state dict onto this param tree for exact-parity drop-in
(same pattern as the SuperPoint/LightGlue converters).

TPU notes: tokens stay (B, N, D) so every matmul (qkv / proj / mlp) is a
large MXU-friendly GEMM; attention uses ``ops.attention.attention`` which
dispatches to the fused Pallas kernel off the remote-compile tunnel.
"""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ..base_model import BaseModel

VARIANTS = {
    # embed_dim, depth, heads, mlp type (reference hub variants)
    "dinov2_vits14": (384, 12, 6, "mlp"),
    "dinov2_vitb14": (768, 12, 12, "mlp"),
    "dinov2_vitl14": (1024, 24, 16, "mlp"),
    "dinov2_vitg14": (1536, 40, 24, "swiglufused"),
}
PATCH = 14


class _Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class _SwiGLU(nn.Module):
    """SwiGLU-fused MLP of the giant variant (official ``mlp.w12``/``w3``)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x12 = nn.Dense(2 * self.hidden, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.dim, name="w3")(nn.silu(x1) * x2)


class _Block(nn.Module):
    dim: int
    heads: int
    mlp_type: str = "mlp"

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        h = self.heads
        dh = d // h
        y = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * d, name="attn_qkv")(y)
        q, k, v = [
            t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)  # -> (B, H, N, Dh)
            for t in jnp.split(qkv, 3, axis=-1)
        ]
        o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, n, d)
        o = nn.Dense(d, name="attn_proj")(o)
        gamma1 = self.param("ls1_gamma", nn.initializers.ones, (d,))
        x = x + gamma1 * o
        y = nn.LayerNorm(name="norm2")(x)
        if self.mlp_type == "swiglufused":
            # official dinov2 SwiGLUFFNFused: hidden = round-up-to-8 of
            # (4*d * 2/3) — 4096 for d=1536, NOT 4*d (the torch w12 weight is
            # (2*4096, 1536); declaring 4*d here would break the converter's
            # exact-parity drop-in for vitg14)
            hidden = (int(4 * d * 2 / 3) + 7) // 8 * 8
            y = _SwiGLU(d, hidden, name="mlp")(y)
        else:
            y = _Mlp(d, 4 * d, name="mlp")(y)
        gamma2 = self.param("ls2_gamma", nn.initializers.ones, (d,))
        return x + gamma2 * y


class DinoViT(nn.Module):
    """Patch-14 ViT returning (patch_tokens, cls_token) after the final
    LayerNorm (≙ get_intermediate_layers(n=1, return_class_token=True,
    norm=True), reference dinov2.py:19-21)."""

    dim: int
    depth: int
    heads: int
    mlp_type: str = "mlp"
    pos_grid: int = 37  # official checkpoints: 518/14

    @nn.compact
    def __call__(self, image):
        b, hh, ww, _ = image.shape
        gh, gw = hh // PATCH, ww // PATCH
        x = nn.Conv(
            self.dim, (PATCH, PATCH), strides=(PATCH, PATCH),
            padding="VALID", name="patch_embed",
        )(image).reshape(b, gh * gw, self.dim)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + self.pos_grid * self.pos_grid, self.dim),
        )
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            # bicubic grid interpolation (≙ interpolate_pos_encoding)
            pos_patch = jax.image.resize(
                pos_patch.reshape(1, self.pos_grid, self.pos_grid, self.dim),
                (1, gh, gw, self.dim),
                "bicubic",
            ).reshape(1, gh * gw, self.dim)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls + pos_cls, (b, 1, self.dim)),
             x + pos_patch], axis=1
        )
        for i in range(self.depth):
            x = _Block(self.dim, self.heads, self.mlp_type,
                       name=f"block{i}")(x)
        x = nn.LayerNorm(name="norm")(x)
        return x[:, 1:].reshape(b, gh, gw, self.dim), x[:, 0]


class DinoV2(BaseModel):
    """Dense DINOv2 features (reference dinov2.py:7-29): ``features``
    (B, H/14, W/14, D) NHWC, ``global_descriptor`` (B, D) class token,
    ``descriptors`` (B, N, D) flattened patch tokens."""

    default_conf: ClassVar[dict] = {
        "weights": "dinov2_vits14",  # variant key (conf-name parity)
        "allow_resize": False,  # round H/W down to a multiple of 14
        # override depth/dim for tests / scratch training; None = variant
        "depth": None,
        "dim": None,
        "heads": None,
        "pos_grid": 37,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        dim, depth, heads, mlp_type = VARIANTS[self.conf.weights]
        self.net = DinoViT(
            dim=int(self.conf.dim or dim),
            depth=int(self.conf.depth or depth),
            heads=int(self.conf.heads or heads),
            mlp_type=mlp_type,
            pos_grid=int(self.conf.pos_grid),
            name="vit",
        )

    @property
    def out_dim(self) -> int:
        return int(self.conf.dim or VARIANTS[self.conf.weights][0])

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        if image.shape[-1] == 1:
            image = jnp.repeat(image, 3, axis=-1)  # ViT expects RGB
        b, h, w, c = image.shape
        if self.conf.allow_resize:
            image = jax.image.resize(
                image, (b, h // PATCH * PATCH, w // PATCH * PATCH, c),
                "bilinear",
            )
        elif h % PATCH or w % PATCH:
            # the VALID-padded patch conv would silently drop up to 13 border
            # px and spatially misalign downstream features (the official
            # torch ViT asserts on this too)
            raise ValueError(
                f"DINOv2 input {h}x{w} is not a multiple of {PATCH}; set "
                "allow_resize=true or pad/crop the input"
            )
        feats, cls_token = self.net(image)
        return {
            "features": feats,
            "global_descriptor": cls_token,
            "descriptors": feats.reshape(feats.shape[0], -1, feats.shape[-1]),
        }

    def loss(self, pred, data):
        raise NotImplementedError  # frozen backbone (reference dinov2.py:28)


def torch_weight_converter(state_dict: dict, conf=None) -> dict:
    """Map an official DINOv2 hub state dict (cls_token / pos_embed /
    patch_embed.proj / blocks.{i}.{norm1,attn.qkv,attn.proj,ls1,norm2,mlp,
    ls2} / norm) onto the ``DinoV2`` param tree."""
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}

    def lin(src):
        return {"kernel": sd[f"{src}.weight"].T, "bias": sd[f"{src}.bias"]}

    def ln(src):
        return {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}

    vit = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "patch_embed": {
            "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.proj.bias"],
        },
        "norm": ln("norm"),
    }
    n_blocks = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    for i in range(n_blocks):
        p = f"blocks.{i}"
        if f"{p}.mlp.fc1.weight" in sd:
            mlp = {"fc1": lin(f"{p}.mlp.fc1"), "fc2": lin(f"{p}.mlp.fc2")}
        else:  # swiglufused (vitg14)
            mlp = {"w12": lin(f"{p}.mlp.w12"), "w3": lin(f"{p}.mlp.w3")}
        vit[f"block{i}"] = {
            "norm1": ln(f"{p}.norm1"),
            "attn_qkv": lin(f"{p}.attn.qkv"),
            "attn_proj": lin(f"{p}.attn.proj"),
            "ls1_gamma": sd[f"{p}.ls1.gamma"],
            "norm2": ln(f"{p}.norm2"),
            "mlp": mlp,
            "ls2_gamma": sd[f"{p}.ls2.gamma"],
        }
    return {"params": jax.tree.map(jnp.asarray, {"vit": vit})}


__main_model__ = DinoV2
