"""DISK keypoint detector-descriptor
(reference: gluefactory/models/extractors/disk_kornia.py:8-108, a wrapper
over kornia's pretrained DISK that loops the batch in VRAM-sized chunks).

Official topology, kept exactly: a depth-4 "thin" U-Net — plain 5x5 conv
stem, then pre-activation blocks (per-channel PReLU -> InstanceNorm
(affine=False) -> 5x5 conv) with 2x average-pool downsampling on the way
down (channels 16-32-64-64-64) and bilinear upsample + skip-concat on the
way up (64-64-64), ending in a (desc_dim + 1)-channel head: 128 descriptor
channels plus one raw detection-logit channel. Input dims must be padded to
a multiple of 16 (``pad_if_not_divisible``), like the reference :28-32.

Two sparse paths:

- native (default): TPU-canonical — iterated simple_nms, one static top-k,
  bilinear pixel-center descriptor sampling (subpixel-friendly).
- compat (``compat: true``): kornia ``heatmap_to_keypoints`` semantics for
  converted checkpoints — exact-equality max-pool NMS over a
  ``nms_window_size`` window, raw-logit scores, integer keypoint
  coordinates, descriptors gathered at those integer pixels and
  L2-normalized (kornia disk/detector.py + DISKFeatures.merge_with_
  descriptors).

The whole batch runs in one graph — no chunk loop (reference :58-75); on
TPU the U-Net convs stream through the MXU at any batch size.

``torch_weight_converter`` maps the kornia ``DISK.from_pretrained`` state
dict onto this param tree. It is layout-robust: parameters are recovered
per down/up block index and classified by tensor rank (4-D = conv kernel,
1-D named weight = PReLU slope), so the exact Sequential nesting inside
each block does not matter. InstanceNorm(affine=False, track_running_
stats=False) carries no parameters.
"""

from __future__ import annotations

import re
from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.interpolate import bilinear_sample
from ...ops.nms import max_pool_2d, select_top_k_keypoints, simple_nms
from ..base_model import BaseModel


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C))."""

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],)
        )
        return jnp.where(x >= 0, x, a * x)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) over the spatial dims of (B, H, W, C)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


class ThinConv(nn.Module):
    """One thin-U-Net conv unit: PReLU -> InstanceNorm -> 5x5 conv
    (pre-activation); the stem (``first=True``) is the bare conv."""

    features: int
    size: int = 5
    first: bool = False

    @nn.compact
    def __call__(self, x):
        if not self.first:
            x = PReLU(name="gate")(x)
            x = instance_norm(x)
        p = self.size // 2
        return nn.Conv(
            self.features, (self.size,) * 2, padding=[(p, p), (p, p)],
            name="conv",
        )(x)


class DISK(BaseModel):
    default_conf: ClassVar[dict] = {
        "down": [16, 32, 64, 64, 64],  # kornia Unet down channels
        "up": [64, 64, 64],  # up channels; head (desc+1) is appended
        "kernel_size": 5,
        "descriptor_dim": 128,
        "max_num_keypoints": 2048,
        "nms_window_size": 5,  # reference :14 (compat); native radius = //2
        "detection_threshold": 0.0,
        "pad_if_not_divisible": True,
        "dense_outputs": False,
        "compat": False,  # kornia integer-keypoint inference semantics
        "weights": None,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        down = list(self.conf.down)
        up = list(self.conf.up) + [int(self.conf.descriptor_dim) + 1]
        if len(up) != len(down) - 1:
            raise ValueError("need len(up)+1 == len(down)-1 up blocks")
        k = int(self.conf.kernel_size)
        self.path_down = [
            ThinConv(c, size=k, first=(i == 0), name=f"down{i}")
            for i, c in enumerate(down)
        ]
        self.path_up = [
            ThinConv(c, size=k, name=f"up{i}") for i, c in enumerate(up)
        ]

    def _unet(self, x: jnp.ndarray) -> jnp.ndarray:
        skips = []
        for i, block in enumerate(self.path_down):
            if i > 0:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = block(x)
            skips.append(x)
        for block, skip in zip(self.path_up, skips[-2::-1]):
            x = jax.image.resize(
                x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[-1]),
                "bilinear",
            )
            x = block(jnp.concatenate([x, skip], axis=-1))
        return x

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        b, h, w, _ = image.shape
        div = 2 ** (len(self.conf.down) - 1)
        if self.conf.pad_if_not_divisible and (h % div or w % div):
            ph, pw = (-h) % div, (-w) % div
            image = jnp.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
        out = self._unet(image)[:, :h, :w]
        d = int(self.conf.descriptor_dim)
        desc_dense = out[..., :d]
        heat = out[..., d]  # raw logits (kornia uses them un-squashed)

        if self.conf.compat:
            pred = self._sparse_compat(heat, desc_dense, data)
        else:
            pred = self._sparse_native(heat, desc_dense, data)
        if self.conf.dense_outputs:
            pred["descriptors_dense"] = desc_dense
            pred["heatmap"] = heat
        return pred

    def _sparse_native(self, heat, desc_dense, data):
        nmsed = simple_nms(heat, int(self.conf.nms_window_size) // 2)
        keypoints, scores, valid = select_top_k_keypoints(
            nmsed, k=int(self.conf.max_num_keypoints),
            threshold=float(self.conf.detection_threshold), border=2,
            image_size=data.get("image_size"),
        )
        dn = desc_dense / jnp.maximum(
            jnp.linalg.norm(desc_dense, axis=-1, keepdims=True), 1e-8
        )
        desc = bilinear_sample(dn, keypoints)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
        )
        return {
            "keypoints": keypoints + 0.5,
            "keypoint_scores": scores,
            "keypoint_valid": valid,
            "descriptors": desc,
        }

    def _sparse_compat(self, heat, desc_dense, data):
        """kornia heatmap_to_keypoints: exact-equality NMS over the window,
        integer coords, descriptors gathered at those pixels."""
        b, h, w = heat.shape
        k = int(self.conf.max_num_keypoints)
        local_max = max_pool_2d(heat, int(self.conf.nms_window_size) // 2)
        mask = (heat == local_max) & (
            heat > float(self.conf.detection_threshold)
        )
        scores = jnp.where(mask, heat, -jnp.inf)
        top, idx = jax.lax.top_k(scores.reshape(b, h * w), k)
        valid = jnp.isfinite(top)
        ky = idx // w
        kx = idx % w
        flat = desc_dense.reshape(b, h * w, -1)
        desc = jax.vmap(lambda f, i: f[i])(flat, idx)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
        )
        return {
            "keypoints": jnp.where(
                valid[..., None],
                jnp.stack([kx, ky], -1).astype(jnp.float32), 0.0
            ),
            "keypoint_scores": jnp.where(valid, top, 0.0),
            "keypoint_valid": valid,
            "descriptors": jnp.where(valid[..., None], desc, 0.0),
        }

    def loss(self, pred, data):
        raise NotImplementedError  # parity: reference disk_kornia.py:106-108


def torch_weight_converter(state_dict: dict) -> dict:
    """Map a kornia ``DISK.from_pretrained(...)`` state dict onto the flax
    param tree. Block membership comes from the ``unet.path_{down,up}.<i>.``
    prefix; within a block, the 4-D weight is the conv kernel (with its 1-D
    ``bias``) and a lone 1-D ``weight`` is the PReLU slope — robust to the
    exact Sequential nesting kornia uses inside each block."""
    groups: dict[str, dict] = {}
    for key, val in state_dict.items():
        m = re.match(r"(?:unet\.)?path_(down|up)\.(\d+)\.(.*)", key)
        if not m:
            continue
        path, idx, rest = m.group(1), int(m.group(2)), m.group(3)
        g = groups.setdefault(f"{path}{idx}", {})
        arr = np.asarray(val, np.float32)
        if arr.ndim == 4:
            g["kernel"] = arr.transpose(2, 3, 1, 0)
        elif rest.endswith("bias"):
            g["bias"] = arr
        elif arr.ndim == 1:
            g["alpha"] = arr
    params = {}
    for name, g in groups.items():
        p = {"conv": {"kernel": g["kernel"], "bias": g["bias"]}}
        if "alpha" in g:
            p["gate"] = {"alpha": g["alpha"]}
        params[name] = p
    return {"params": jax.tree.map(jnp.asarray, params)}


__main_model__ = DISK
