"""SuperPoint-open: the rpautrat TF-port variant with configurable VGG
channels (reference: gluefactory/models/extractors/superpoint_open.py:78-220).

Architecturally identical to extractors.superpoint here (that module already
exposes ``channels``/``head_channels``); this subclass pins the open-source
release's defaults and provides the checkpoint converter.

The open release interleaves BatchNorm AFTER each ReLU (VGGBlock =
conv -> relu -> bn, reference superpoint_open.py:59-76). Folding those BNs
into neighboring convs is inexact at SAME-padding borders, so imported
checkpoints keep each post-ReLU BN as an explicit per-channel affine
(``post_relu_affine: true``, XLA fuses it for free); only the relu-free
head blocks' BNs fold exactly into their own conv's output — a per-channel
linear map on the conv OUTPUT, which is exact everywhere including borders.
The conversion is therefore mathematically exact; remaining differences vs
the torch forward are float32 accumulation-order noise (measured max |Δ|
~4e-4 on unit-norm descriptors, bounded by the converter parity test).
``desc_sampling: torch`` gives exact descriptor-grid parity."""

from __future__ import annotations

from typing import ClassVar

from .superpoint import SuperPoint


class SuperPointOpen(SuperPoint):
    default_conf: ClassVar[dict] = {
        "detection_threshold": 0.015,
        "nms_radius": 4,
        "channels": [64, 64, 64, 64, 128, 128, 128, 128],
        "head_channels": 256,
        "descriptor_dim": 256,
        "desc_sampling": "torch",
        "post_relu_affine": True,
    }


__main_model__ = SuperPointOpen


def torch_weight_converter(state_dict: dict) -> dict:
    """Map the rpautrat ``superpoint_v6_from_tf.pth`` state dict onto this
    param tree: post-ReLU BNs become explicit ChannelAffine params (exact at
    SAME-padding borders); the relu-free head BNs fold into their convs'
    outputs. Input: name -> numpy array dict; BN eps = 1e-3 (reference)."""
    import numpy as np

    eps = 1e-3

    def conv(prefix):
        w = np.asarray(state_dict[f"{prefix}.conv.weight"])  # (O, I, kh, kw)
        b = np.asarray(state_dict[f"{prefix}.conv.bias"])
        return w.transpose(2, 3, 1, 0).astype(np.float64), b.astype(np.float64)

    def bn_affine(prefix):
        gamma = np.asarray(state_dict[f"{prefix}.bn.weight"], np.float64)
        beta = np.asarray(state_dict[f"{prefix}.bn.bias"], np.float64)
        mean = np.asarray(state_dict[f"{prefix}.bn.running_mean"], np.float64)
        var = np.asarray(state_dict[f"{prefix}.bn.running_var"], np.float64)
        a = gamma / np.sqrt(var + eps)
        return a, beta - a * mean

    def conv_params(w, b):
        return {"kernel": w.astype(np.float32), "bias": b.astype(np.float32)}

    def affine_params(a, b):
        return {"scale": a.astype(np.float32), "bias": b.astype(np.float32)}

    blocks = [f"backbone.{s}.{l}" for s in range(4) for l in range(2)]
    params: dict = {"backbone": {}}
    for i, blk in enumerate(blocks):
        params["backbone"][f"conv{i}"] = conv_params(*conv(blk))
        params["backbone"][f"affine{i}"] = affine_params(*bn_affine(blk))

    for torch_head, name_a, name_b in [
        ("detector", "convPa", "convPb"),
        ("descriptor", "convDa", "convDb"),
    ]:
        params[name_a] = conv_params(*conv(f"{torch_head}.0"))
        params[f"affine{name_a[-2:]}"] = affine_params(
            *bn_affine(f"{torch_head}.0")
        )
        wb, bb = conv(f"{torch_head}.1")
        a_out, b_out = bn_affine(f"{torch_head}.1")
        wb = wb * a_out[None, None, None, :]
        bb = a_out * bb + b_out
        params[name_b] = conv_params(wb, bb)
    return {"params": params}
