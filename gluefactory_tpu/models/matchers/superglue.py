"""SuperGlue attention matcher with Sinkhorn optimal transport
(reference: gluefactory_nonfree/superglue.py:208-342 — re-designed, not
ported: attention uses the shared ops/attention kernel with padding masks,
Sinkhorn runs as a lax.scan (ops/assignment.log_optimal_transport), and all
shapes are static)."""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax.numpy as jnp

from ...ops.assignment import filter_matches, log_optimal_transport
from ...ops.attention import attention
from ..base_model import BaseModel
from ..utils.losses import nll_loss
from ..utils.metrics import matcher_metrics


class MLP(nn.Module):
    dims: tuple
    norm: str = "layer"  # 'layer' | 'none' — the official torch checkpoints
    # use (foldable, k=1) BatchNorm, imported with norm='none'

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"dense_{i}")(x)
            if i < len(self.dims) - 1:
                if self.norm == "layer":
                    x = nn.LayerNorm(name=f"norm_{i}")(x)
                x = nn.relu(x)
        return x


class KeypointEncoder(nn.Module):
    """MLP over (x, y, score) added to the visual descriptor
    (reference superglue.py:64-76)."""

    dim: int
    layers: tuple = (32, 64, 128, 256)  # + dim = the official MLP chain
    norm: str = "layer"

    @nn.compact
    def __call__(self, kpts, scores, image_size):
        size = image_size[:, None, :]
        center = size / 2.0
        scale = jnp.max(size, axis=-1, keepdims=True) * 0.7
        normed = (kpts - center) / (scale + 1e-8)
        feats = jnp.concatenate([normed, scores[..., None]], axis=-1)
        return MLP(dims=(*self.layers, self.dim), norm=self.norm,
                   name="encoder")(feats)


class AttentionalPropagation(nn.Module):
    """One message-passing layer: MHA + MLP on [x, message]
    (reference superglue.py:101-118)."""

    dim: int
    num_heads: int
    norm: str = "layer"

    @nn.compact
    def __call__(self, x, source, source_mask=None):
        d, h = self.dim, self.num_heads
        hd = d // h
        b, n, _ = x.shape

        def heads(t):
            return t.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(d, name="q")(x))
        k = heads(nn.Dense(d, name="k")(source))
        v = heads(nn.Dense(d, name="v")(source))
        msg = attention(q, k, v, kv_mask=source_mask)
        msg = msg.transpose(0, 2, 1, 3).reshape(b, n, d)
        msg = nn.Dense(d, name="out")(msg)
        upd = MLP(dims=(2 * d, d), norm=self.norm, name="mlp")(
            jnp.concatenate([x, msg], axis=-1)
        )
        return x + upd


class SuperGlue(BaseModel):
    default_conf: ClassVar[dict] = {
        "input_dim": 256,
        "descriptor_dim": 256,
        "num_heads": 4,
        "n_layers": 9,
        "sinkhorn_iterations": 50,
        "filter_threshold": 0.2,
        "norm": "layer",  # 'none' for imported official checkpoints
        "loss": {"nll_balancing": 0.5},
    }
    required_data_keys: ClassVar[list] = [
        "keypoints0", "keypoints1", "descriptors0", "descriptors1"
    ]

    def setup(self):
        d = self.conf.descriptor_dim
        self.input_proj = nn.Dense(d, name="input_proj")
        self.kenc = KeypointEncoder(d, norm=self.conf.norm, name="kenc")
        self.layers = [
            AttentionalPropagation(d, self.conf.num_heads, norm=self.conf.norm,
                                   name=f"gnn_{i}_{kind}")
            for i in range(self.conf.n_layers)
            for kind in ("self", "cross")
        ]
        self.final_proj = nn.Dense(d, name="final_proj")
        self.bin_score = self.param("bin_score", nn.initializers.ones, ())

    def _forward(self, data: dict) -> dict:
        conf = self.conf
        mask0 = data.get("keypoint_valid0")
        mask1 = data.get("keypoint_valid1")
        size0 = data.get("view0", {}).get("image_size", data.get("image_size0"))
        size1 = data.get("view1", {}).get("image_size", data.get("image_size1"))
        desc0 = self.input_proj(data["descriptors0"])
        desc1 = self.input_proj(data["descriptors1"])
        desc0 = desc0 + self.kenc(data["keypoints0"], data["keypoint_scores0"], size0)
        desc1 = desc1 + self.kenc(data["keypoints1"], data["keypoint_scores1"], size1)
        for i in range(conf.n_layers):
            self_l = self.layers[2 * i]
            cross_l = self.layers[2 * i + 1]
            desc0 = self_l(desc0, desc0, source_mask=mask0)
            desc1 = self_l(desc1, desc1, source_mask=mask1)
            d0 = cross_l(desc0, desc1, source_mask=mask1)
            d1 = cross_l(desc1, desc0, source_mask=mask0)
            desc0, desc1 = d0, d1
        mdesc0 = self.final_proj(desc0)
        mdesc1 = self.final_proj(desc1)
        sim = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1) / self.conf.descriptor_dim**0.5
        scores = log_optimal_transport(
            sim, self.bin_score, iters=int(conf.sinkhorn_iterations),
            mask0=mask0, mask1=mask1,
        )
        matches = filter_matches(scores[:, :-1, :-1], conf.filter_threshold)
        pred = {"log_assignment": scores, **matches}
        if mask0 is not None:
            pred["matches0"] = jnp.where(mask0, pred["matches0"], -1)
        if mask1 is not None:
            pred["matches1"] = jnp.where(mask1, pred["matches1"], -1)
        return pred

    def loss(self, pred: dict, data: dict):
        total, nll_pos, nll_neg = nll_loss(
            pred["log_assignment"], data["gt_matches0"], data["gt_matches1"],
            balance=True,
        )
        losses = {
            "total": total,
            "assignment_nll": total,
            "nll_pos": nll_pos,
            "nll_neg": nll_neg,
        }
        return losses, matcher_metrics(pred, data)


__main_model__ = SuperGlue


def torch_weight_converter(state_dict: dict, conf=None) -> dict:
    """Map the official MagicLeap ``superglue_{indoor,outdoor}.pth`` state
    dict onto this module's param tree (use with ``norm: none``).

    Layout notes:
      - Conv1d k=1 weight (O, I, 1) -> Dense kernel (I, O);
      - (k=1) BatchNorms inside the MLPs fold exactly into the preceding
        conv: W' = a*W, b' = a*b + beta with a = gamma/sqrt(var+eps);
      - head channel order differs: torch views d as (head_dim, heads), this
        implementation as (heads, head_dim) — q/k/v output rows and the
        merge input columns are permuted accordingly;
      - the reference has no input projection: input_proj becomes identity.
    """
    import numpy as np

    cfg = SuperGlue.collect_default_conf().merge(conf or {})
    d = int(cfg.descriptor_dim)
    h = int(cfg.num_heads)
    hd = d // h
    L = int(cfg.n_layers)
    eps = 1e-5  # torch BatchNorm1d default

    def lin(prefix):
        w = np.asarray(state_dict[f"{prefix}.weight"])
        if w.ndim == 3:  # conv1d k=1
            w = w[..., 0]
        return {"kernel": w.T.astype(np.float32),
                "bias": np.asarray(state_dict[f"{prefix}.bias"], np.float32)}

    def lin_bn_folded(conv_prefix, bn_prefix):
        w = np.asarray(state_dict[f"{conv_prefix}.weight"], np.float64)[..., 0]
        b = np.asarray(state_dict[f"{conv_prefix}.bias"], np.float64)
        gamma = np.asarray(state_dict[f"{bn_prefix}.weight"], np.float64)
        beta = np.asarray(state_dict[f"{bn_prefix}.bias"], np.float64)
        mean = np.asarray(state_dict[f"{bn_prefix}.running_mean"], np.float64)
        var = np.asarray(state_dict[f"{bn_prefix}.running_var"], np.float64)
        a = gamma / np.sqrt(var + eps)
        return {"kernel": (a[:, None] * w).T.astype(np.float32),
                "bias": (a * (b - mean) + beta).astype(np.float32)}

    # head-order permutation: ours[c=h_i*hd+d_i] = theirs[c=d_i*h+h_i]
    perm = np.asarray(
        [d_i * h + h_i for h_i in range(h) for d_i in range(hd)], np.int64
    )

    def qkv(prefix):
        p = lin(prefix)
        return {"kernel": p["kernel"][:, perm], "bias": p["bias"][perm]}

    def merge(prefix):
        p = lin(prefix)
        return {"kernel": p["kernel"][perm, :], "bias": p["bias"]}

    params: dict = {
        "input_proj": {
            "kernel": np.eye(d, dtype=np.float32),
            "bias": np.zeros(d, np.float32),
        },
        "kenc": {"encoder": {
            "dense_0": lin_bn_folded("kenc.encoder.0", "kenc.encoder.1"),
            "dense_1": lin_bn_folded("kenc.encoder.3", "kenc.encoder.4"),
            "dense_2": lin_bn_folded("kenc.encoder.6", "kenc.encoder.7"),
            "dense_3": lin_bn_folded("kenc.encoder.9", "kenc.encoder.10"),
            "dense_4": lin("kenc.encoder.12"),
        }},
        "final_proj": lin("final_proj"),
        "bin_score": np.asarray(state_dict["bin_score"], np.float32).reshape(()),
    }
    for i in range(L):
        for kind, j in (("self", 2 * i), ("cross", 2 * i + 1)):
            base = f"gnn.layers.{j}"
            params[f"gnn_{i}_{kind}"] = {
                "q": qkv(f"{base}.attn.proj.0"),
                "k": qkv(f"{base}.attn.proj.1"),
                "v": qkv(f"{base}.attn.proj.2"),
                "out": merge(f"{base}.attn.merge"),
                "mlp": {
                    "dense_0": lin_bn_folded(f"{base}.mlp.0", f"{base}.mlp.1"),
                    "dense_1": lin(f"{base}.mlp.3"),
                },
            }
    return {"params": params}
