"""GlueStick joint point-line matcher
(reference: gluefactory/models/matchers/gluestick.py:18-776 — re-designed
TPU-first, not ported).

Architecture (keeping the reference's graph structure):
  - keypoint encoder: MLP(pos, score) added to visual descriptors
    (KeypointEncoder, gluestick.py:484);
  - line endpoint encoder: MLP(endpoint, offset-to-partner, line score)
    (EndPtEncoder, gluestick.py:495);
  - N layers of [self-attention + line message pass, cross-attention]
    (gluestick.py:525-684). The line message gathers endpoint descriptors by
    ``lines_junc_idx``, runs an MLP on [desc, partner desc, line encoding],
    and scatters back onto junction slots. Scatter is a one-hot einsum —
    static shapes, MXU-shaped, batched (vs the reference's scatter_mean);
  - point assignment: dustbin double-softmax (ops/assignment.log_double_softmax,
    gluestick.py:761-772);
  - line assignment from the point log-assignment gathered at junction
    indices, max over the two endpoint orderings (gluestick.py:329-369);
  - losses: point NLL + line NLL (gluestick.py:371-455).

Attention runs through the shared ops/attention kernel with padding masks.
"""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.assignment import filter_matches, log_double_softmax
from ...ops.attention import attention
from ..base_model import BaseModel
from ..utils.losses import nll_loss
from ..utils.metrics import matcher_metrics

ETH_EPS = 1e-8


class MLP(nn.Module):
    dims: tuple
    norm: str = "layer"  # 'layer' | 'none' (imported torch checkpoints use
    # k=1 BatchNorm, folded exactly into the preceding dense)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"dense_{i}")(x)
            if i < len(self.dims) - 1:
                if self.norm == "layer":
                    x = nn.LayerNorm(name=f"norm_{i}")(x)
                x = nn.relu(x)
        return x


def normalize_points(pts, image_size):
    size = image_size[:, None, :]
    center = size / 2.0
    scale = jnp.max(size, axis=-1, keepdims=True) * 0.7
    return (pts - center) / (scale + ETH_EPS)


class AttnLayer(nn.Module):
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


class LineMessage(nn.Module):
    """Endpoint message passing along lines (reference LineLayer,
    gluestick.py:582-684)."""

    dim: int
    norm: str = "layer"

    @nn.compact
    def __call__(self, desc, line_enc, lines_junc_idx, valid_lines):
        # desc (B, N, D) full node set; lines_junc_idx points into the
        # junction slots, so the one-hot scatter over the full node set only
        # ever hits junctions — no static slot-count argument needed (keeps
        # the module remat-able without static_argnums)
        b, n, d = desc.shape
        idx = lines_junc_idx  # (B, 2L) into junction slots
        ep_desc = jnp.take_along_axis(desc, idx[..., None], axis=1)  # (B, 2L, D)
        twoL = idx.shape[1]
        partner = ep_desc.reshape(b, twoL // 2, 2, d)[:, :, ::-1].reshape(b, twoL, d)
        msg = MLP(dims=(2 * d, d), norm=self.norm, name="mlp")(
            jnp.concatenate([ep_desc, partner, line_enc], axis=-1)
        )
        ep_valid = jnp.repeat(valid_lines, 2, axis=-1).astype(desc.dtype)
        # scatter-mean via one-hot einsum (static shapes, MXU-shaped)
        onehot = (idx[..., None] == jnp.arange(n)).astype(desc.dtype)
        onehot = onehot * ep_valid[..., None]
        denom = jnp.maximum(jnp.sum(onehot, axis=1), 1.0)  # (B, N)
        agg = jnp.einsum("bld,blj->bjd", msg, onehot) / denom[..., None]
        return desc + agg


class GlueStick(BaseModel):
    default_conf: ClassVar[dict] = {
        "input_dim": 256,
        "descriptor_dim": 256,
        "num_heads": 4,
        "n_layers": 9,
        "filter_threshold": 0.2,
        "line_filter_threshold": 0.2,
        "checkpointed": False,  # nn.remat every attention/line layer
        "norm": "layer",  # 'none' for imported official checkpoints
        "line_score_source": "point_assignment",  # | 'line_proj': a separate
        # final_line_proj scores the junction descriptors (the reference's
        # formulation, gluestick.py:329-369; needed for checkpoint parity)
        "compat_score_tiling": False,  # replicate the reference EndPtEncoder
        # quirk of TILING line scores over endpoints (gluestick.py:507-514)
        # while endpoints themselves are interleaved
        "inference_only": False,  # skip inter-supervision heads at eval
        "inter_supervision": None,  # list of layer indices with extra line
        # supervision heads (reference gluestick.py:371-455)
        "loss": {"nll_weight": 1.0, "line_nll_weight": 1.0,
                 "inter_weight": 0.5},
    }
    required_data_keys: ClassVar[list] = [
        "keypoints0", "keypoints1", "descriptors0", "descriptors1",
        "lines0", "lines1", "lines_junc_idx0", "lines_junc_idx1",
    ]

    def setup(self):
        d = self.conf.descriptor_dim
        self.input_proj = nn.Dense(d, name="input_proj")
        self.kenc = MLP(dims=(32, 64, 128, 256, d), norm=self.conf.norm,
                        name="kenc")
        self.lenc = MLP(dims=(32, 64, 128, 256, d), norm=self.conf.norm,
                        name="lenc")
        attn_cls = nn.remat(AttnLayer) if self.conf.checkpointed else AttnLayer
        line_cls = nn.remat(LineMessage) if self.conf.checkpointed else LineMessage
        norm = self.conf.norm
        self.self_layers = [
            attn_cls(d, self.conf.num_heads, norm, name=f"self_{i}")
            for i in range(self.conf.n_layers)
        ]
        self.cross_layers = [
            attn_cls(d, self.conf.num_heads, norm, name=f"cross_{i}")
            for i in range(self.conf.n_layers)
        ]
        self.line_layers = [
            line_cls(d, norm, name=f"line_{i}") for i in range(self.conf.n_layers)
        ]
        if self.conf.line_score_source == "line_proj":
            self.final_line_proj = nn.Dense(d, name="final_line_proj")
        self.inter_layers = list(self.conf.inter_supervision or [])
        self.inter_line_proj = [
            nn.Dense(d, name=f"inter_line_proj_{i}") for i in self.inter_layers
        ]
        self.final_proj = nn.Dense(d, name="final_proj")
        self.bin_score = self.param("bin_score", nn.initializers.ones, ())
        self.line_bin_score = self.param("line_bin_score", nn.initializers.ones, ())

    def _encode_view(self, data: dict, i: str):
        size = data.get(f"view{i}", {}).get("image_size", data.get(f"image_size{i}"))
        kpts = data[f"keypoints{i}"]
        desc = self.input_proj(data[f"descriptors{i}"])
        normed = normalize_points(kpts, size)
        desc = desc + self.kenc(
            jnp.concatenate([normed, data[f"keypoint_scores{i}"][..., None]], axis=-1)
        )
        lines = data[f"lines{i}"]  # (B, L, 2, 2)
        b, L = lines.shape[0], lines.shape[1]
        eps = lines.reshape(b, 2 * L, 2)
        eps_n = normalize_points(eps, size)
        partner = eps_n.reshape(b, L, 2, 2)[:, :, ::-1].reshape(b, 2 * L, 2)
        lscore = data.get(f"line_scores{i}", jnp.ones((b, L)))
        if self.conf.compat_score_tiling:
            # reference quirks (gluestick.py:507-514): scores TILED over the
            # two endpoints (endpoints interleaved) and used unnormalized
            lscore = jnp.tile(lscore, (1, 2))
        else:
            lscore = jnp.repeat(lscore, 2, axis=-1)
            lscore = lscore / (jnp.max(lscore, axis=-1, keepdims=True) + ETH_EPS)
        line_enc = self.lenc(
            jnp.concatenate([eps_n, partner - eps_n, lscore[..., None]], axis=-1)
        )
        return desc, line_enc

    def _forward(self, data: dict) -> dict:
        conf = self.conf
        mask0 = data.get("keypoint_valid0")
        mask1 = data.get("keypoint_valid1")
        desc0, lenc0 = self._encode_view(data, "0")
        desc1, lenc1 = self._encode_view(data, "1")
        idx0 = data["lines_junc_idx0"]
        idx1 = data["lines_junc_idx1"]
        vl0 = data.get("valid_lines0", jnp.ones(data["lines0"].shape[:2], bool))
        vl1 = data.get("valid_lines1", jnp.ones(data["lines1"].shape[:2], bool))
        inter_preds = {}
        for i in range(conf.n_layers):
            desc0 = self.self_layers[i](desc0, desc0, mask0)
            desc1 = self.self_layers[i](desc1, desc1, mask1)
            desc0 = self.line_layers[i](desc0, lenc0, idx0, vl0)
            desc1 = self.line_layers[i](desc1, lenc1, idx1, vl1)
            d0 = self.cross_layers[i](desc0, desc1, mask1)
            d1 = self.cross_layers[i](desc1, desc0, mask0)
            desc0, desc1 = d0, d1
            if i in self.inter_layers and (
                self.is_initializing() or not self.conf.get("inference_only", False)
            ):
                # intermediate line supervision head (reference
                # gluestick.py:283-307): per-layer projection -> junction
                # scores -> line log-assignment
                proj = self.inter_line_proj[self.inter_layers.index(i)]
                md0, md1 = proj(desc0), proj(desc1)
                sim_i = jnp.einsum(
                    "bnd,bmd->bnm", md0, md1
                ) / conf.descriptor_dim**0.5
                scores_i = log_double_softmax(sim_i, self.bin_score, mask0, mask1)
                _, lm = self._line_matches(
                    scores_i[:, :-1, :-1], idx0, idx1, vl0, vl1,
                    conf.line_filter_threshold,
                )
                inter_preds[f"line_{i}_log_assignment"] = lm["line_log_assignment"]
        mdesc0 = self.final_proj(desc0)
        mdesc1 = self.final_proj(desc1)
        sim = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1) / conf.descriptor_dim**0.5
        scores = log_double_softmax(sim, self.bin_score, mask0, mask1)
        matches = filter_matches(scores[:, :-1, :-1], conf.filter_threshold)
        pred = {"log_assignment": scores, **matches}
        if mask0 is not None:
            pred["matches0"] = jnp.where(mask0, pred["matches0"], -1)
        if mask1 is not None:
            pred["matches1"] = jnp.where(mask1, pred["matches1"], -1)

        # ---- line assignment --------------------------------------------
        if conf.line_score_source == "line_proj":
            # reference formulation: a dedicated projection scores junction
            # descriptors (gluestick.py:329-369)
            ml0 = self.final_line_proj(desc0)
            ml1 = self.final_line_proj(desc1)
            line_src = jnp.einsum("bnd,bmd->bnm", ml0, ml1) / conf.descriptor_dim**0.5
        else:
            line_src = scores[:, :-1, :-1]
        line_scores_mat, line_matches = self._line_matches(
            line_src, idx0, idx1, vl0, vl1, conf.line_filter_threshold
        )
        pred.update(line_matches)
        pred.update(inter_preds)
        pred["raw_line_scores"] = line_scores_mat
        return pred

    def _line_matches(self, scores, idx0, idx1, vl0, vl1, threshold):
        """(reference _get_line_matches, gluestick.py:329-369)"""
        b = scores.shape[0]
        L0 = idx0.shape[1] // 2
        L1 = idx1.shape[1] // 2
        # gather (B, 2L0, 2L1) endpoint-pair scores
        s = jnp.take_along_axis(scores, idx0[..., None], axis=1)
        s = jnp.take_along_axis(s, idx1[:, None, :], axis=2)
        s = s.reshape(b, L0, 2, L1, 2)
        straight = 0.5 * (s[:, :, 0, :, 0] + s[:, :, 1, :, 1])
        flipped = 0.5 * (s[:, :, 0, :, 1] + s[:, :, 1, :, 0])
        line_scores = jnp.maximum(straight, flipped)
        pair_valid = vl0[:, :, None] & vl1[:, None, :]
        line_scores = jnp.where(pair_valid, line_scores, -1e30)
        ls = log_double_softmax(line_scores, self.line_bin_score, vl0, vl1)
        matches = filter_matches(ls[:, :-1, :-1], threshold)
        out = {
            "line_matches0": jnp.where(vl0, matches["matches0"], -1),
            "line_matches1": jnp.where(vl1, matches["matches1"], -1),
            "line_matching_scores0": matches["matching_scores0"],
            "line_matching_scores1": matches["matching_scores1"],
            "line_log_assignment": ls,
        }
        return line_scores, out

    def loss(self, pred: dict, data: dict):
        conf = self.conf.loss
        total_pt, nllp, nlln = nll_loss(
            pred["log_assignment"], data["gt_matches0"], data["gt_matches1"]
        )
        losses = {
            "assignment_nll": total_pt,
            "nll_pos": nllp,
            "nll_neg": nlln,
        }
        total = conf.nll_weight * total_pt
        if "gt_line_matches0" in data:
            total_ln, _, _ = nll_loss(
                pred["line_log_assignment"],
                data["gt_line_matches0"],
                data["gt_line_matches1"],
            )
            losses["line_nll"] = total_ln
            total = total + conf.line_nll_weight * total_ln
            # inter-layer line supervision (reference gluestick.py:428-433)
            for i in list(self.conf.inter_supervision or []):
                key = f"line_{i}_log_assignment"
                if key in pred:
                    nll_i, _, _ = nll_loss(
                        pred[key],
                        data["gt_line_matches0"],
                        data["gt_line_matches1"],
                    )
                    losses[f"line_nll_{i}"] = nll_i
                    total = total + conf.inter_weight * nll_i
        losses["total"] = total
        metrics = matcher_metrics(pred, data)
        return losses, metrics


__main_model__ = GlueStick


def torch_weight_converter(state_dict: dict, conf=None) -> dict:
    """Map the official GlueStick checkpoint (cvg/GlueStick release;
    reference gluestick.py module names) onto this param tree. Use with
    ``norm: none, line_score_source: line_proj, compat_score_tiling: true``.

    Layout notes: Conv1d k=1 -> Dense (transposed); k=1 BatchNorms fold
    exactly into the preceding conv; attention head channel order permuted
    (torch (head_dim, heads) -> ours (heads, head_dim)); the official model
    has no input projection (input_dim == descriptor_dim) so input_proj
    becomes identity."""
    import numpy as np

    cfg = GlueStick.collect_default_conf().merge(conf or {})
    d = int(cfg.descriptor_dim)
    h = int(cfg.num_heads)
    hd = d // h
    L = int(cfg.n_layers)
    eps = 1e-5

    def lin(prefix):
        w = np.asarray(state_dict[f"{prefix}.weight"])
        if w.ndim == 3:
            w = w[..., 0]
        return {"kernel": w.T.astype(np.float32),
                "bias": np.asarray(state_dict[f"{prefix}.bias"], np.float32)}

    def lin_bn(conv_p, bn_p):
        w = np.asarray(state_dict[f"{conv_p}.weight"], np.float64)[..., 0]
        b = np.asarray(state_dict[f"{conv_p}.bias"], np.float64)
        gamma = np.asarray(state_dict[f"{bn_p}.weight"], np.float64)
        beta = np.asarray(state_dict[f"{bn_p}.bias"], np.float64)
        mean = np.asarray(state_dict[f"{bn_p}.running_mean"], np.float64)
        var = np.asarray(state_dict[f"{bn_p}.running_var"], np.float64)
        a = gamma / np.sqrt(var + eps)
        return {"kernel": (a[:, None] * w).T.astype(np.float32),
                "bias": (a * (b - mean) + beta).astype(np.float32)}

    perm = np.asarray(
        [d_i * h + h_i for h_i in range(h) for d_i in range(hd)], np.int64
    )

    def qkv(prefix):
        p = lin(prefix)
        return {"kernel": p["kernel"][:, perm], "bias": p["bias"][perm]}

    def merge(prefix):
        p = lin(prefix)
        return {"kernel": p["kernel"][perm, :], "bias": p["bias"]}

    def enc(prefix):
        return {
            "dense_0": lin_bn(f"{prefix}.0", f"{prefix}.1"),
            "dense_1": lin_bn(f"{prefix}.3", f"{prefix}.4"),
            "dense_2": lin_bn(f"{prefix}.6", f"{prefix}.7"),
            "dense_3": lin_bn(f"{prefix}.9", f"{prefix}.10"),
            "dense_4": lin(f"{prefix}.12"),
        }

    params: dict = {
        "input_proj": {"kernel": np.eye(d, dtype=np.float32),
                       "bias": np.zeros(d, np.float32)},
        "kenc": enc("kenc.encoder"),
        "lenc": enc("lenc.encoder"),
        "final_proj": lin("final_proj"),
        "final_line_proj": lin("final_line_proj"),
        "bin_score": np.asarray(state_dict["bin_score"], np.float32).reshape(()),
        "line_bin_score": np.asarray(
            state_dict["line_bin_score"], np.float32
        ).reshape(()),
    }
    for i in range(L):
        for kind, j in (("self", 2 * i), ("cross", 2 * i + 1)):
            base = f"gnn.layers.{j}.update"
            params[f"{kind}_{i}"] = {
                "q": qkv(f"{base}.attn.proj.0"),
                "k": qkv(f"{base}.attn.proj.1"),
                "v": qkv(f"{base}.attn.proj.2"),
                "out": merge(f"{base}.attn.merge"),
                "mlp": {
                    "dense_0": lin_bn(f"{base}.mlp.0", f"{base}.mlp.1"),
                    "dense_1": lin(f"{base}.mlp.3"),
                },
            }
        lbase = f"gnn.line_layers.{i}"
        params[f"line_{i}"] = {"mlp": {
            "dense_0": lin_bn(f"{lbase}.mlp.0", f"{lbase}.mlp.1"),
            "dense_1": lin(f"{lbase}.mlp.3"),
        }}
    return {"params": params}
