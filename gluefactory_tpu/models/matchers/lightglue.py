"""LightGlue attention matcher, trainable
(reference: gluefactory/models/matchers/lightglue.py:306-612).

TPU-first re-design decisions:
  - Attention runs through ops/attention (Pallas fused kernel on TPU, XLA on
    CPU test meshes); self-attention uses the fused-rotary kernel variant
    (ops/attention.self_attention_rotary) so the rotated q copies never
    round-trip HBM. The reference's adaptive-width index_select compaction
    (lightglue.py:478-508) is replaced by masking pruned tokens out of the
    KV sets while keeping static shapes (SURVEY.md §5.7). NOTE on cost:
    masking zeroes attention weights but the kernel still computes every
    tile, so width pruning alone saves no FLOPs here — the real savings come
    from depth pruning below.
  - Adaptive depth (early exit, lightglue.py:473-477,541-552) is a
    batch-wide lax.cond per layer at inference: once every batch item is
    confident, the remaining layers are SKIPPED at runtime (XLA conditional
    executes one branch), and the log-assignment head of the *exit* layer
    produces the matches, exactly like the reference. For batch size 1 the
    semantics match the reference's per-image exit; for larger batches the
    exit fires when all items agree (the reference only supports batch 1
    here). Default off during training.
  - Rotary positional encoding is precomputed once from normalized keypoint
    positions (LearnableFourierPositionalEncoding, lightglue.py:46-60) and
    applied in the attention blocks.
  - Deep supervision: every layer has its own MatchAssignment head; layer
    descriptors are stacked with lax so the loss is one batched einsum over
    (L, B, N, D) rather than a Python loop of host round-trips.
"""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.assignment import filter_matches, sigmoid_log_double_softmax
from ...ops.attention import attention, self_attention_rotary
from ..base_model import BaseModel
from ..utils.losses import nll_loss_no_bins
from ..utils.metrics import matcher_metrics


def normalize_keypoints(kpts: jnp.ndarray, size: jnp.ndarray | None) -> jnp.ndarray:
    """Center + scale keypoints by the image extent
    (reference lightglue.py:22-33)."""
    if size is None:
        size = jnp.max(kpts, axis=-2, keepdims=True) - jnp.min(kpts, axis=-2, keepdims=True)
        center = (jnp.max(kpts, axis=-2, keepdims=True) + jnp.min(kpts, axis=-2, keepdims=True)) / 2
        scale = jnp.max(size, axis=-1, keepdims=True) / 2.0
        return (kpts - center) / (scale + 1e-8)
    size = size[..., None, :]
    shift = size / 2.0
    scale = jnp.max(size, axis=-1, keepdims=True) / 2.0
    return (kpts - shift) / (scale + 1e-8)


class TokenConfidence(nn.Module):
    """(reference lightglue.py:520-558)"""

    @nn.compact
    def __call__(self, desc0, desc1):
        token = nn.Dense(1, name="token")
        return (
            nn.sigmoid(token(desc0))[..., 0],
            nn.sigmoid(token(desc1))[..., 0],
        )


class MatchAssignmentHead(nn.Module):
    """Sigmoid-matchability double-softmax head (reference lightglue.py:250-285).
    One shared final projection for both views + per-view matchability."""

    dim: int

    def setup(self):
        self.final_proj = nn.Dense(self.dim, name="final_proj")
        self.matchability = nn.Dense(1, name="matchability")

    def sim(self, desc0, desc1):
        d = self.dim
        mdesc0 = self.final_proj(desc0) / d**0.25
        mdesc1 = self.final_proj(desc1) / d**0.25
        return jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1)

    def __call__(self, desc0, desc1, mask0=None, mask1=None):
        sim = self.sim(desc0, desc1)
        z0 = self.matchability(desc0)[..., 0]
        z1 = self.matchability(desc1)[..., 0]
        scores = sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1)
        return scores, sim, z0, z1

    def get_matchability(self, desc):
        return nn.sigmoid(self.matchability(desc)[..., 0])


class SelfBlock(nn.Module):
    """Rotary self-attention + gated FFN (reference lightglue.py:125-158)."""

    dim: int
    num_heads: int
    attn_impl: str = "auto"
    dtype: str = "float32"

    @property
    def _cdt(self):
        return jnp.bfloat16 if self.dtype == "bf16" else jnp.float32

    @nn.compact
    def __call__(self, x, rot, mask=None):
        d, h = self.dim, self.num_heads
        hd = d // h
        qkv = nn.Dense(3 * d, name="Wqkv", dtype=self._cdt)(x)
        b, n, _ = x.shape
        qkv = qkv.reshape(b, n, h, 3, hd).transpose(0, 2, 1, 4, 3)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        cos, sin = rot
        # rotary fused into the attention kernel on TPU (one HBM pass saved)
        msg = self_attention_rotary(
            q, k, v, cos, sin, kv_mask=mask, implementation=self.attn_impl
        )
        msg = msg.transpose(0, 2, 1, 3).reshape(b, n, d)
        msg = nn.Dense(d, name="out_proj", dtype=self._cdt)(msg)
        return x + self._ffn(x, msg)

    def _ffn(self, x, msg):
        d = self.dim
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * d, name="ffn_0", dtype=self._cdt)(y)
        y = nn.LayerNorm(name="ffn_norm", dtype=self._cdt)(y)
        y = nn.gelu(y)
        y = nn.Dense(d, name="ffn_2", dtype=self._cdt)(y)
        return y


class CrossBlock(nn.Module):
    """Bidirectional cross-attention with a shared QK projection
    (reference lightglue.py:160-216): both views project through the same
    to_qk map, so attention 0->1 and 1->0 reuse one similarity structure."""

    dim: int
    num_heads: int
    attn_impl: str = "auto"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x0, x1, mask0=None, mask1=None):
        d, h = self.dim, self.num_heads
        hd = d // h
        cdt = jnp.bfloat16 if self.dtype == "bf16" else jnp.float32
        to_qk = nn.Dense(d, name="to_qk", dtype=cdt)
        to_v = nn.Dense(d, name="to_v", dtype=cdt)
        out_proj = nn.Dense(d, name="to_out", dtype=cdt)
        b, n0, _ = x0.shape
        n1 = x1.shape[1]

        def heads(t):
            return t.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)

        qk0, qk1 = heads(to_qk(x0)), heads(to_qk(x1))
        v0, v1 = heads(to_v(x0)), heads(to_v(x1))
        m0 = attention(qk0, qk1, v1, kv_mask=mask1, implementation=self.attn_impl)
        m1 = attention(qk1, qk0, v0, kv_mask=mask0, implementation=self.attn_impl)
        m0 = out_proj(m0.transpose(0, 2, 1, 3).reshape(b, n0, d))
        m1 = out_proj(m1.transpose(0, 2, 1, 3).reshape(b, n1, d))
        ffn = FFN(dim=d, dtype=self.dtype, name="ffn")
        return x0 + ffn(x0, m0), x1 + ffn(x1, m1)


class FFN(nn.Module):
    dim: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, msg):
        cdt = jnp.bfloat16 if self.dtype == "bf16" else jnp.float32
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * self.dim, name="ffn_0", dtype=cdt)(y)
        y = nn.LayerNorm(name="ffn_norm", dtype=cdt)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="ffn_2", dtype=cdt)(y)
        return y


class TransformerLayer(nn.Module):
    """(reference lightglue.py:218-247)"""

    dim: int
    num_heads: int
    attn_impl: str = "auto"
    dtype: str = "float32"

    def setup(self):
        self.self0 = SelfBlock(self.dim, self.num_heads, self.attn_impl, self.dtype,
                               name="self_attn")
        self.cross = CrossBlock(self.dim, self.num_heads, self.attn_impl, self.dtype,
                                name="cross_attn")

    def __call__(self, desc0, desc1, rot0, rot1, mask0=None, mask1=None):
        desc0 = self.self0(desc0, rot0, mask=mask0)
        desc1 = self.self0(desc1, rot1, mask=mask1)
        return self.cross(desc0, desc1, mask0=mask0, mask1=mask1)


class LightGlue(BaseModel):
    default_conf: ClassVar[dict] = {
        "input_dim": 256,
        "descriptor_dim": 256,
        "add_scale_ori": False,
        "n_layers": 9,
        "num_heads": 4,
        "flash": True,  # Pallas fused attention on TPU
        "attention": None,  # force an impl: 'xla' | 'pallas' | 'ring'
        # ('ring' = token-axis-sharded sequence parallelism; wrap the apply
        # in ops.attention.ring_context(mesh, axis))
        "filter_threshold": 0.1,
        "depth_confidence": -1,  # adaptive depth (eval-only); -1 = off
        "width_confidence": -1,  # adaptive width via masking; -1 = off
        "checkpointed": True,
        "save_layer_outputs": True,  # stack per-layer descs for the deep-
        # supervision loss; set False at inference to skip the stacking
        "dtype": "float32",  # bf16 runs the transformer in bfloat16
        "weights": None,
        "loss": {
            "gamma": 1.0,
            "fn": "nll",
            "nll_balancing": 0.5,
        },
    }
    required_data_keys: ClassVar[list] = [
        "keypoints0", "keypoints1", "descriptors0", "descriptors1"
    ]

    def setup(self):
        conf = self.conf
        d = conf.descriptor_dim
        self.input_proj = nn.Dense(d, name="input_proj")
        head_dim = d // conf.num_heads
        # Learnable Fourier features: 2 (+2 with scale/ori) -> head_dim/2.
        in_dim = 4 if conf.add_scale_ori else 2
        self.posenc = nn.Dense(head_dim // 2, use_bias=False, name="posenc")
        attn_impl = conf.attention or ("auto" if conf.flash else "xla")
        layer = TransformerLayer
        if conf.checkpointed:
            layer = nn.remat(TransformerLayer, static_argnums=())
        self.layers = [
            layer(d, conf.num_heads, attn_impl, conf.dtype, name=f"transformers_{i}")
            for i in range(conf.n_layers)
        ]
        self.assignments = [
            MatchAssignmentHead(d, name=f"log_assignment_{i}") for i in range(conf.n_layers)
        ]
        self.confidences = [
            TokenConfidence(name=f"token_confidence_{i}") for i in range(conf.n_layers - 1)
        ]

    def _encode(self, data: dict):
        conf = self.conf
        kpts0 = normalize_keypoints(data["keypoints0"], data.get("view0", {}).get("image_size", data.get("image_size0")))
        kpts1 = normalize_keypoints(data["keypoints1"], data.get("view1", {}).get("image_size", data.get("image_size1")))
        if conf.add_scale_ori:
            sc0 = data["scales0"][..., None] if data.get("scales0") is not None else jnp.zeros_like(kpts0[..., :1])
            or0 = data["oris0"][..., None] if data.get("oris0") is not None else jnp.zeros_like(kpts0[..., :1])
            sc1 = data["scales1"][..., None] if data.get("scales1") is not None else jnp.zeros_like(kpts1[..., :1])
            or1 = data["oris1"][..., None] if data.get("oris1") is not None else jnp.zeros_like(kpts1[..., :1])
            kpts0 = jnp.concatenate([kpts0, sc0, or0], axis=-1)
            kpts1 = jnp.concatenate([kpts1, sc1, or1], axis=-1)
        desc0 = self.input_proj(data["descriptors0"])
        desc1 = self.input_proj(data["descriptors1"])
        # Rotary frequencies, shared across heads (lightglue.py:46-60).
        proj0 = self.posenc(kpts0)
        proj1 = self.posenc(kpts1)
        rot0 = (jnp.repeat(jnp.cos(proj0), 2, -1), jnp.repeat(jnp.sin(proj0), 2, -1))
        rot1 = (jnp.repeat(jnp.cos(proj1), 2, -1), jnp.repeat(jnp.sin(proj1), 2, -1))
        return desc0, desc1, rot0, rot1

    def _adaptive_layer(self, i: int, rot0, rot1, mask0, mask1):
        """Branch function for the batch-wide early-exit cond at layer i:
        run the layer, evaluate token confidence, optionally prune width,
        and — the moment the exit criterion fires — score the matches with
        THIS layer's assignment head (reference lightglue.py:495-497 applies
        log_assignment[i] of the exit layer)."""
        conf = self.conf
        last = i == conf.n_layers - 1

        def run(carry):
            (desc0, desc1, act0, act1, _done, scores, z0, z1, prune0, prune1,
             exit_layer) = carry
            nd0, nd1 = self.layers[i](desc0, desc1, rot0, rot1, act0, act1)
            f0 = nd0.astype(jnp.float32)
            f1 = nd1.astype(jnp.float32)
            if last:
                new_done = jnp.asarray(True)
            else:
                c0, c1 = self.confidences[i](f0, f1)
                th = self.confidence_threshold(i)
                if conf.depth_confidence > 0:
                    confident = jnp.concatenate(
                        [jnp.where(act0, c0 > th, True),
                         jnp.where(act1, c1 > th, True)], axis=1
                    )
                    ratio = jnp.mean(confident.astype(jnp.float32), axis=1)
                    new_done = jnp.all(ratio > conf.depth_confidence)
                else:
                    new_done = jnp.asarray(False)
                if conf.width_confidence > 0:
                    m0 = self.assignments[i].get_matchability(f0)
                    m1 = self.assignments[i].get_matchability(f1)
                    drop0 = (c0 > th) & (m0 < (1.0 - conf.width_confidence))
                    drop1 = (c1 > th) & (m1 < (1.0 - conf.width_confidence))
                    act0 = act0 & ~drop0
                    act1 = act1 & ~drop1
                    prune0 = prune0 + (~drop0).astype(jnp.int32)
                    prune1 = prune1 + (~drop1).astype(jnp.int32)

            def head(_):
                s, _sim, hz0, hz1 = self.assignments[i](f0, f1, mask0, mask1)
                return s, hz0, hz1

            scores, z0, z1 = jax.lax.cond(
                new_done, head, lambda _: (scores, z0, z1), None
            )
            exit_layer = jnp.where(new_done, i, exit_layer).astype(jnp.int32)
            return (nd0, nd1, act0, act1, new_done, scores, z0, z1,
                    prune0, prune1, exit_layer)

        return run

    def confidence_threshold(self, layer_index: int) -> float:
        """Layer-dependent early-exit threshold schedule
        (reference lightglue.py:527-533)."""
        threshold = 0.8 + 0.1 * jnp.exp(-4.0 * layer_index / self.conf.n_layers)
        return jnp.clip(threshold, 0.0, 1.0)

    def _forward(self, data: dict) -> dict:
        conf = self.conf
        mask0 = data.get("keypoint_valid0")
        mask1 = data.get("keypoint_valid1")
        desc0, desc1, rot0, rot1 = self._encode(data)
        if conf.dtype == "bf16":
            desc0 = desc0.astype(jnp.bfloat16)
            desc1 = desc1.astype(jnp.bfloat16)
            rot0 = tuple(r.astype(jnp.bfloat16) for r in rot0)
            rot1 = tuple(r.astype(jnp.bfloat16) for r in rot1)
        # Adaptive inference (reference lightglue.py:460-508): STATIC SHAPES —
        # width pruning masks confidently-unmatchable tokens out of the
        # attention KV sets (no FLOP savings, just accuracy-preserving
        # pruning); depth pruning wraps every layer in a batch-wide lax.cond,
        # so once all items are confident the remaining layers are truly
        # skipped at runtime and the exit layer's assignment head scores the
        # matches (reference :541-552 semantics at batch size 1).
        adaptive_depth = conf.depth_confidence > 0
        adaptive_width = conf.width_confidence > 0
        b = desc0.shape[0]
        n0 = desc0.shape[1]
        n1 = desc1.shape[1]
        act0 = mask0 if mask0 is not None else jnp.ones((b, n0), bool)
        act1 = mask1 if mask1 is not None else jnp.ones((b, n1), bool)
        all0, all1 = [], []
        prune0 = jnp.ones((b, n0), jnp.int32)
        prune1 = jnp.ones((b, n1), jnp.int32)
        adaptive = (adaptive_depth or adaptive_width) and not self.is_initializing()
        if not adaptive:
            for i in range(conf.n_layers):
                desc0, desc1 = self.layers[i](desc0, desc1, rot0, rot1, act0, act1)
                if conf.save_layer_outputs:
                    all0.append(desc0)
                    all1.append(desc1)
            desc0 = desc0.astype(jnp.float32)
            desc1 = desc1.astype(jnp.float32)
            scores, sim, z0, z1 = self.assignments[-1](desc0, desc1, mask0, mask1)
            if self.is_initializing():
                # touch every per-layer head so inference-only graphs still
                # create the full param tree (adaptive mode + loss need them)
                for i in range(conf.n_layers - 1):
                    self.confidences[i](desc0, desc1)
                    self.assignments[i](desc0, desc1, mask0, mask1)
        else:
            zscores = jnp.zeros((b, n0, n1), jnp.float32)
            zz0 = jnp.zeros((b, n0), jnp.float32)
            zz1 = jnp.zeros((b, n1), jnp.float32)
            carry = (desc0, desc1, act0, act1, jnp.asarray(False),
                     zscores, zz0, zz1, prune0, prune1,
                     jnp.asarray(conf.n_layers - 1, jnp.int32))
            for i in range(conf.n_layers):
                carry = jax.lax.cond(
                    carry[4], lambda c: c, self._adaptive_layer(i, rot0, rot1,
                                                               mask0, mask1),
                    carry,
                )
            (desc0, desc1, act0, act1, done, scores, z0, z1, prune0, prune1,
             exit_layer) = carry
        matches = filter_matches(scores, conf.filter_threshold)
        pred = {} if not adaptive else {"exit_layer": exit_layer}
        pred |= {
            "log_assignment": scores,
            "matches0": matches["matches0"],
            "matches1": matches["matches1"],
            "matching_scores0": matches["matching_scores0"],
            "matching_scores1": matches["matching_scores1"],
            "matchability0": nn.sigmoid(z0),
            "matchability1": nn.sigmoid(z1),
        }
        if conf.save_layer_outputs and all0:
            pred["desc_layers0"] = jnp.stack(all0, axis=0).astype(jnp.float32)
            pred["desc_layers1"] = jnp.stack(all1, axis=0).astype(jnp.float32)
        if conf.width_confidence > 0:
            pred["prune0"] = prune0
            pred["prune1"] = prune1
        # Invalid slots are unmatched by construction.
        if mask0 is not None:
            pred["matches0"] = jnp.where(mask0, pred["matches0"], -1)
        if mask1 is not None:
            pred["matches1"] = jnp.where(mask1, pred["matches1"], -1)
        return pred

    def loss(self, pred: dict, data: dict):
        """Deep supervision: final-layer NLL + gamma-weighted per-layer NLL
        with the same GT, plus token-confidence BCE
        (reference lightglue.py:560-609)."""
        conf = self.conf
        gt_m0 = data["gt_matches0"]
        gt_m1 = data["gt_matches1"]
        mask0 = data.get("keypoint_valid0")
        mask1 = data.get("keypoint_valid1")
        L = conf.n_layers
        losses = {}
        sum_weight = 0.0
        total = 0.0
        nll_fin = None
        conf_loss = 0.0
        desc_l0 = pred["desc_layers0"]
        desc_l1 = pred["desc_layers1"]
        for i in range(L):
            scores_i, sim_i, z0_i, z1_i = self.assignments[i](
                desc_l0[i], desc_l1[i], mask0, mask1
            )
            nll_i, nllp, nlln = nll_loss_no_bins(
                jnp.where(jnp.isfinite(scores_i), scores_i, -1e9), z0_i, z1_i, gt_m0, gt_m1
            )
            weight = 1.0 if i == L - 1 else conf.loss.gamma ** (L - 1 - i)
            total = total + weight * nll_i
            sum_weight += weight
            if i == L - 1:
                nll_fin = nll_i
                losses["nll_pos"] = nllp
                losses["nll_neg"] = nlln
            else:
                # Token confidence supervision: predict whether this layer's
                # row/col argmax already agrees with the final layer's
                # (reference TokenConfidence.loss detaches the descriptors so
                # confidence gradients never touch the transformer, and
                # compares assignment argmaxes, not -1/-1 match codes).
                c0, c1 = self.confidences[i](
                    jax.lax.stop_gradient(desc_l0[i]),
                    jax.lax.stop_gradient(desc_l1[i]),
                )
                final_scores = pred["log_assignment"]
                correct0 = (
                    jnp.argmax(scores_i, axis=2) == jnp.argmax(final_scores, axis=2)
                ).astype(jnp.float32)
                correct1 = (
                    jnp.argmax(scores_i, axis=1) == jnp.argmax(final_scores, axis=1)
                ).astype(jnp.float32)
                correct0 = jax.lax.stop_gradient(correct0)
                correct1 = jax.lax.stop_gradient(correct1)
                bce0 = -(correct0 * jnp.log(c0 + 1e-8) + (1 - correct0) * jnp.log(1 - c0 + 1e-8))
                bce1 = -(correct1 * jnp.log(c1 + 1e-8) + (1 - correct1) * jnp.log(1 - c1 + 1e-8))
                if mask0 is not None:
                    bce0 = jnp.where(mask0, bce0, 0.0)
                    denom0 = jnp.maximum(mask0.sum(-1), 1)
                else:
                    denom0 = bce0.shape[-1]
                if mask1 is not None:
                    bce1 = jnp.where(mask1, bce1, 0.0)
                    denom1 = jnp.maximum(mask1.sum(-1), 1)
                else:
                    denom1 = bce1.shape[-1]
                conf_loss = conf_loss + bce0.sum(-1) / denom0 + bce1.sum(-1) / denom1
        total = total / sum_weight
        losses["assignment_nll"] = nll_fin
        losses["confidence"] = conf_loss / max(L - 1, 1)
        losses["total"] = total + losses["confidence"]
        metrics = matcher_metrics(pred, data)
        return losses, metrics


__main_model__ = LightGlue


def torch_weight_converter(state_dict: dict, conf: "Config | dict | None" = None) -> dict:
    """Map the official LightGlue checkpoint (torch state_dict of
    github.com/cvg/LightGlue; reference lightglue.py param names) onto this
    module's flax param tree. Input: name -> numpy array.

    Layout notes:
      - torch Linear weight (out, in) -> flax Dense kernel (in, out) = W.T;
      - the official Wqkv unflattens its output as (heads, head_dim, 3) while
        this implementation reshapes as (heads, 3, head_dim): rows of Wqkv
        (and bias entries) are permuted accordingly;
      - LayerNorm: weight -> scale.
    """
    import numpy as np

    cfg = LightGlue.collect_default_conf().merge(conf or {})
    d = int(cfg.descriptor_dim)
    h = int(cfg.num_heads)
    hd = d // h
    L = int(cfg.n_layers)

    def lin(prefix):
        out = {"kernel": np.asarray(state_dict[f"{prefix}.weight"]).T}
        if f"{prefix}.bias" in state_dict:
            out["bias"] = np.asarray(state_dict[f"{prefix}.bias"])
        return out

    def norm(prefix):
        return {
            "scale": np.asarray(state_dict[f"{prefix}.weight"]),
            "bias": np.asarray(state_dict[f"{prefix}.bias"]),
        }

    # permutation of the 3d qkv output rows: ours[o'] = theirs[perm[o']]
    perm = np.empty(3 * d, dtype=np.int64)
    for head in range(h):
        for which in range(3):
            for dim in range(hd):
                ours = head * (3 * hd) + which * hd + dim
                theirs = head * (hd * 3) + dim * 3 + which
                perm[ours] = theirs

    def qkv(prefix):
        w = np.asarray(state_dict[f"{prefix}.weight"])  # (3d, d)
        b = np.asarray(state_dict[f"{prefix}.bias"])
        return {"kernel": w[perm].T, "bias": b[perm]}

    def ffn(prefix):
        return {
            "ffn_0": lin(f"{prefix}.0"),
            "ffn_norm": norm(f"{prefix}.1"),
            "ffn_2": lin(f"{prefix}.3"),
        }

    params: dict = {
        "input_proj": lin("input_proj"),
        "posenc": {"kernel": np.asarray(state_dict["posenc.Wr.weight"]).T},
    }
    for i in range(L):
        t = f"transformers.{i}"
        self_attn = {
            "Wqkv": qkv(f"{t}.self_attn.Wqkv"),
            "out_proj": lin(f"{t}.self_attn.out_proj"),
            **ffn(f"{t}.self_attn.ffn"),
        }
        cross_attn = {
            "to_qk": lin(f"{t}.cross_attn.to_qk"),
            "to_v": lin(f"{t}.cross_attn.to_v"),
            "to_out": lin(f"{t}.cross_attn.to_out"),
            "ffn": ffn(f"{t}.cross_attn.ffn"),
        }
        params[f"transformers_{i}"] = {
            "self_attn": self_attn,
            "cross_attn": cross_attn,
        }
        params[f"log_assignment_{i}"] = {
            "final_proj": lin(f"log_assignment.{i}.final_proj"),
            "matchability": lin(f"log_assignment.{i}.matchability"),
        }
        if i < L - 1:
            params[f"token_confidence_{i}"] = {
                "token": lin(f"token_confidence.{i}.token.0"),
            }
    return {"params": params}
