"""POLD2: point-line detector-descriptor, standalone
(reference: gluefactory/models/extractors/pold2.py:37-671 — backbone +
keypoint heatmap + DF/AF line fields + dense descriptor branch, trained
two-view with CAPS/triplet/NLL descriptor losses and static or *dynamic*
(uncertainty-weighted) multi-task loss weights).

Composition here: the JPLDD trunk (`joint_point_line_extractor`) provides
the shared backbone, heatmap/DF/AF heads, SDDH sparse descriptors, and the
POLD2 line extractor; this model adds what the standalone reference has on
top of that trunk:

- a **dense descriptor branch** (1x1 conv + L2 norm on the full-res trunk
  features) so CAPS window correlation has a map to sample;
- **two-view descriptor supervision** — selectable ``desc_loss``:
  ``caps`` (expected-position window loss around the H-warped keypoint),
  ``triplet`` (hardest-negative margin on GT matches), or ``nll``
  (reference pold2.py desc_loss conf);
- an optionally **learned temperature** (``temperature: learned``,
  reference :64-65), stored as a log-parameter;
- **dynamic loss weighting** (``loss_weights.type: dynamic``, reference
  :66-70): Kendall-style homoscedastic uncertainty — total =
  sum_i exp(-s_i) * L_i + s_i with learnable s_i per task.

Used inside ``two_view_pipeline`` (keys suffixed 0/1); per-view field
losses read ``view{i}.gt_heatmap`` / ``gt_distance_field`` /
``gt_angle_field`` like the JPLDD trainer, descriptor losses read
``H_0to1`` and the pipeline GT ``gt_matches0``."""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...geometry.homography import warp_points
from ..base_model import BaseModel, make_submodel
from ..utils.desc_losses import caps_window_loss, nll_desc_loss, triplet_loss
from .joint_point_line_extractor import optax_sigmoid_bce


class POLD2(BaseModel):
    default_conf: ClassVar[dict] = {
        "backbone": {  # forwarded to the JPLDD trunk
            "name": "extractors.joint_point_line_extractor",
            "max_num_keypoints": 512,
            "detection_threshold": 0.005,
            "nms_radius": 4,
            "refinement_radius": 2,
            "use_angle_field": True,
            "extract_lines": False,
        },
        "has_descriptor": True,
        "descriptor_dim": 128,
        "desc_loss": "caps",  # caps | triplet | nll (reference :63)
        "temperature": 50.0,  # float or "learned" (reference :64-65)
        "caps_window": 8,
        "loss_weights": {
            "type": "static",  # static | dynamic (reference :66-70)
            "kp": 1.0, "df": 1.0, "af": 1.0, "desc": 1.0,
        },
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        self.net = make_submodel(dict(self.conf.backbone))
        if self.conf.has_descriptor:
            self.desc_conv = nn.Conv(
                int(self.conf.descriptor_dim), (1, 1), name="desc_conv")
        if self.conf.temperature == "learned":
            self.log_temp = self.param(
                "log_temp", lambda k: jnp.asarray(jnp.log(50.0)))
        if self.conf.loss_weights.type == "dynamic":
            self.log_vars = self.param(
                "log_vars", nn.initializers.zeros, (4,))

    def _temperature(self):
        if self.conf.temperature == "learned":
            return jnp.exp(self.log_temp)
        return float(self.conf.temperature)

    def _forward(self, data: dict) -> dict:
        pred = self.net(data)
        if self.conf.has_descriptor:
            # the JPLDD forward exposes its trunk features; reuse them
            # rather than paying a second backbone pass per view
            feats = pred.pop("backbone_features", None)
            if feats is None:
                feats = self.net.backbone(data["image"])
            dmap = self.desc_conv(feats)
            dmap = dmap / jnp.maximum(
                jnp.linalg.norm(dmap, axis=-1, keepdims=True), 1e-8)
            pred["descriptors_dense"] = dmap
            from ...ops.interpolate import bilinear_sample

            d = bilinear_sample(dmap, pred["keypoints"] - 0.5)
            pred["descriptors"] = d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        return pred

    def _field_losses(self, pred, data, suffix: str):
        """Per-view heatmap/DF/AF losses, reusing the JPLDD loss by feeding
        it the suffix-stripped tensors."""
        view = data.get(f"view{suffix}", {})
        sub_pred = {
            k[: -len(suffix)] if k.endswith(suffix) else k: v
            for k, v in pred.items() if k.endswith(suffix)
        }
        losses, _ = self.net.loss(sub_pred, view)
        return losses

    def loss(self, pred, data):
        lw = self.conf.loss_weights
        b = data["view0"]["image"].shape[0]
        zeros = jnp.zeros((b,))
        losses = {}

        f0 = self._field_losses(pred, data, "0")
        f1 = self._field_losses(pred, data, "1")
        kp = f0.get("heatmap", zeros) + f1.get("heatmap", zeros)
        df = f0.get("df", zeros) + f1.get("df", zeros)
        af = f0.get("af", zeros) + f1.get("af", zeros)
        losses.update({"kp": kp, "df": df, "af": af})

        desc = zeros
        if self.conf.has_descriptor:
            kind = self.conf.desc_loss
            valid0 = pred.get("keypoint_valid0")
            if kind == "caps" and "H_0to1" in data:
                kp0_in1 = warp_points(pred["keypoints0"], data["H_0to1"])
                h1, w1 = data["view1"]["image"].shape[1:3]
                inb = (
                    (kp0_in1[..., 0] >= 0) & (kp0_in1[..., 0] < w1)
                    & (kp0_in1[..., 1] >= 0) & (kp0_in1[..., 1] < h1))
                desc = caps_window_loss(
                    # bilinear_sample uses index coords; keypoints are in
                    # the +0.5 pixel-center convention
                    pred["descriptors0"], kp0_in1 - 0.5,
                    pred["descriptors_dense1"],
                    window=int(self.conf.caps_window),
                    temperature=1.0 / self._temperature(),
                    valid0=(valid0 & inb) if valid0 is not None else inb,
                )
            elif kind == "triplet" and "gt_matches0" in pred:
                desc = triplet_loss(
                    pred["descriptors0"], pred["descriptors1"],
                    pred["gt_matches0"], valid0=valid0)
            elif kind == "nll" and "gt_matches0" in pred:
                desc = nll_desc_loss(
                    pred["descriptors0"], pred["descriptors1"],
                    pred["gt_matches0"],
                    temperature=1.0 / self._temperature(),
                    valid0=valid0)
            losses["desc"] = desc

        # which tasks are actually supervised is static (key presence)
        v0 = data.get("view0", {})
        active = [
            "gt_heatmap" in v0,
            "gt_distance_field" in v0,
            bool(self.conf.backbone.get("use_angle_field", False))
            and "gt_angle_field" in v0,
            # the desc term is active only when its inputs exist, else it
            # is a constant 0 and would drag its dynamic log-variance down
            bool(self.conf.has_descriptor) and (
                ("H_0to1" in data) if self.conf.desc_loss == "caps"
                else ("gt_matches0" in pred)
            ),
        ]
        terms = [losses["kp"], losses["df"], losses["af"], desc]
        if lw.type == "dynamic":
            # Kendall uncertainty weighting over the ACTIVE terms only — an
            # unsupervised term (constant 0) would otherwise drive its
            # log-variance to -inf and the total with it
            total = zeros
            for i, (t, on) in enumerate(zip(terms, active)):
                if on:
                    total = total + jnp.exp(-self.log_vars[i]) * t \
                        + self.log_vars[i]
            losses["log_vars_sum"] = jnp.broadcast_to(
                self.log_vars.sum(), (b,))
        else:
            w = [float(lw.kp), float(lw.df), float(lw.af), float(lw.desc)]
            total = sum(
                wi * t for wi, t, on in zip(w, terms, active) if on)
            total = total + zeros
        losses["total"] = total
        return losses, {}


__main_model__ = POLD2
