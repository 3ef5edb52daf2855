"""JPLDD: joint point + line detector-descriptor — the fork's flagship
trainable extractor (reference:
gluefactory/models/extractors/joint_point_line_extractor.py:46-816).

One shared ALIKED-style encoder feeds four heads:
  - SMH keypoint heatmap -> NMS -> top-k -> soft-argmax keypoints;
  - SDDH deformable descriptors at the keypoints;
  - line distance-field (DF) decoder, trained on the normalized field
    df_norm = 1 - clip(df, 0, r)/r (the reference trains -log(df/r)-style
    normalization, :301-305; we use the bounded variant for stability and
    denormalize before line extraction);
  - optional angle-field (AF) decoder (line orientation mod pi).

At inference the keypoints + denormalized DF(+AF) feed the POLD2 candidate
line extractor (models/lines/pold2_extractor.py) — fully batched, no host
loops (reference runs it per image, :307-532).

Training losses (reference :534-780): weighted-BCE / focal heatmap loss, L1
on the normalized DF, masked angular L1 on AF, optional descriptor
distillation (cosine) against a teacher (e.g. extractors.aliked)."""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.nms import select_top_k_keypoints, simple_nms, soft_argmax_refinement
from ..base_model import BaseModel, make_submodel
from .aliked import ConvBlock, ResBlock, SDDH


class JPLDD(BaseModel):
    default_conf: ClassVar[dict] = {
        "channels": [16, 32, 64, 128],
        "dim": 128,
        # trunk selector (reference builds the trunk from backbone_encoder
        # cfgs, :135-143): "inline" = the in-class ALIKED-style trunk below;
        # anything else is resolved by models/backbones/backbone_encoder.py
        # (e.g. {"name": "vgg_unet", "tiny": true} or {"name": "dinov2"})
        # and adapted to (H, W, dim) with a 1x1 projection.
        "backbone": {"name": "inline"},
        # pin the trunk's expected input channels so a checkpoint trained on
        # one engine (3-ch synthetic shapes) fine-tunes on another (1-ch
        # homographies): gray inputs are tiled / color averaged to match.
        # None = accept whatever the data provides (shape inferred at init).
        "input_channels": None,
        "max_num_keypoints": 1024,
        "detection_threshold": 0.01,
        "nms_radius": 2,
        "refinement_radius": 2,
        "line_neighborhood": 5.0,  # DF normalization radius (reference :301)
        "use_angle_field": True,
        "extract_lines": False,  # run POLD2 extraction in forward (eval)
        "line_extractor": {"name": "lines.pold2_extractor"},
        # with extract_lines: also emit line_desc_samples (B, L, S, D) — the
        # SDDH descriptor head evaluated at S points along each extracted
        # line, consumed directly by matchers.wunsch_line_matcher (the
        # phase-B-trained keypoint descriptors double as line descriptors)
        "line_desc_samples": 0,
        "timeit": False,
        "loss": {
            "heatmap": "weighted_bce",  # weighted_bce | focal
            "focal_gamma": 2.0,
            "kp_weight": 1.0,
            "df_weight": 1.0,
            "af_weight": 1.0,
            "desc_weight": 1.0,
            "pos_weight": 200.0,  # positive-pixel upweight for sparse heatmaps
            # two-view SDDH descriptor training (phase B, used inside
            # two_view_pipeline on the homography engine with the trunk
            # frozen via train.lr_scaling): keypoint-level InfoNCE over
            # mutually-consistent detected correspondences — the in-repo
            # replacement for the reference's ALIKED-teacher distillation
            # (reference joint_point_line_extractor.py:534-780)
            "desc_nll_weight": 0.0,
            "desc_nll_temp": 0.1,
            "desc_match_th": 3.0,
        },
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        c1, c2, c3, c4 = self.conf.channels
        dim = self.conf.dim
        if self.conf.backbone.get("name", "inline") != "inline":
            from ..backbones.backbone_encoder import make_backbone

            self.ext_backbone = make_backbone(dict(self.conf.backbone))
            self.backbone_adapter = nn.Conv(
                dim, (1, 1), name="backbone_adapter"
            )
        self.block1 = ConvBlock(c1, name="block1")
        self.block2 = ConvBlock(c2, stride=2, name="block2")
        self.block3 = ResBlock(c3, deformable=True, name="block3")
        self.block4 = ResBlock(c4, deformable=True, name="block4")
        self.conv1 = nn.Conv(dim // 4, (1, 1), name="agg_conv1")
        self.conv2 = nn.Conv(dim // 4, (1, 1), name="agg_conv2")
        self.conv3 = nn.Conv(dim // 4, (1, 1), name="agg_conv3")
        self.conv4 = nn.Conv(dim // 4, (1, 1), name="agg_conv4")
        self.kp_head = nn.Sequential(
            [nn.Conv(8, (1, 1), name="kp1"), nn.selu,
             nn.Conv(4, (3, 3), padding="SAME", name="kp2"), nn.selu,
             nn.Conv(1, (3, 3), padding="SAME", name="kp3")]
        )
        self.df_head = nn.Sequential(
            [nn.Conv(16, (3, 3), padding="SAME", name="df1"), nn.selu,
             nn.Conv(8, (3, 3), padding="SAME", name="df2"), nn.selu,
             nn.Conv(1, (3, 3), padding="SAME", name="df3")]
        )
        if self.conf.use_angle_field:
            # predict (sin 2a, cos 2a) to avoid the pi wrap
            self.af_head = nn.Sequential(
                [nn.Conv(16, (3, 3), padding="SAME", name="af1"), nn.selu,
                 nn.Conv(2, (3, 3), padding="SAME", name="af3")]
            )
        self.desc_head = SDDH(dim, k=3, M=16, name="desc_head")
        if self.conf.extract_lines:
            self.line_extractor = make_submodel(self.conf.line_extractor)

    def backbone(self, image):
        ic = self.conf.input_channels
        if ic and image.shape[-1] != ic:
            if image.shape[-1] == 1:
                image = jnp.repeat(image, ic, axis=-1)
            else:
                image = jnp.repeat(
                    jnp.mean(image, axis=-1, keepdims=True), ic, axis=-1
                )
        if self.conf.backbone.get("name", "inline") != "inline":
            feats = self.ext_backbone({"image": image})["features"]
            b, h, w = image.shape[0], image.shape[1], image.shape[2]
            if feats.shape[1:3] != (h, w):  # e.g. stride-14 DINOv2 grid
                feats = jax.image.resize(
                    feats, (b, h, w, feats.shape[-1]), "bilinear"
                )
            return nn.selu(self.backbone_adapter(feats))
        x1 = self.block1(image)
        x2 = self.block2(x1)
        x3 = self.block3(nn.avg_pool(x2, (2, 2), strides=(2, 2)))
        x4 = self.block4(nn.avg_pool(x3, (2, 2), strides=(2, 2)))
        h, w = image.shape[1:3]
        f1 = self.conv1(x1)
        f2 = jax.image.resize(self.conv2(x2), (x2.shape[0], h, w, f1.shape[-1]), "bilinear")
        f3 = jax.image.resize(self.conv3(x3), (x3.shape[0], h, w, f1.shape[-1]), "bilinear")
        f4 = jax.image.resize(self.conv4(x4), (x4.shape[0], h, w, f1.shape[-1]), "bilinear")
        return nn.selu(jnp.concatenate([f1, f2, f3, f4], axis=-1))

    def denormalize_df(self, df_norm):
        """normalized [0,1] (1 = on line) -> pixel distances."""
        r = self.conf.line_neighborhood
        return (1.0 - jnp.clip(df_norm, 0.0, 1.0)) * r

    def normalize_df(self, df):
        r = self.conf.line_neighborhood
        return 1.0 - jnp.clip(df, 0.0, r) / r

    def _forward(self, data: dict) -> dict:
        conf = self.conf
        features = self.backbone(data["image"])
        heat_logits = self.kp_head(features)[..., 0]
        heatmap = nn.sigmoid(heat_logits)
        df_norm = nn.sigmoid(self.df_head(features)[..., 0])
        pred = {
            "heatmap": heatmap,
            "heatmap_logits": heat_logits,
            "distance_field_norm": df_norm,
            "distance_field": self.denormalize_df(df_norm),
            # trunk features for composition (POLD2 dense descriptor branch)
            "backbone_features": features,
        }
        if conf.use_angle_field:
            sc = self.af_head(features)
            angle = 0.5 * jnp.arctan2(sc[..., 0], sc[..., 1])  # (-pi/2, pi/2]
            pred["angle_field"] = angle % jnp.pi
            pred["angle_field_sincos"] = sc
        nmsed = simple_nms(heatmap, int(conf.nms_radius))
        keypoints, scores, valid = select_top_k_keypoints(
            nmsed, k=int(conf.max_num_keypoints),
            threshold=float(conf.detection_threshold), border=2,
            image_size=data.get("image_size"),
        )
        if conf.refinement_radius > 0:
            keypoints = soft_argmax_refinement(
                keypoints, heatmap, int(conf.refinement_radius)
            )
        desc = self.desc_head(features, keypoints)
        pred.update(
            {
                "keypoints": keypoints + 0.5,
                "keypoint_scores": scores,
                "keypoint_valid": valid,
                "descriptors": desc,
            }
        )
        if conf.extract_lines:
            line_pred = self.line_extractor(
                {
                    "keypoints": pred["keypoints"],
                    "keypoint_valid": valid,
                    "distance_field": pred["distance_field"],
                    **(
                        {"angle_field": pred["angle_field"]}
                        if conf.use_angle_field else {}
                    ),
                }
            )
            pred.update(line_pred)
            s = int(conf.line_desc_samples)
            if s > 0:
                lines = pred["lines"]  # (B, L, 2, 2)
                b, nl = lines.shape[:2]
                t = jnp.linspace(0.0, 1.0, s)[None, None, :, None]
                pts = lines[:, :, None, 0] + (
                    lines[:, :, 1] - lines[:, :, 0])[:, :, None] * t
                d = self.desc_head(features, pts.reshape(b, nl * s, 2))
                pred["line_desc_samples"] = d.reshape(b, nl, s, -1)
        return pred

    def loss(self, pred: dict, data: dict):
        conf = self.conf.loss
        losses = {}
        heat = pred.get("heatmap", pred.get("heatmap0"))
        b = heat.shape[0]
        total = jnp.zeros((b,))
        # ---- two-view descriptor InfoNCE (suffixed keys from the pipeline)
        if (
            float(conf.get("desc_nll_weight", 0.0)) > 0
            and "H_0to1" in data and "keypoints0" in pred
        ):
            from ..utils.desc_losses import mutual_detected_matches, nll_desc_loss

            kp0 = pred["keypoints0"] - 0.5
            kp1 = pred["keypoints1"] - 0.5
            v0, v1 = pred["keypoint_valid0"], pred["keypoint_valid1"]
            m0, m1 = mutual_detected_matches(
                kp0, kp1, v0, v1, data["H_0to1"],
                th=float(conf.desc_match_th),
            )
            t = float(conf.desc_nll_temp)
            nll = 0.5 * (
                nll_desc_loss(pred["descriptors0"], pred["descriptors1"], m0,
                              temperature=t, valid0=v0)
                + nll_desc_loss(pred["descriptors1"], pred["descriptors0"], m1,
                                temperature=t, valid0=v1)
            )
            losses["desc_nll"] = nll
            total = total + float(conf.desc_nll_weight) * nll
        # ---- keypoint heatmap --------------------------------------------
        if "gt_heatmap" in data:
            gt = data["gt_heatmap"]
            logits = pred["heatmap_logits"]
            pos_w = conf.pos_weight
            bce = optax_sigmoid_bce(logits, gt)
            if self.conf.loss.heatmap == "focal":
                p = nn.sigmoid(logits)
                pt = jnp.where(gt > 0.5, p, 1 - p)
                bce = bce * (1 - pt) ** conf.focal_gamma
            w = jnp.where(gt > 0.5, pos_w, 1.0)
            kp_loss = jnp.sum(bce * w, axis=(1, 2)) / jnp.sum(w, axis=(1, 2))
            losses["heatmap"] = kp_loss
            total = total + conf.kp_weight * kp_loss
        # ---- distance field ----------------------------------------------
        if "gt_distance_field" in data:
            gt_norm = self.normalize_df(data["gt_distance_field"])
            df_loss = jnp.mean(jnp.abs(pred["distance_field_norm"] - gt_norm), axis=(1, 2))
            losses["df"] = df_loss
            total = total + conf.df_weight * df_loss
        # ---- angle field (only near lines) --------------------------------
        if self.conf.use_angle_field and "gt_angle_field" in data:
            near = data["gt_distance_field"] < self.conf.line_neighborhood
            gt_a = data["gt_angle_field"]
            target = jnp.stack([jnp.sin(2 * gt_a), jnp.cos(2 * gt_a)], axis=-1)
            af_err = jnp.sum(jnp.abs(pred["angle_field_sincos"] - target), axis=-1)
            af_loss = jnp.sum(af_err * near, axis=(1, 2)) / jnp.maximum(
                jnp.sum(near, axis=(1, 2)), 1.0
            )
            losses["af"] = af_loss
            total = total + conf.af_weight * af_loss
        # ---- descriptor distillation --------------------------------------
        if "ref_descriptors" in data:
            sim = jnp.sum(pred["descriptors"] * data["ref_descriptors"], axis=-1)
            mask = pred["keypoint_valid"].astype(sim.dtype)
            d_loss = jnp.sum((1.0 - sim) * mask, axis=-1) / jnp.maximum(mask.sum(-1), 1.0)
            losses["desc_distill"] = d_loss
            total = total + conf.desc_weight * d_loss
        losses["total"] = total
        return losses, {}


def optax_sigmoid_bce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


__main_model__ = JPLDD
