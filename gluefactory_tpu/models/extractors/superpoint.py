"""SuperPoint keypoint detector + descriptor
(reference: gluefactory_nonfree/superpoint.py:152-356 and
gluefactory/models/extractors/superpoint.py:117-501).

TPU-first re-design:
  - NHWC convolutions (XLA/TPU native layout) instead of torch NCHW;
  - the 65-channel cell softmax is reshaped to a full-resolution heatmap with
    a single transpose/reshape (no pixel-shuffle op needed);
  - iterative max-pool NMS runs as reduce_window on the VPU
    (ops/nms.simple_nms);
  - keypoint selection is a single static top-k + validity mask — the
    reference's ``force_num_keypoints`` random-padding mode
    (superpoint.py:304-317) is the *only* mode here, so the whole extractor
    is one fused XLA program with fixed shapes;
  - descriptor sampling is a batched bilinear gather (ops/interpolate).

Weight import from the official MagicLeap checkpoint is supported through
``torch_weight_converter`` (layer-name map + NCHW->HWIO transposition).
"""

from __future__ import annotations

from typing import ClassVar

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.interpolate import cell_logits_to_heatmap, sample_descriptors
from ...ops.nms import (
    com_refinement,
    select_top_k_keypoints,
    simple_nms,
    soft_argmax_refinement,
)
from ..base_model import BaseModel


class ChannelAffine(nn.Module):
    """Per-channel scale+bias — holds an inference-mode BatchNorm exactly
    (the rpautrat SuperPoint-open places BN after every ReLU; folding it
    into neighboring convs is inexact at SAME-padding borders, so imported
    checkpoints keep it as an explicit affine that XLA fuses for free)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class VGGBackbone(nn.Module):
    """4-stage VGG encoder, stride 8 (reference superpoint.py:170-200)."""

    channels: tuple = (64, 64, 64, 64, 128, 128, 128, 128)
    dtype: str = "float32"
    post_relu_affine: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cdt = jnp.bfloat16 if self.dtype == "bf16" else jnp.float32
        pool_after = {1, 3, 5}
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{i}", dtype=cdt)(x)
            x = nn.relu(x)
            if self.post_relu_affine:
                x = ChannelAffine(ch, name=f"affine{i}")(x)
            if i in pool_after:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class SuperPoint(BaseModel):
    default_conf: ClassVar[dict] = {
        "has_detector": True,
        "has_descriptor": True,
        "descriptor_dim": 256,
        "max_num_keypoints": 1024,
        "nms_radius": 4,
        "detection_threshold": 0.005,
        "remove_borders": 4,
        "refinement_radius": 0,
        # 'com' = center-of-mass window refinement: exact sub-pixel readout
        # of a soft-bilinear-label-trained heatmap (cell_labels=soft);
        # 'softargmax' = legacy low-temperature softmax (≈ hard argmax)
        "refinement_mode": "softargmax",
        "dense_outputs": False,
        "training_outputs": False,  # keep cell logits + dense descs for loss()
        "desc_sampling": "center",  # 'torch' = exact reference grid mapping
        # (kp/s - 0.5); required for parity with imported official weights
        "post_relu_affine": False,  # explicit per-channel affines after each
        # ReLU (holds the SuperPoint-open checkpoints' BatchNorms exactly)
        "channels": [64, 64, 64, 64, 128, 128, 128, 128],
        "head_channels": 256,
        "dtype": "float32",  # bf16 runs the CNN in bfloat16 (params stay f32)
        "weights": None,
        "loss": {
            # detector: 65-way cell cross-entropy vs exact corner GT
            # (SuperPoint/MagicPoint recipe; the reference imports pretrained
            # weights instead — gluefactory has no SP training path at all,
            # this build adds one so quality is reachable with zero egress)
            "cell_pos_weight": 32.0,  # class-balance: corner cells are rare
            # 'hard' = integer within-cell class (MagicPoint recipe);
            # 'soft' = bilinear label mass over the GT corner's neighboring
            # pixels, so the 65-way softmax itself encodes SUB-PIXEL
            # position (read back exactly by refinement_mode=com)
            "cell_labels": "hard",
            # descriptor: dense cell-pair hinge loss under H_0to1
            "desc_weight": 1.0,
            "desc_lambda_d": 250.0,
            "desc_margin_pos": 1.0,
            "desc_margin_neg": 0.2,
            "desc_cell_dist": 8.0,  # px distance making a cell pair positive
            # keypoint-level InfoNCE over detected correspondences (both
            # directions): far finer-grained than the 8x8 cell hinge — two
            # detections a few px apart become in-batch negatives of each
            # other, which the cell hinge cannot express
            # (reference geometry/desc_losses.py:90-170 nll recipe)
            "desc_nll_weight": 0.0,
            "desc_nll_temp": 0.1,
            "desc_match_th": 3.0,  # px radius for a GT detection pair
            # CAPS expected-position window loss: correlate each detection's
            # descriptor with the OTHER view's dense map around the warped
            # position; trains sub-cell descriptor discrimination
            # (reference desc_losses.py:180-286)
            "desc_caps_weight": 0.0,
            "desc_caps_window": 24.0,  # px (full-res) window extent
            "desc_caps_temp": 0.07,
            # sub-pixel localization: soft-argmax of the heatmap around each
            # detection should land on the matched GT corner (reference
            # geometry/kp_losses.py:soft_argmax_loss:60). radius=2 matches
            # the inference-time ``refinement_radius`` used by the eval
            # configs, so training optimizes the refined output directly.
            "loc_weight": 0.0,
            "loc_radius": 2,
            "loc_max_dist": 4.0,
            # 'gt' anchors the soft-argmax windows at the true corners
            # (clean signal even when most detections are texture points);
            # 'detections' is the legacy stage-0b behavior, which plateaus
            # at the coincidental-nearest-GT noise floor when detection
            # precision vs the drawn corners is low
            "loc_anchor": "gt",
            # ALIKE-style peakiness around GT corners (kp_losses.py:117)
            "peaky_weight": 0.0,
            "peaky_radius": 2,
        },
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        cdt = jnp.bfloat16 if self.conf.dtype == "bf16" else jnp.float32
        self.backbone = VGGBackbone(channels=tuple(self.conf.channels),
                                    dtype=self.conf.dtype,
                                    post_relu_affine=self.conf.post_relu_affine)
        head = self.conf.head_channels
        if self.conf.has_detector:
            self.convPa = nn.Conv(head, (3, 3), padding="SAME", name="convPa", dtype=cdt)
            self.convPb = nn.Conv(65, (1, 1), name="convPb", dtype=cdt)
        if self.conf.has_descriptor:
            self.convDa = nn.Conv(head, (3, 3), padding="SAME", name="convDa", dtype=cdt)
            self.convDb = nn.Conv(self.conf.descriptor_dim, (1, 1), name="convDb",
                                  dtype=cdt)
        if self.conf.post_relu_affine:
            if self.conf.has_detector:
                self.affinePa = ChannelAffine(head, name="affinePa")
            if self.conf.has_descriptor:
                self.affineDa = ChannelAffine(head, name="affineDa")

    def _forward(self, data: dict) -> dict:
        image = data["image"]
        if image.shape[-1] == 3:
            # RGB -> grayscale with the cv2/ITU-R 601 weights.
            scale = jnp.array([0.299, 0.587, 0.114], dtype=image.dtype)
            image = jnp.sum(image * scale, axis=-1, keepdims=True)
        features = self.backbone(image)
        b, hc, wc, _ = features.shape
        pred = {}

        if self.conf.has_detector:
            pa = nn.relu(self.convPa(features))
            if self.conf.post_relu_affine:
                pa = self.affinePa(pa)
            logits = self.convPb(pa)  # (B, H/8, W/8, 65)
            logits = logits.astype(jnp.float32)
            heat_raw = cell_logits_to_heatmap(logits)
            heat = simple_nms(heat_raw, self.conf.nms_radius)
            image_size = data.get("image_size")
            keypoints, scores, valid = select_top_k_keypoints(
                heat,
                k=self.conf.max_num_keypoints,
                threshold=self.conf.detection_threshold,
                border=self.conf.remove_borders,
                image_size=image_size,
            )
            if self.conf.refinement_radius > 0:
                # refine on the PRE-NMS heatmap: NMS zeroes the neighborhood
                # the refinement window needs
                refine = (
                    com_refinement
                    if self.conf.get("refinement_mode", "softargmax") == "com"
                    else soft_argmax_refinement
                )
                keypoints = refine(
                    keypoints, heat_raw, self.conf.refinement_radius
                )
            pred.update(
                {
                    "keypoints": keypoints + 0.5,  # pixel-center convention
                    "keypoint_scores": scores,
                    "keypoint_valid": valid,
                }
            )
            if self.conf.dense_outputs:
                pred["heatmap"] = heat
            if self.conf.training_outputs:
                pred["cell_logits"] = logits

        if self.conf.has_descriptor:
            da = nn.relu(self.convDa(features))
            if self.conf.post_relu_affine:
                da = self.affineDa(da)
            dense = self.convDb(da).astype(jnp.float32)
            dense = dense / (jnp.linalg.norm(dense, axis=-1, keepdims=True) + 1e-8)
            if self.conf.has_detector:
                pred["descriptors"] = sample_descriptors(
                    dense, pred["keypoints"] - 0.5, stride=8,
                    mode=self.conf.desc_sampling,
                )
            if self.conf.dense_outputs or self.conf.training_outputs or not self.conf.has_detector:
                pred["descriptors_dense"] = dense
        return pred

    def loss(self, pred: dict, data: dict):
        """Train from exact keypoint GT + a pair homography (both supplied by
        the on-device engine, datasets/homographies_ondevice.py):
          - 65-way cell softmax cross-entropy per view (MagicPoint recipe),
          - dense descriptor hinge loss over corresponding 8x8 cells under
            ``H_0to1`` (SuperPoint paper eq. 4-6).
        Requires conf.training_outputs=True."""
        import optax

        from ...geometry.homography import warp_points

        conf = self.conf.loss
        losses: dict = {}
        total = 0.0
        metrics: dict = {}
        for i in "01":
            logits = pred.get(f"cell_logits{i}", pred.get("cell_logits"))
            if logits is None:
                raise NotImplementedError(
                    "SuperPoint.loss needs conf.training_outputs=true"
                )
            b, hc, wc, _ = logits.shape
            kp = data[f"gt_keypoints{i}"]
            valid = data[f"gt_keypoint_valid{i}"]
            if conf.get("cell_labels", "hard") == "soft":
                target = _cell_labels_soft(kp, valid, hc, wc)
                logp = jax.nn.log_softmax(logits.reshape(b, -1, 65), axis=-1)
                ce = -jnp.sum(target * logp, axis=-1)
                pos_mass = 1.0 - target[..., 64]
                w = 1.0 + (float(conf.cell_pos_weight) - 1.0) * pos_mass
            else:
                labels = _cell_labels(kp, valid, hc, wc)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits.reshape(b, -1, 65), labels.reshape(b, -1)
                )
                w = jnp.where(
                    labels.reshape(b, -1) < 64, float(conf.cell_pos_weight), 1.0
                )
            det = jnp.sum(ce * w, axis=-1) / jnp.sum(w, axis=-1)
            losses[f"det_ce{i}"] = det
            total = total + det / 2.0
            # detector quality vs GT (3 px): fraction of predicted keypoints
            # near a GT corner, and of GT corners recovered
            pk = pred[f"keypoints{i}"]
            pv = pred[f"keypoint_valid{i}"]
            d2 = jnp.sum((pk[:, :, None, :] - kp[:, None, :, :]) ** 2, -1)
            big = 1e12
            d2 = jnp.where(valid[:, None, :], d2, big)
            near_gt = (jnp.min(d2, axis=2) < 9.0) & pv
            prec = near_gt.sum(-1) / jnp.maximum(pv.sum(-1), 1)
            d2p = jnp.where(pv[:, :, None], d2, big)
            rec = ((jnp.min(d2p, axis=1) < 9.0) & valid).sum(-1) / jnp.maximum(
                valid.sum(-1), 1
            )
            metrics[f"kp_precision{i}"] = prec
            metrics[f"kp_recall{i}"] = rec

            if float(conf.loc_weight) > 0 or float(conf.peaky_weight) > 0:
                from ...geometry.kp_losses import (
                    gt_anchored_loc_loss,
                    peaky_loss,
                    soft_argmax_loc_loss,
                )

                # full-res pre-NMS heatmap, recomputed from the logits (cheap:
                # softmax + reshape; avoids storing it in training outputs)
                heat_raw = cell_logits_to_heatmap(logits)
                if float(conf.loc_weight) > 0:
                    if conf.get("loc_anchor", "gt") == "gt":
                        # heatmap-frame target is kp - 0.5: the engine GT is
                        # in the drawn/warped coordinate frame and forward()
                        # adds the +0.5 pixel-center shift to its outputs —
                        # stage-0b (trained with this target) measures ~zero
                        # output bias vs GT, confirming the convention
                        loc = gt_anchored_loc_loss(
                            heat_raw, kp - 0.5, valid,
                            radius=int(conf.loc_radius),
                            mode=self.conf.get("refinement_mode", "softargmax"),
                        )
                    else:
                        # legacy: anchor at detections, pull toward the
                        # nearest GT corner within loc_max_dist
                        nearest = jnp.argmin(d2, axis=2)  # (B, K)
                        gt_near = jnp.take_along_axis(
                            kp, nearest[..., None], axis=1)
                        gt_ok = jnp.take_along_axis(valid, nearest, axis=1) & pv
                        loc = soft_argmax_loc_loss(
                            heat_raw,
                            pk - 0.5,
                            gt_near - 0.5,
                            gt_ok,
                            radius=int(conf.loc_radius),
                            max_dist=float(conf.loc_max_dist),
                        )
                    losses[f"kp_loc{i}"] = loc
                    total = total + float(conf.loc_weight) * loc / 2.0
                if float(conf.peaky_weight) > 0:
                    pk_loss = peaky_loss(
                        heat_raw, kp - 0.5, valid,
                        radius=int(conf.peaky_radius),
                    )
                    losses[f"kp_peaky{i}"] = pk_loss
                    total = total + float(conf.peaky_weight) * pk_loss / 2.0

        nll_w = float(conf.get("desc_nll_weight", 0.0))
        caps_w = float(conf.get("desc_caps_weight", 0.0))
        if self.conf.has_descriptor and self.conf.has_detector and (
            nll_w > 0 or caps_w > 0
        ):
            from ...models.utils.desc_losses import (
                caps_window_loss,
                mutual_detected_matches,
                nll_desc_loss,
            )

            H = data["H_0to1"]
            Hinv = jnp.linalg.inv(H)
            # index-coordinate detections (strip the +0.5 pixel-center shift)
            kp0 = pred["keypoints0"] - 0.5
            kp1 = pred["keypoints1"] - 0.5
            v0 = pred["keypoint_valid0"]
            v1 = pred["keypoint_valid1"]
            d0s = pred["descriptors0"]
            d1s = pred["descriptors1"]
            wkp0 = warp_points(kp0, H)
            wkp1 = warp_points(kp1, Hinv)
            b = kp0.shape[0]
            hc1, wc1 = pred["descriptors_dense1"].shape[1:3]
            s1 = jnp.array([wc1 * 8.0, hc1 * 8.0], jnp.float32)
            in1 = (wkp0 >= 0.0).all(-1) & (wkp0 <= s1 - 1.0).all(-1)
            hc0, wc0 = pred["descriptors_dense0"].shape[1:3]
            s0 = jnp.array([wc0 * 8.0, hc0 * 8.0], jnp.float32)
            in0 = (wkp1 >= 0.0).all(-1) & (wkp1 <= s0 - 1.0).all(-1)
            if nll_w > 0:
                m0, m1 = mutual_detected_matches(
                    kp0, kp1, v0, v1, H, th=float(conf.desc_match_th)
                )
                t = float(conf.desc_nll_temp)
                nll = 0.5 * (
                    nll_desc_loss(d0s, d1s, m0, temperature=t, valid0=v0)
                    + nll_desc_loss(d1s, d0s, m1, temperature=t, valid0=v1)
                )
                losses["desc_nll"] = nll
                total = total + nll_w * nll
                metrics["desc_nll_pairs"] = (m0 >= 0).sum(-1).astype(jnp.float32)
            if caps_w > 0:
                # dense maps are stride-8 with cell centers at index 3.5+8i
                caps = 0.5 * (
                    caps_window_loss(
                        d0s, (wkp0 - 3.5) / 8.0, pred["descriptors_dense1"],
                        window=float(conf.desc_caps_window) / 8.0,
                        temperature=float(conf.desc_caps_temp),
                        valid0=v0 & in1,
                    )
                    + caps_window_loss(
                        d1s, (wkp1 - 3.5) / 8.0, pred["descriptors_dense0"],
                        window=float(conf.desc_caps_window) / 8.0,
                        temperature=float(conf.desc_caps_temp),
                        valid0=v1 & in0,
                    )
                )
                losses["desc_caps"] = caps
                total = total + caps_w * caps

        if self.conf.has_descriptor and float(conf.desc_weight) > 0:
            d0 = pred["descriptors_dense0"]
            d1 = pred["descriptors_dense1"]
            b, hc, wc, c = d0.shape
            ys, xs = jnp.mgrid[0:hc, 0:wc]
            centers = (
                jnp.stack([xs, ys], -1).reshape(1, -1, 2).astype(jnp.float32) * 8.0
                + 3.5
            )
            H = data["H_0to1"]
            wc0 = warp_points(jnp.broadcast_to(centers, (b, hc * wc, 2)), H)
            s_img = jnp.asarray(
                data["view1"]["image_size"] if "view1" in data else [wc * 8, hc * 8],
                jnp.float32,
            )
            if s_img.ndim == 2:
                s_img = s_img[:, None, :]
            in1 = (wc0 >= 0.0).all(-1) & (wc0 <= s_img - 1.0).all(-1)
            dist2 = jnp.sum((wc0[:, :, None, :] - centers[:, None, :, :]) ** 2, -1)
            pos = dist2 <= float(conf.desc_cell_dist) ** 2
            dot = jnp.einsum("bnc,bmc->bnm", d0.reshape(b, -1, c), d1.reshape(b, -1, c))
            hinge = jnp.where(
                pos,
                float(conf.desc_lambda_d)
                * jnp.maximum(0.0, float(conf.desc_margin_pos) - dot),
                jnp.maximum(0.0, dot - float(conf.desc_margin_neg)),
            )
            hinge = hinge * in1[:, :, None]
            desc = jnp.mean(hinge, axis=(1, 2))
            losses["desc_hinge"] = desc
            total = total + float(conf.desc_weight) * desc
            # descriptor health: mean positive vs negative similarity
            pos_f = pos & in1[:, :, None]
            metrics["desc_pos_sim"] = jnp.sum(dot * pos_f, (1, 2)) / jnp.maximum(
                pos_f.sum((1, 2)), 1
            )
            neg_f = (~pos) & in1[:, :, None]
            metrics["desc_neg_sim"] = jnp.sum(dot * neg_f, (1, 2)) / jnp.maximum(
                neg_f.sum((1, 2)), 1
            )
        losses["total"] = total
        return losses, metrics


def _cell_labels(kp: jnp.ndarray, valid: jnp.ndarray, hc: int, wc: int) -> jnp.ndarray:
    """Exact keypoints (B, K, 2) + validity -> 65-way labels (B, hc, wc):
    within-cell position index (row*8+col) where a corner lands, else the
    64 'no-keypoint' dustbin. Built by a scatter with mode='drop' so invalid
    slots never write."""
    b, k = kp.shape[:2]
    px = jnp.floor(kp[..., 0]).astype(jnp.int32)
    py = jnp.floor(kp[..., 1]).astype(jnp.int32)
    inb = valid & (px >= 0) & (py >= 0) & (px < wc * 8) & (py < hc * 8)
    cell = (py // 8) * wc + px // 8
    within = (py % 8) * 8 + px % 8
    flat_idx = jnp.where(inb, cell, hc * wc)  # out-of-range -> dropped
    labels = jnp.full((b, hc * wc), 64, jnp.int32)
    labels = jax.vmap(lambda lab, idx, val: lab.at[idx].set(val, mode="drop"))(
        labels, flat_idx, within.astype(jnp.int32)
    )
    return labels.reshape(b, hc, wc)


def _cell_labels_soft(
    kp: jnp.ndarray, valid: jnp.ndarray, hc: int, wc: int
) -> jnp.ndarray:
    """Exact keypoints (B, K, 2) + validity -> SOFT 65-way targets
    (B, hc*wc, 65): the GT corner's heatmap-frame position (kp - 0.5)
    bilinearly splats label mass over its up-to-4 neighboring pixels (which
    may straddle cell borders), so the cell softmax learns the sub-pixel
    position and a center-of-mass readout (ops/nms.com_refinement) recovers
    it exactly. Cells without corner mass put all mass on the dustbin."""
    b, k = kp.shape[:2]
    h, w = hc * 8, wc * 8
    q = kp - 0.5  # heatmap-frame position (see the loc-loss convention note)
    x0 = jnp.floor(q[..., 0])
    y0 = jnp.floor(q[..., 1])
    fx = q[..., 0] - x0
    fy = q[..., 1] - y0
    heat = jnp.zeros((b, h * w), jnp.float32)
    bad = h * w  # dropped by mode='drop'
    for dx, dy, wt in (
        (0, 0, (1 - fx) * (1 - fy)),
        (1, 0, fx * (1 - fy)),
        (0, 1, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        px = x0.astype(jnp.int32) + dx
        py = y0.astype(jnp.int32) + dy
        inb = valid & (px >= 0) & (py >= 0) & (px < w) & (py < h)
        idx = jnp.where(inb, py * w + px, bad)
        heat = jax.vmap(
            lambda hh, ii, vv: hh.at[ii].add(vv, mode="drop")
        )(heat, idx, wt.astype(jnp.float32))
    heat = jnp.clip(heat, 0.0, 1.0)  # coincident corners
    cells = (
        heat.reshape(b, hc, 8, wc, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, hc * wc, 64)
    )
    dustbin = jnp.clip(1.0 - jnp.sum(cells, axis=-1), 0.0, 1.0)
    target = jnp.concatenate([cells, dustbin[..., None]], axis=-1)
    return target / jnp.maximum(jnp.sum(target, axis=-1, keepdims=True), 1e-8)


__main_model__ = SuperPoint


def torch_weight_converter(state_dict: dict) -> dict:
    """Map the official MagicLeap ``superpoint_v1.pth`` tensors onto this
    module's param tree (NCHW OIHW -> HWIO). Input: name->numpy dict.

    For exact output parity with the torch implementation also set
    ``desc_sampling: torch`` in the model conf (the default 'center' grid
    mapping deviates by a constant 0.5 full-res px — see
    ops/interpolate.sample_descriptors)."""
    import numpy as np

    name_map = {
        "conv1a": "backbone/conv0", "conv1b": "backbone/conv1",
        "conv2a": "backbone/conv2", "conv2b": "backbone/conv3",
        "conv3a": "backbone/conv4", "conv3b": "backbone/conv5",
        "conv4a": "backbone/conv6", "conv4b": "backbone/conv7",
        "convPa": "convPa", "convPb": "convPb",
        "convDa": "convDa", "convDb": "convDb",
    }
    params: dict = {}
    for torch_name, flax_name in name_map.items():
        w = np.asarray(state_dict[f"{torch_name}.weight"])
        bias = np.asarray(state_dict[f"{torch_name}.bias"])
        node = params
        *parents, leaf = flax_name.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = {"kernel": w.transpose(2, 3, 1, 0), "bias": bias}
    return {"params": params}
