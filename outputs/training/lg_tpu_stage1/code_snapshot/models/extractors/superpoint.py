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
import jax.numpy as jnp

from ...ops.interpolate import sample_descriptors
from ...ops.nms import select_top_k_keypoints, simple_nms, soft_argmax_refinement
from ..base_model import BaseModel


class VGGBackbone(nn.Module):
    """4-stage VGG encoder, stride 8 (reference superpoint.py:170-200)."""

    channels: tuple = (64, 64, 64, 64, 128, 128, 128, 128)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cdt = jnp.bfloat16 if self.dtype == "bf16" else jnp.float32
        pool_after = {1, 3, 5}
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{i}", dtype=cdt)(x)
            x = nn.relu(x)
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
        "dense_outputs": False,
        "channels": [64, 64, 64, 64, 128, 128, 128, 128],
        "head_channels": 256,
        "dtype": "float32",  # bf16 runs the CNN in bfloat16 (params stay f32)
        "weights": None,
    }
    required_data_keys: ClassVar[list] = ["image"]

    def setup(self):
        cdt = jnp.bfloat16 if self.conf.dtype == "bf16" else jnp.float32
        self.backbone = VGGBackbone(channels=tuple(self.conf.channels),
                                    dtype=self.conf.dtype)
        head = self.conf.head_channels
        if self.conf.has_detector:
            self.convPa = nn.Conv(head, (3, 3), padding="SAME", name="convPa", dtype=cdt)
            self.convPb = nn.Conv(65, (1, 1), name="convPb", dtype=cdt)
        if self.conf.has_descriptor:
            self.convDa = nn.Conv(head, (3, 3), padding="SAME", name="convDa", dtype=cdt)
            self.convDb = nn.Conv(self.conf.descriptor_dim, (1, 1), name="convDb",
                                  dtype=cdt)

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
            logits = self.convPb(nn.relu(self.convPa(features)))  # (B, H/8, W/8, 65)
            logits = logits.astype(jnp.float32)
            probs = nn.softmax(logits, axis=-1)[..., :-1]  # drop dustbin
            # (B, Hc, Wc, 64) -> full-res heatmap (B, H, W)
            heat = probs.reshape(b, hc, wc, 8, 8)
            heat = heat.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)
            heat = simple_nms(heat, self.conf.nms_radius)
            image_size = data.get("image_size")
            keypoints, scores, valid = select_top_k_keypoints(
                heat,
                k=self.conf.max_num_keypoints,
                threshold=self.conf.detection_threshold,
                border=self.conf.remove_borders,
                image_size=image_size,
            )
            if self.conf.refinement_radius > 0:
                keypoints = soft_argmax_refinement(
                    keypoints, heat, self.conf.refinement_radius
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

        if self.conf.has_descriptor:
            dense = self.convDb(nn.relu(self.convDa(features))).astype(jnp.float32)
            dense = dense / (jnp.linalg.norm(dense, axis=-1, keepdims=True) + 1e-8)
            if self.conf.has_detector:
                pred["descriptors"] = sample_descriptors(
                    dense, pred["keypoints"] - 0.5, stride=8
                )
            if self.conf.dense_outputs or not self.conf.has_detector:
                pred["descriptors_dense"] = dense
        return pred

    def loss(self, pred: dict, data: dict):
        raise NotImplementedError("SuperPoint is inference-only (pretrained)")


__main_model__ = SuperPoint


def torch_weight_converter(state_dict: dict) -> dict:
    """Map the official MagicLeap ``superpoint_v1.pth`` tensors onto this
    module's param tree (NCHW OIHW -> HWIO). Input: name->numpy dict."""
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
