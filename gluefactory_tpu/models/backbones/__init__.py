"""Dense backbone encoders (reference: gluefactory/models/backbones/ —
backbone_encoder.py, vgg_unet.py, dinov2.py). Each produces a dense feature
map for the joint point+line heads (JPLDD / POLD2)."""

from .backbone_encoder import ALIKED_CFGS, AlikedEncoder, make_backbone

__all__ = ["ALIKED_CFGS", "AlikedEncoder", "make_backbone"]
