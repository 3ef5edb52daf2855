"""TPU-native deep feature matching & SfM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Glue Factory
(reference: gluefactory/__init__.py:1-17): training and evaluation of deep
keypoint/line detectors-descriptors, attention matchers (LightGlue, GlueStick,
SuperGlue), batched two-view robust geometry, benchmarks (HPatches,
MegaDepth-1500, ETH3D), plus a distributed multi-view back-end (bundle
adjustment / pose-graph) the reference does not have.

Everything on the compute path is functional JAX with static shapes; hot ops
are Pallas TPU kernels; multi-chip scaling goes through `jax.sharding.Mesh`
with named-axis collectives.
"""

import logging

__module_name__ = "gluefactory_tpu"
__version__ = "0.1.0"

logger = logging.getLogger(__module_name__)
if not logger.handlers:
    _handler = logging.StreamHandler()
    _formatter = logging.Formatter(
        "[%(asctime)s %(name)s %(levelname)s] %(message)s", datefmt="%m/%d %H:%M:%S"
    )
    _handler.setFormatter(_formatter)
    logger.addHandler(_handler)
    logger.setLevel(logging.INFO)
    logger.propagate = False
