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
import os

# Platform escape hatch: site customizations can pin every process to a
# remote accelerator backend before env vars are read; GFTPU_PLATFORM=cpu
# (set before importing this package) re-routes through jax.config, which
# still works as long as no backend has been initialized — e.g. to run an
# eval on host CPU while a training job owns the accelerator.
if os.environ.get("GFTPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["GFTPU_PLATFORM"])

# Persistent XLA compilation cache for every package process (trainer,
# evals, in-train benchmark hook): through the axon tunnel a large graph
# compile costs 8-20 min, and e.g. the per-epoch benchmark hook re-jits the
# same forward graph each epoch. Opt out with GFTPU_COMPILE_CACHE=0.
_cache_dir = os.environ.get("GFTPU_COMPILE_CACHE",
                            "/root/.cache/jax_gftpu_cache")
if _cache_dir not in ("", "0") and not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    try:
        import jax

        from .utils.misc import cpu_cache_tag

        jax.config.update(
            "jax_compilation_cache_dir", f"{_cache_dir}-{cpu_cache_tag()}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass

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
