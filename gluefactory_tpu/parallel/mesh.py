"""Device-mesh construction and sharding helpers (SURVEY.md §5.8: the
jax.sharding translation of the reference's NCCL/DDP layer).

Axis convention: ``data`` (batch data-parallelism), ``seq`` (token-axis
sharding for ring attention / sequence parallelism), ``ba`` (observation
sharding of the bundle-adjustment back-end). Multi-host initialization goes
through `maybe_init_distributed` (≙ torch.distributed.init_process_group,
reference train.py:239-245)."""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import logger


def maybe_init_distributed():
    """Initialize jax.distributed from standard env vars when present
    (coordinator address set => multi-host launch)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        kwargs = {}
        # explicit contract of scripts/launch_multihost.py; on real TPU pods
        # these are absent and jax auto-detects from the cluster environment
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        try:
            jax.distributed.initialize(**kwargs)
            logger.info(
                "jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count(),
            )
        except Exception as e:  # pragma: no cover
            logger.warning("jax.distributed.initialize failed: %s", e)


def get_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh; default = all devices on one ``data`` axis. ``axes``
    maps axis name -> size with at most one -1 (inferred)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if not axes:
        return Mesh(devices, ("data",))
    names = tuple(axes.keys())
    sizes = list(axes.values())
    n = devices.size
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    return Mesh(devices.reshape(sizes), names)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
