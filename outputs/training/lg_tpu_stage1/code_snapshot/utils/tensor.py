"""Pytree utilities over dict-of-arrays batches
(reference: gluefactory/utils/tensor.py:13-48).

Data batches are nested dicts of arrays (``view0``/``view1`` sub-dicts, flat
prediction keys suffixed ``0``/``1``). In JAX these are already pytrees, so
"map over every tensor" is `jax.tree.map` with a leaf filter; device transfer
is `jax.device_put` with an optional sharding.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

ArrayTree = Any


def _is_array(x) -> bool:
    return isinstance(x, (jnp.ndarray, np.ndarray, jax.Array))


def map_tensor(tree: ArrayTree, fn: Callable) -> ArrayTree:
    """Apply ``fn`` to every array leaf, passing other leaves through."""
    return jax.tree.map(lambda x: fn(x) if _is_array(x) else x, tree)


def batch_to_device(batch: ArrayTree, sharding=None, non_blocking: bool = True) -> ArrayTree:
    """Move every array leaf onto device (optionally with a Sharding)."""
    return map_tensor(batch, lambda x: jax.device_put(x, sharding))


def batch_to_numpy(batch: ArrayTree) -> ArrayTree:
    return map_tensor(batch, lambda x: np.asarray(x))


def rbd(data: ArrayTree) -> ArrayTree:
    """Remove batch dimension from every array leaf."""
    return map_tensor(data, lambda x: x[0] if getattr(x, "ndim", 0) > 0 else x)


def index_batch(batch: ArrayTree):
    """Iterate over the elements of a batched tree (de-batch)."""
    leaves = jax.tree.leaves(batch)
    sizes = [x.shape[0] for x in leaves if _is_array(x) and x.ndim > 0]
    n = sizes[0] if sizes else 0
    for i in range(n):
        yield map_tensor(batch, lambda x: x[i])


def tree_stack(trees: list) -> ArrayTree:
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def tree_concat(trees: list, axis: int = 0) -> ArrayTree:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *trees)
