"""Fixed-radius clustering (DBSCAN-equivalent for junction merging) as pure
batched JAX (replaces sklearn.DBSCAN in the reference wireframe builder,
gluefactory/models/lines/wireframe.py:22-128, per SURVEY.md §2.9).

Connected components of the eps-ball graph are computed by iterative label
min-propagation through the adjacency matrix — O(N^2) per image but fully
batched and jittable; N (=2*max_lines endpoints) is a few hundred, so the
matmul-shaped propagation is cheap on the VPU/MXU."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fixed_radius_clusters(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    eps: float,
    num_iters: int = 16,
) -> jnp.ndarray:
    """points (..., N, 2), valid (..., N) -> labels (..., N) int32.

    Two points share a label iff they are connected through eps-balls.
    Labels are canonical: the smallest point index in the component. Invalid
    points get label = their own index (singletons)."""
    n = points.shape[-2]
    d2 = jnp.sum(
        (points[..., :, None, :] - points[..., None, :, :]) ** 2, axis=-1
    )
    adj = (d2 <= eps * eps) & valid[..., :, None] & valid[..., None, :]
    adj = adj | jnp.eye(n, dtype=bool)
    labels0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), points.shape[:-1])

    def body(_, labels):
        # label_i <- min over neighbors j of label_j
        lab_mat = jnp.where(adj, labels[..., None, :], n)
        return jnp.min(lab_mat, axis=-1).astype(jnp.int32)

    return jax.lax.fori_loop(0, num_iters, body, labels0)


def cluster_means(
    points: jnp.ndarray,
    weights: jnp.ndarray,
    labels: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted mean of member points per canonical label slot.

    Returns (means (..., N, 2), counts (..., N)); slot i is meaningful only
    where labels == i for some member (counts > 0)."""
    n = points.shape[-2]
    onehot = (labels[..., None, :] == jnp.arange(n)[:, None]).astype(points.dtype)
    w = onehot * weights[..., None, :]
    counts = jnp.sum(w, axis=-1)
    sums = jnp.einsum("...kn,...nd->...kd", w, points)
    means = sums / jnp.maximum(counts[..., None], 1e-8)
    return means, counts
