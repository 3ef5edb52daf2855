"""Pose-graph optimization (NEW back-end layer — BASELINE.json north star).

Gauss-Newton / LM over SE(3) nodes with relative-pose edge constraints:
  residual(e) = Log( T_meas_ij^-1 ∘ (T_j ∘ T_i^-1) )   (world->cam poses)
with Jacobians taken numerically-exactly through jax.jacobian of the batched
residual (small 6-dof blocks; autodiff beats hand-derived adjoints for
robustness). Edges are flat static arrays; the (6M, 6M) system is dense —
pose graphs have few nodes relative to BA points, so a replicated dense solve
is the right TPU shape. Huber robustification on edge chordal error."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry.wrappers import Pose


def _edge_residual(poses: Pose, edge_i, edge_j, meas: Pose) -> jnp.ndarray:
    """(E, 6) tangent residuals."""
    Ti = Pose(R=poses.R[edge_i], t=poses.t[edge_i])
    Tj = Pose(R=poses.R[edge_j], t=poses.t[edge_j])
    T_ij = Tj.compose(Ti.inv())  # world->cam relative: cam_i -> cam_j
    rel = meas.inv().compose(T_ij)
    return Pose.identity((rel.R.shape[0],)).local(rel)  # Log(rel)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def optimize_pose_graph(
    poses: Pose,
    edge_i: jnp.ndarray,
    edge_j: jnp.ndarray,
    meas: Pose,
    edge_weight: jnp.ndarray | None = None,
    fixed: jnp.ndarray | None = None,
    num_iters: int = 20,
    huber_delta: float = 0.5,
    init_lambda: float = 1e-4,
) -> tuple[Pose, dict]:
    """poses (M,), edges (E,) index arrays + measured relative poses.
    Returns (optimized poses, info)."""
    M = poses.R.shape[0]
    E = edge_i.shape[0]
    if edge_weight is None:
        edge_weight = jnp.ones((E,))
    if fixed is None:
        fixed = jnp.zeros((M,), bool).at[0].set(True)

    def residual_flat(x6, base: Pose):
        p = base.retract_left(x6.reshape(M, 6))
        return _edge_residual(p, edge_i, edge_j, meas).reshape(-1)

    def step(carry, _):
        poses_c, lam = carry
        r = _edge_residual(poses_c, edge_i, edge_j, meas)  # (E, 6)
        rn = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(rn <= huber_delta, 1.0, huber_delta / jnp.maximum(rn, 1e-12))
        w = w * edge_weight
        cost = jnp.sum(
            jnp.where(rn <= huber_delta, 0.5 * rn**2,
                      huber_delta * (rn - 0.5 * huber_delta)) * edge_weight
        )
        # J of residuals w.r.t. a left-perturbation at the current estimate
        J = jax.jacobian(lambda x: residual_flat(x, poses_c))(jnp.zeros(6 * M))
        J = J.reshape(E, 6, M * 6)
        W = w[:, None, None]
        H = jnp.einsum("eik,eil->kl", J * W, J)
        g = -jnp.einsum("eik,ei->k", J * W, r)
        # gauge fixing
        free = jnp.repeat(~fixed, 6).astype(H.dtype)
        H = H * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        g = g * free
        H = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6 * M)
        dx = jnp.linalg.solve(H, g)
        new_poses = poses_c.retract_left(dx.reshape(M, 6))
        r_new = _edge_residual(new_poses, edge_i, edge_j, meas)
        rn_new = jnp.linalg.norm(r_new, axis=-1)
        new_cost = jnp.sum(
            jnp.where(rn_new <= huber_delta, 0.5 * rn_new**2,
                      huber_delta * (rn_new - 0.5 * huber_delta)) * edge_weight
        )
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        poses_c = jax.tree.map(lambda a, b: jnp.where(accept, b, a), poses_c, new_poses)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        return (poses_c, lam), jnp.where(accept, new_cost, cost)

    (out_poses, lam), costs = jax.lax.scan(
        step, (poses, jnp.asarray(init_lambda)), None, length=num_iters
    )
    return out_poses, {"costs": costs}
