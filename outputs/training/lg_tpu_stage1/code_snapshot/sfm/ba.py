"""Distributed bundle adjustment via Schur-complement reduction
(NEW back-end layer — BASELINE.json north star; the reference has no BA).

Levenberg-Marquardt over camera poses (se(3), left perturbation) and 3D
points with robust Huber reprojection errors. TPU-first structure:

  - Observations are flat static arrays (obs_cam, obs_pt, obs_uv, obs_valid);
    every per-observation quantity (residual, Jacobians, Hessian blocks) is
    one batched einsum; block aggregation is scatter-add (segment-sum).
  - The reduced camera system S = U - W V^-1 W^T is assembled densely over
    the (small) camera block and solved replicated; the point block V is
    block-diagonal 3x3 and inverted in closed batched form.
  - ``bundle_adjust_sharded`` shards the observation set and the point-wise
    Schur cross-term over a mesh axis with `shard_map`; partial U/V/b/W
    aggregates and the cross-term are combined with `jax.lax.psum` — the ICI
    collective pattern from SURVEY.md §2.10/§5.8. Poses/points stay
    replicated (cameras are few; points cheap), the O(observations) work is
    what scales.

The camera intrinsics are held fixed (standard two-stage SfM); Jacobians come
from geometry/wrappers (Camera.J_world2image, designed for this use —
reference wrappers.py:387-391 keeps them "for future BA").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..geometry.utils import skew_symmetric
from ..geometry.wrappers import Camera, Pose


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BAProblem:
    poses: Pose  # (M,) world->cam
    cameras: Camera  # (M,)
    points: jnp.ndarray  # (P, 3) world
    obs_cam: jnp.ndarray  # (O,) int32
    obs_pt: jnp.ndarray  # (O,) int32
    obs_uv: jnp.ndarray  # (O, 2)
    obs_valid: jnp.ndarray  # (O,)
    fixed_cams: jnp.ndarray  # (M,) bool — gauge fixing

    @property
    def num_cams(self) -> int:
        return self.poses.R.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[0]


def _gather_pose(poses: Pose, idx: jnp.ndarray) -> Pose:
    return Pose(R=poses.R[idx], t=poses.t[idx])


def _gather_cam(cams: Camera, idx: jnp.ndarray) -> Camera:
    return Camera(size=cams.size[idx], f=cams.f[idx], c=cams.c[idx], dist=cams.dist[idx])


def _residuals_and_jacobians(problem: BAProblem, poses: Pose, points: jnp.ndarray,
                             huber_delta: float, trim_th: float | None = None):
    """Per-observation residual (O, 2), robust weight (O,), J_cam (O, 2, 6),
    J_pt (O, 2, 3)."""
    T_o = _gather_pose(poses, problem.obs_cam)
    cam_o = _gather_cam(problem.cameras, problem.obs_cam)
    X_o = points[problem.obs_pt]  # (O, 3)
    p_cam = jnp.einsum("oij,oj->oi", T_o.R, X_o) + T_o.t  # (O, 3)
    uv_pred, visible = cam_o.cam2image(p_cam[:, None, :])
    uv_pred = uv_pred[:, 0]
    r = uv_pred - problem.obs_uv  # (O, 2)
    valid = problem.obs_valid & visible[:, 0] & (p_cam[:, 2] > 1e-3)
    rn = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(rn <= huber_delta, 1.0, huber_delta / jnp.maximum(rn, 1e-12))
    if trim_th is not None:
        # hard-trim gross outliers: Huber alone still lets them bias the
        # solution when they are a sizable fraction of the observations
        w = jnp.where(rn > trim_th, 0.0, w)
    w = jnp.where(valid, w, 0.0)
    J_px = cam_o.J_world2image(p_cam[:, None, :])[:, 0]  # (O, 2, 3)
    # left perturbation: d p_cam = [-skew(p_cam) | I] (omega, v)
    J_pose = jnp.concatenate(
        [-skew_symmetric(p_cam), jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (r.shape[0], 3, 3))],
        axis=-1,
    )  # (O, 3, 6)
    J_cam = jnp.einsum("oij,ojk->oik", J_px, J_pose)  # (O, 2, 6)
    J_pt = jnp.einsum("oij,ojk->oik", J_px, T_o.R)  # (O, 2, 3)
    in_cost = jnp.where(valid, 1.0, 0.0)
    if trim_th is not None:
        in_cost = in_cost * jnp.where(rn > trim_th, 0.0, 1.0)
    cost = jnp.sum(
        jnp.where(
            rn <= huber_delta, 0.5 * rn**2, huber_delta * (rn - 0.5 * huber_delta)
        )
        * in_cost
    )
    return r, w, J_cam, J_pt, cost


def _block_aggregates(problem: BAProblem, r, w, J_cam, J_pt):
    """Segment-sum the normal-equation blocks."""
    M, P = problem.num_cams, problem.num_points
    Wr = w[:, None] * r
    U_o = jnp.einsum("oik,o,oil->okl", J_cam, w, J_cam)  # (O, 6, 6)
    V_o = jnp.einsum("oik,o,oil->okl", J_pt, w, J_pt)  # (O, 3, 3)
    W_o = jnp.einsum("oik,o,oil->okl", J_cam, w, J_pt)  # (O, 6, 3)
    bc_o = -jnp.einsum("oik,oi->ok", J_cam, Wr)  # (O, 6)
    bp_o = -jnp.einsum("oik,oi->ok", J_pt, Wr)  # (O, 3)
    U = jnp.zeros((M, 6, 6)).at[problem.obs_cam].add(U_o)
    V = jnp.zeros((P, 3, 3)).at[problem.obs_pt].add(V_o)
    bc = jnp.zeros((M, 6)).at[problem.obs_cam].add(bc_o)
    bp = jnp.zeros((P, 3)).at[problem.obs_pt].add(bp_o)
    # A[p, c] = sum of W_o over observations of point p by camera c
    Apc = jnp.zeros((P, M, 6, 3)).at[problem.obs_pt, problem.obs_cam].add(W_o)
    return U, V, bc, bp, Apc


def _schur_solve(problem: BAProblem, U, V, bc, bp, Apc, lm_lambda,
                 point_slice: tuple[int, int] | None = None,
                 axis_name: str | None = None):
    """Form + solve the reduced camera system, back-substitute points."""
    M, P = problem.num_cams, problem.num_points
    # LM damping (multiplicative on the diagonals)
    eye6 = jnp.eye(6)
    eye3 = jnp.eye(3)
    U_d = U + lm_lambda * (jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(U)) + 1e-6 * eye6)
    V_d = V + lm_lambda * (jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(V)) + 1e-6 * eye3)
    Vinv = jnp.linalg.inv(V_d + 1e-9 * eye3)
    if point_slice is None:
        Y = jnp.einsum("pmik,pkl->pmil", Apc, Vinv)  # (P, M, 6, 3)
        S_cross = jnp.einsum("pmik,pnjk->minj", Y, Apc)
        b_cross = jnp.einsum("pmik,pk->mi", Y, bp)
    else:
        s0, sz = point_slice
        Apc_s = jax.lax.dynamic_slice_in_dim(Apc, s0, sz, axis=0)
        Vinv_s = jax.lax.dynamic_slice_in_dim(Vinv, s0, sz, axis=0)
        bp_s = jax.lax.dynamic_slice_in_dim(bp, s0, sz, axis=0)
        Y_s = jnp.einsum("pmik,pkl->pmil", Apc_s, Vinv_s)
        S_cross = jnp.einsum("pmik,pnjk->minj", Y_s, Apc_s)
        b_cross = jnp.einsum("pmik,pk->mi", Y_s, bp_s)
        if axis_name is not None:
            S_cross = jax.lax.psum(S_cross, axis_name)
            b_cross = jax.lax.psum(b_cross, axis_name)
    S = jnp.zeros((M, 6, M, 6))
    S = S.at[jnp.arange(M), :, jnp.arange(M), :].set(U_d)
    S = S - S_cross
    rhs = bc - b_cross
    # gauge fixing: identity rows/cols for fixed cameras
    free = (~problem.fixed_cams).astype(S.dtype)
    mask = free[:, None, None, None] * free[None, None, :, None]
    S = S * mask
    S = S.at[jnp.arange(M), :, jnp.arange(M), :].add(
        (1.0 - free)[:, None, None] * jnp.eye(6)
    )
    rhs = rhs * free[:, None]
    Sd = S.reshape(6 * M, 6 * M) + 1e-8 * jnp.eye(6 * M)
    dxc = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(M, 6)
    # back-substitution for points
    dxp = jnp.einsum(
        "pkl,pl->pk", Vinv, bp - jnp.einsum("pmik,mi->pk", Apc, dxc)
    )
    return dxc, dxp


def _cost_only(problem: BAProblem, poses: Pose, points: jnp.ndarray,
               huber_delta: float, trim_th: float | None = None):
    return _residuals_and_jacobians(problem, poses, points, huber_delta, trim_th)[4]


@functools.partial(jax.jit, static_argnames=("num_iters", "trim_th"))
def bundle_adjust(
    problem: BAProblem,
    num_iters: int = 20,
    huber_delta: float = 3.0,
    init_lambda: float = 1e-3,
    trim_th: float | None = None,
) -> tuple[Pose, jnp.ndarray, dict]:
    """LM bundle adjustment, single device. Returns (poses, points, info)."""

    def step(carry, _):
        poses, points, lam = carry
        r, w, J_cam, J_pt, cost = _residuals_and_jacobians(
            problem, poses, points, huber_delta, trim_th
        )
        U, V, bc, bp, Apc = _block_aggregates(problem, r, w, J_cam, J_pt)
        dxc, dxp = _schur_solve(problem, U, V, bc, bp, Apc, lam)
        new_poses = poses.retract_left(dxc)
        new_points = points + dxp
        new_cost = _cost_only(problem, new_poses, new_points, huber_delta, trim_th)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        poses = jax.tree.map(lambda a, b: jnp.where(accept, b, a), poses, new_poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        return (poses, points, lam), jnp.where(accept, new_cost, cost)

    (poses, points, lam), costs = jax.lax.scan(
        step, (problem.poses, problem.points, jnp.asarray(init_lambda)), None,
        length=num_iters,
    )
    return poses, points, {"costs": costs, "final_lambda": lam}


def bundle_adjust_sharded(
    problem: BAProblem,
    mesh: jax.sharding.Mesh,
    num_iters: int = 20,
    huber_delta: float = 3.0,
    init_lambda: float = 1e-3,
):
    """Data-distributed LM-BA: observations sharded over ``mesh`` axis 'ba';
    per-shard Hessian blocks and the point-sliced Schur cross-term are reduced
    with psum. Obs count must be padded to a multiple of the axis size
    (pad with obs_valid=False)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    O = problem.obs_cam.shape[0]
    assert O % n_dev == 0, f"pad observations to a multiple of {n_dev}"
    # pad points to a multiple of the axis size so each shard owns an equal,
    # disjoint slice of the Schur cross-term (padded points have no
    # observations and contribute exactly zero)
    Pn = problem.num_points
    per_pt = -(-Pn // n_dev)
    P_pad = per_pt * n_dev
    if P_pad != Pn:
        pad = P_pad - Pn
        problem = dataclasses.replace(
            problem,
            points=jnp.concatenate(
                [problem.points, jnp.zeros((pad, 3), problem.points.dtype)], axis=0
            ),
        )

    obs_spec = BAProblem(
        poses=Pose(R=P(), t=P()),
        cameras=Camera(size=P(), f=P(), c=P(), dist=P()),
        points=P(),
        obs_cam=P(axis), obs_pt=P(axis), obs_uv=P(axis), obs_valid=P(axis),
        fixed_cams=P(),
    )

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(obs_spec,),
        out_specs=(Pose(R=P(), t=P()), P(), P()),
    )
    def run(local: BAProblem):
        shard_i = jax.lax.axis_index(axis)

        def cost_fn(poses, points):
            c = _residuals_and_jacobians(local, poses, points, huber_delta)[4]
            return jax.lax.psum(c, axis)

        def step(carry, _):
            poses, points, lam = carry
            r, w, J_cam, J_pt, cost = _residuals_and_jacobians(
                local, poses, points, huber_delta
            )
            cost = jax.lax.psum(cost, axis)
            U, V, bc, bp, Apc = _block_aggregates(local, r, w, J_cam, J_pt)
            # global block aggregates over all shards (ICI all-reduce)
            U = jax.lax.psum(U, axis)
            V = jax.lax.psum(V, axis)
            bc = jax.lax.psum(bc, axis)
            bp = jax.lax.psum(bp, axis)
            Apc = jax.lax.psum(Apc, axis)
            dxc, dxp = _schur_solve(
                local, U, V, bc, bp, Apc, lam,
                point_slice=(shard_i * per_pt, per_pt), axis_name=axis,
            )
            new_poses = poses.retract_left(dxc)
            new_points = points + dxp
            new_cost = cost_fn(new_poses, new_points)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            poses = jax.tree.map(lambda a, b: jnp.where(accept, b, a), poses, new_poses)
            points = jnp.where(accept, new_points, points)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                            jnp.minimum(lam * 4.0, 1e6))
            return (poses, points, lam), jnp.where(accept, new_cost, cost)

        (poses, points, lam), costs = jax.lax.scan(
            step, (local.poses, local.points, jnp.asarray(init_lambda)), None,
            length=num_iters,
        )
        return poses, points, costs

    poses, points, costs = run(problem)
    return poses, points[:Pn], {"costs": costs}
