"""Batched Pose / Camera pytrees with analytic Jacobians
(reference: gluefactory/geometry/wrappers.py:50-425).

Design deltas from the reference:
  - Instead of a torch TensorWrapper over packed flat vectors, these are JAX
    dataclass pytrees (`jax.tree_util.register_dataclass`): they flow through
    jit/vmap/grad/shard_map unchanged and can be sharded per-field. A packed
    representation is still available via ``to_vec``/``from_vec`` for storage.
  - Rotations are stored as (..., 3, 3) matrices (MXU-friendly composition);
    tangent-space updates go through `so3exp_map` — this is the parameterization
    the distributed bundle-adjustment back-end optimizes in.
  - All ops broadcast over arbitrary leading batch dims.

Conventions match the reference: `Pose` maps points p3D_A -> p3D_B for
T_BfromA (wrappers.py:111-236); `Camera` uses the COLMAP convention where the
upper-left pixel center is (0.5, 0.5) (wrappers.py:238-247).
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from .utils import (
    J_distort_points,
    distort_points,
    skew_symmetric,
    so3exp_map,
    so3log_map,
    to_homogeneous,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Pose:
    """SE(3) transform: x_B = R @ x_A + t (reference wrappers.py:111)."""

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_Rt(cls, R: jnp.ndarray, t: jnp.ndarray) -> "Pose":
        return cls(R=jnp.asarray(R), t=jnp.asarray(t))

    @classmethod
    def from_aa(cls, aa: jnp.ndarray, t: jnp.ndarray) -> "Pose":
        """From axis-angle rotation (..., 3) and translation (..., 3)."""
        return cls(R=so3exp_map(jnp.asarray(aa)), t=jnp.asarray(t))

    @classmethod
    def from_4x4mat(cls, T: jnp.ndarray) -> "Pose":
        T = jnp.asarray(T)
        return cls(R=T[..., :3, :3], t=T[..., :3, 3])

    @classmethod
    def identity(cls, batch_shape: tuple = (), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return cls(R=R, t=t)

    @classmethod
    def from_vec(cls, vec: jnp.ndarray) -> "Pose":
        """Packed (..., 12) [R.flatten(), t] storage format (wrappers.py:118)."""
        return cls(R=vec[..., :9].reshape(*vec.shape[:-1], 3, 3), t=vec[..., 9:])

    def to_vec(self) -> jnp.ndarray:
        return jnp.concatenate([self.R.reshape(*self.R.shape[:-2], 9), self.t], axis=-1)

    # -- shape utils -------------------------------------------------------
    @property
    def shape(self) -> tuple:
        return self.t.shape[:-1]

    @property
    def dtype(self):
        return self.t.dtype

    def __getitem__(self, idx) -> "Pose":
        return Pose(R=self.R[idx], t=self.t[idx])

    def astype(self, dtype) -> "Pose":
        return Pose(R=self.R.astype(dtype), t=self.t.astype(dtype))

    # -- group ops ---------------------------------------------------------
    def inv(self) -> "Pose":
        """(reference wrappers.py:173-178)"""
        R_inv = jnp.swapaxes(self.R, -1, -2)
        return Pose(R=R_inv, t=-jnp.einsum("...ij,...j->...i", R_inv, self.t))

    def compose(self, other: "Pose") -> "Pose":
        """self @ other: apply ``other`` first (reference wrappers.py:179-186)."""
        return Pose(
            R=self.R @ other.R,
            t=self.t + jnp.einsum("...ij,...j->...i", self.R, other.t),
        )

    def __matmul__(self, other: Union["Pose", jnp.ndarray]):
        if isinstance(other, Pose):
            return self.compose(other)
        return self.transform(other)

    def transform(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """Transform points (..., N, 3) (reference wrappers.py:188-198)."""
        return jnp.einsum("...ij,...nj->...ni", self.R, p3d) + self.t[..., None, :]

    def magnitude(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(rotation angle in degrees, translation norm)
        (reference wrappers.py:222-233)."""
        trace = jnp.trace(self.R, axis1=-2, axis2=-1)
        cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
        dr = jnp.rad2deg(jnp.arccos(cos))
        dt = jnp.linalg.norm(self.t, axis=-1)
        return dr, dt

    # -- tangent space (for BA / pose-graph) -------------------------------
    def retract(self, delta: jnp.ndarray) -> "Pose":
        """Right-multiply an se(3) update delta = (omega, v) of shape (..., 6)."""
        dR = so3exp_map(delta[..., :3])
        return Pose(
            R=self.R @ dR,
            t=self.t + jnp.einsum("...ij,...j->...i", self.R, delta[..., 3:]),
        )

    def retract_left(self, delta: jnp.ndarray) -> "Pose":
        """Left-multiply update: T_new = exp(delta) ∘ T — the perturbation the
        BA Jacobians [-skew(p_cam) | I] linearize (sfm/ba.py)."""
        dR = so3exp_map(delta[..., :3])
        return Pose(
            R=dR @ self.R,
            t=jnp.einsum("...ij,...j->...i", dR, self.t) + delta[..., 3:],
        )

    def local(self, other: "Pose") -> jnp.ndarray:
        """Tangent coordinates of ``other`` relative to ``self`` (inverse of
        retract)."""
        rel = self.inv().compose(other)
        omega = so3log_map(rel.R)
        return jnp.concatenate([omega, rel.t], axis=-1)

    def J_transform(self, p3d_out: jnp.ndarray) -> jnp.ndarray:
        """Jacobian (..., N, 3, 6) of transformed point w.r.t. a left-applied
        se(3) perturbation (reference wrappers.py:210-220)."""
        J_rot = -skew_symmetric(p3d_out)  # (..., N, 3, 3)
        J_trans = jnp.broadcast_to(
            jnp.eye(3, dtype=p3d_out.dtype), (*p3d_out.shape[:-1], 3, 3)
        )
        return jnp.concatenate([J_rot, J_trans], axis=-1)

    def numpy(self):
        return np.asarray(self.R), np.asarray(self.t)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Batched pinhole(+Brown distortion) camera (reference wrappers.py:238).

    Fields broadcast over leading dims:
      size (..., 2) = (w, h); f (..., 2); c (..., 2); dist (..., 4).
    """

    size: jnp.ndarray
    f: jnp.ndarray
    c: jnp.ndarray
    dist: jnp.ndarray

    eps: float = dataclasses.field(default=1e-4, metadata={"static": True})

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_fc(cls, size, f, c, dist=None) -> "Camera":
        size, f, c = jnp.asarray(size), jnp.asarray(f), jnp.asarray(c)
        if dist is None:
            dist = jnp.zeros((*f.shape[:-1], 4), dtype=f.dtype)
        return cls(size=size, f=f, c=c, dist=jnp.asarray(dist))

    @classmethod
    def from_calibration_matrix(cls, K: jnp.ndarray, size=None) -> "Camera":
        K = jnp.asarray(K)
        f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
        c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
        if size is None:
            size = 2.0 * c  # best guess
        return cls.from_fc(size, f, c)

    @classmethod
    def from_vec(cls, vec: jnp.ndarray) -> "Camera":
        """Packed (..., 6|8|10): (w, h, fx, fy, cx, cy[, k1, k2[, p1, p2]])
        (reference wrappers.py:253-276)."""
        vec = jnp.asarray(vec)
        ndist = vec.shape[-1] - 6
        dist = jnp.zeros((*vec.shape[:-1], 4), dtype=vec.dtype)
        if ndist > 0:
            dist = dist.at[..., :ndist].set(vec[..., 6 : 6 + ndist])
        return cls(size=vec[..., 0:2], f=vec[..., 2:4], c=vec[..., 4:6], dist=dist)

    def to_vec(self) -> jnp.ndarray:
        return jnp.concatenate([self.size, self.f, self.c, self.dist], axis=-1)

    def calibration_matrix(self) -> jnp.ndarray:
        """(..., 3, 3) K (reference wrappers.py:347-357)."""
        z = jnp.zeros_like(self.f[..., 0])
        o = jnp.ones_like(z)
        K = jnp.stack(
            [
                self.f[..., 0], z, self.c[..., 0],
                z, self.f[..., 1], self.c[..., 1],
                z, z, o,
            ],
            axis=-1,
        ).reshape(*self.f.shape[:-1], 3, 3)
        return K

    @property
    def shape(self) -> tuple:
        return self.f.shape[:-1]

    @property
    def dtype(self):
        return self.f.dtype

    def __getitem__(self, idx) -> "Camera":
        return Camera(size=self.size[idx], f=self.f[idx], c=self.c[idx], dist=self.dist[idx])

    def astype(self, dtype) -> "Camera":
        return Camera(
            size=self.size.astype(dtype), f=self.f.astype(dtype),
            c=self.c.astype(dtype), dist=self.dist.astype(dtype),
        )

    # -- geometry ----------------------------------------------------------
    def scale(self, scales) -> "Camera":
        """Rescale for resized images (reference wrappers.py:296-306)."""
        s = jnp.asarray(scales, dtype=self.f.dtype)
        s = jnp.broadcast_to(s, self.f.shape)
        return Camera(size=self.size * s, f=self.f * s, c=self.c * s, dist=self.dist)

    def crop(self, left_top, size) -> "Camera":
        """(reference wrappers.py:308-318)"""
        lt = jnp.asarray(left_top, dtype=self.c.dtype)
        return Camera(
            size=jnp.broadcast_to(jnp.asarray(size, dtype=self.size.dtype), self.size.shape),
            f=self.f, c=self.c - lt, dist=self.dist,
        )

    def in_image(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Validity mask (..., N) for pixel points (reference wrappers.py:320-326)."""
        size = self.size[..., None, :]
        return jnp.all((p2d >= 0.0) & (p2d <= size - 1.0), axis=-1)

    def project(self, p3d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Camera-frame 3D (..., N, 3) -> normalized image plane (..., N, 2)
        + validity (reference wrappers.py:328-338)."""
        z = p3d[..., -1]
        valid = z > self.eps
        z_safe = jnp.where(valid, z, jnp.ones_like(z))
        p2d = p3d[..., :-1] / z_safe[..., None]
        return p2d, valid

    def J_project(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """(..., N, 2, 3) (reference wrappers.py:340-345)."""
        x, y, z = p3d[..., 0], p3d[..., 1], p3d[..., 2]
        z = jnp.where(z > self.eps, z, jnp.full_like(z, self.eps))
        zero = jnp.zeros_like(z)
        J = jnp.stack(
            [1.0 / z, zero, -x / z**2, zero, 1.0 / z, -y / z**2], axis=-1
        ).reshape(*p3d.shape[:-1], 2, 3)
        return J

    def distort(self, pts: jnp.ndarray) -> jnp.ndarray:
        return distort_points(pts, self.dist)

    def J_distort(self, pts: jnp.ndarray) -> jnp.ndarray:
        return J_distort_points(pts, self.dist)

    def undistort(self, pts: jnp.ndarray, num_iters: int = 5) -> jnp.ndarray:
        """Invert the Brown model by fixed-point iteration (static trip count —
        compiles to an unrolled/scan loop on TPU)."""
        def body(_, undist):
            return pts - (self.distort(undist) - undist)

        return jax.lax.fori_loop(0, num_iters, body, pts)

    def denormalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Normalized plane -> pixels (reference wrappers.py:359-365)."""
        return p2d * self.f[..., None, :] + self.c[..., None, :]

    def normalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        return (p2d - self.c[..., None, :]) / self.f[..., None, :]

    def cam2image(self, p3d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """3D camera-frame -> pixel coords + validity (reference wrappers.py:379-386)."""
        p2d, visible = self.project(p3d)
        p2d = self.distort(p2d)
        p2d = self.denormalize(p2d)
        valid = visible & self.in_image(p2d)
        return p2d, valid

    def image2cam(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Pixels -> unit-depth 3D rays (reference wrappers.py:393-399)."""
        pts = self.normalize(p2d)
        pts = self.undistort(pts)
        return to_homogeneous(pts)

    def J_world2image(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """Chain Jacobian (..., N, 2, 3) of pixel coords w.r.t. camera-frame 3D
        points (reference wrappers.py:387-391) — the building block of BA."""
        p2d, _ = self.project(p3d)
        J_dn = self.f[..., None, :, None] * jnp.broadcast_to(
            jnp.eye(2, dtype=p3d.dtype), (*p3d.shape[:-1], 2, 2)
        )
        return J_dn @ self.J_distort(p2d) @ self.J_project(p3d)

    def to_cameradict(self) -> dict:
        """COLMAP-style dict for estimator interop (reference wrappers.py:400-414)."""
        size = np.asarray(self.size)
        f = np.asarray(self.f)
        c = np.asarray(self.c)
        dist = np.asarray(self.dist)
        if size.ndim > 1:
            raise ValueError("to_cameradict expects an unbatched camera")
        if np.allclose(dist, 0.0):
            return {
                "model": "PINHOLE",
                "width": int(size[0]),
                "height": int(size[1]),
                "params": [float(f[0]), float(f[1]), float(c[0]), float(c[1])],
            }
        return {
            "model": "OPENCV",
            "width": int(size[0]),
            "height": int(size[1]),
            "params": [float(f[0]), float(f[1]), float(c[0]), float(c[1])]
            + [float(d) for d in dist[:4]],
        }
