"""Batched epipolar geometry (reference: gluefactory/geometry/epipolar.py)."""

from __future__ import annotations

import jax.numpy as jnp

from .utils import skew_symmetric, to_homogeneous
from .wrappers import Camera, Pose


def T_to_E(T: Pose) -> jnp.ndarray:
    """Essential matrix from relative pose: E = [t]x R
    (reference epipolar.py:7-12)."""
    return skew_symmetric(T.t) @ T.R


def E_to_F(E: jnp.ndarray, K0: jnp.ndarray, K1: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(K1).swapaxes(-1, -2) @ E @ jnp.linalg.inv(K0)


def F_to_E(F: jnp.ndarray, K0: jnp.ndarray, K1: jnp.ndarray) -> jnp.ndarray:
    return K1.swapaxes(-1, -2) @ F @ K0


def sym_epipolar_distance(
    p0: jnp.ndarray, p1: jnp.ndarray, E: jnp.ndarray, squared: bool = True
) -> jnp.ndarray:
    """Symmetric epipolar distance of paired points (..., N, 2|3)
    (reference epipolar.py:32-57)."""
    if p0.shape[-1] != 3:
        p0 = to_homogeneous(p0)
    if p1.shape[-1] != 3:
        p1 = to_homogeneous(p1)
    p1_E_p0 = jnp.einsum("...ni,...ij,...nj->...n", p1, E, p0)
    E_p0 = jnp.einsum("...ij,...nj->...ni", E, p0)
    Et_p1 = jnp.einsum("...ij,...ni->...nj", E, p1)
    d0 = E_p0[..., 0] ** 2 + E_p0[..., 1] ** 2
    d1 = Et_p1[..., 0] ** 2 + Et_p1[..., 1] ** 2
    inv = 1.0 / (d0 + 1e-15) + 1.0 / (d1 + 1e-15)
    if squared:
        return p1_E_p0**2 * inv
    return jnp.abs(p1_E_p0) * jnp.sqrt(inv)


def sym_epipolar_distance_all(
    p0: jnp.ndarray, p1: jnp.ndarray, E: jnp.ndarray, eps: float = 1e-15
) -> jnp.ndarray:
    """All-pairs symmetric epipolar distance (..., N, M)
    (reference epipolar.py:59-73)."""
    if p0.shape[-1] != 3:
        p0 = to_homogeneous(p0)
    if p1.shape[-1] != 3:
        p1 = to_homogeneous(p1)
    E_p0 = jnp.einsum("...ij,...nj->...ni", E, p0)  # (..., N, 3)
    Et_p1 = jnp.einsum("...ij,...mi->...mj", E, p1)  # (..., M, 3)
    p1_E_p0 = jnp.einsum("...mi,...ni->...nm", p1, E_p0)  # (..., N, M)
    d0 = (E_p0[..., 0] ** 2 + E_p0[..., 1] ** 2)[..., :, None]
    d1 = (Et_p1[..., 0] ** 2 + Et_p1[..., 1] ** 2)[..., None, :]
    return p1_E_p0**2 * (1.0 / (d0 + eps) + 1.0 / (d1 + eps))


def generalized_epi_dist(
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    cam0: Camera,
    cam1: Camera,
    T_0to1: Pose,
    all_pairs: bool = False,
    essential: bool = True,
) -> jnp.ndarray:
    """Epipolar distance of pixel keypoints given cameras + relative pose
    (reference epipolar.py:75-95). ``essential=True`` computes the distance in
    normalized camera coordinates (scale ~ rad), else in pixels via F."""
    if essential:
        r0 = cam0.image2cam(kpts0)
        r1 = cam1.image2cam(kpts1)
        E = T_to_E(T_0to1)
        if all_pairs:
            return jnp.sqrt(jnp.maximum(sym_epipolar_distance_all(r0, r1, E), 0.0))
        return sym_epipolar_distance(r0, r1, E, squared=False)
    K0, K1 = cam0.calibration_matrix(), cam1.calibration_matrix()
    F = E_to_F(T_to_E(T_0to1), K0, K1)
    if all_pairs:
        return jnp.sqrt(jnp.maximum(sym_epipolar_distance_all(kpts0, kpts1, F), 0.0))
    return sym_epipolar_distance(kpts0, kpts1, F, squared=False)


def decompose_essential_matrix(E: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """E -> two rotation candidates (R1, R2) and translation direction t
    via SVD (reference epipolar.py:97-137). Returns (Rs (..., 2, 3, 3), t (..., 3))."""
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return jnp.stack([R1, R2], axis=-3), t


def angle_error_mat(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    cos = (jnp.trace(jnp.swapaxes(R1, -1, -2) @ R2, axis1=-2, axis2=-1) - 1.0) / 2.0
    return jnp.rad2deg(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def angle_error_vec(v1: jnp.ndarray, v2: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    n = jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1)
    cos = jnp.sum(v1 * v2, axis=-1) / (n + eps)
    return jnp.rad2deg(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def relative_pose_error(
    T_0to1: Pose, R_est: jnp.ndarray, t_est: jnp.ndarray, ignore_gt_t_thr: float = 0.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Angular rotation / translation errors in degrees
    (reference epipolar.py:139-155). Translation error is min over sign
    (direction ambiguity of the essential matrix)."""
    t_gt = T_0to1.t
    t_err = angle_error_vec(t_est, t_gt)
    t_err = jnp.minimum(t_err, 180.0 - t_err)
    t_err = jnp.where(jnp.linalg.norm(t_gt, axis=-1) < ignore_gt_t_thr, 0.0, t_err)
    r_err = angle_error_mat(R_est, T_0to1.R)
    return r_err, t_err
