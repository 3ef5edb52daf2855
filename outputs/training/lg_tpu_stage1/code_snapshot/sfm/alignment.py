"""Trajectory alignment + ATE (new back-end utility): Umeyama Sim(3)
alignment of estimated to ground-truth camera centers — the standard
evaluation transform for monocular reconstructions whose frame and scale are
gauge-free."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry.wrappers import Pose


def camera_centers(poses: Pose) -> np.ndarray:
    return np.asarray(-jnp.einsum("mji,mj->mi", poses.R, poses.t))


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform s*R @ src + t ~= dst.
    Returns (s, R (3,3), t (3,))."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (xs**2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def absolute_trajectory_error(
    poses_est: Pose, poses_gt: Pose, align: bool = True
) -> float:
    """RMS ATE of camera centers after (optional) Sim(3) alignment."""
    c_est = camera_centers(poses_est)
    c_gt = camera_centers(poses_gt)
    if align:
        s, R, t = umeyama_alignment(c_est, c_gt)
        c_est = (s * (R @ c_est.T)).T + t
    return float(np.sqrt(((c_est - c_gt) ** 2).sum(-1).mean()))
