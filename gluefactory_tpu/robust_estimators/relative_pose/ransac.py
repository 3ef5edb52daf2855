"""Batched TPU LO-RANSAC for relative pose (essential matrix)
(replaces gluefactory/robust_estimators/relative_pose/{opencv,poselib,pycolmap}.py).

Pipeline (all on device, static shapes):
  1. normalize keypoints through the cameras (pixels -> unit-plane rays),
  2. minimal solving: Nister-class 5-point (default; up to 10 candidate
     essentials per sample via the batched hidden-variable-resultant solver,
     geometry/essential.five_point_essential — the PoseLib-parity piece,
     SURVEY.md §7.3.3) or the batched weighted 8-point,
  3. MSAC-score all candidates x N Sampson residuals, pick the best,
  4. local optimization: iteratively-reweighted 8-point on the inlier set
     (the LO step; SURVEY.md §7.3.1 notes RANSAC quality is worth ~10 AUC
     points — LO is what closes the gap to PoseLib),
  5. recover (R, t) by cheirality voting over the 4 decompositions."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...geometry.essential import (
    eight_point_essential,
    five_point_essential,
    recover_pose_from_essential,
    refine_pose_sampson,
    sampson_distance,
)
from ...geometry.wrappers import Camera, Pose
from ..base_estimator import BaseEstimator


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "lo_iters", "minimal_solver")
)
def ransac_essential(
    rays0: jnp.ndarray,
    rays1: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    th: float,
    num_hypotheses: int = 1024,
    lo_iters: int = 4,
    minimal_solver: str = "5pt",
):
    """rays0/1 (N, 3) unit-plane coords; th in normalized units.
    Returns (E, R, t, inliers, score)."""
    th2 = th * th
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, num_hypotheses)
    n_min = 5 if minimal_solver == "5pt" else 8
    sample_idx = jax.vmap(
        lambda k: jax.random.categorical(k, logits, shape=(n_min,))
    )(keys)
    x0 = rays0[sample_idx]  # (S, n_min, 3)
    x1 = rays1[sample_idx]
    if minimal_solver == "5pt":
        E, valid_h = five_point_essential(x0[..., :2], x1[..., :2])
        E = E.reshape(-1, 3, 3)  # (S*10, 3, 3)
        valid_h = valid_h.reshape(-1)
    else:
        E = eight_point_essential(x0, x1)  # (S, 3, 3)
        valid_h = jnp.ones(E.shape[0], bool)
    err = sampson_distance(rays0[None], rays1[None], E)  # (S', N)
    err = jnp.nan_to_num(err, nan=jnp.inf, posinf=jnp.inf)
    err = jnp.where(valid[None], err, jnp.inf)
    score = jnp.sum(jnp.maximum(0.0, 1.0 - err / th2), axis=-1)
    score = jnp.where(valid_h, score, -1.0)
    best = jnp.argmax(score)
    E_best = E[best]

    def msac(Em):
        ee = sampson_distance(rays0[None], rays1[None], Em[None])[0]
        ee = jnp.nan_to_num(ee, nan=jnp.inf, posinf=jnp.inf)
        return jnp.sum(jnp.where(valid, jnp.maximum(0.0, 1.0 - ee / th2), 0.0))

    # Shrinking-threshold LO (Lebeda-style): wide first so near-threshold
    # inliers contribute, then tighten to th.
    th2_seq = jnp.geomspace(16.0 * th2, th2, max(lo_iters, 1))

    def lo_step(E_cur, th2_i):
        e = sampson_distance(rays0[None], rays1[None], E_cur[None])[0]
        e = jnp.nan_to_num(e, nan=jnp.inf, posinf=jnp.inf)
        w = jnp.where(valid & (e < th2_i), 1.0, 0.0)
        enough = w.sum() > 16.0
        E_new = eight_point_essential(rays0[None], rays1[None], w[None])[0]
        better = (msac(E_new) >= msac(E_cur)) & enough & jnp.all(jnp.isfinite(E_new))
        return jnp.where(better, E_new, E_cur), None

    E_ref, _ = jax.lax.scan(lo_step, E_best, th2_seq)
    e_fin = sampson_distance(rays0[None], rays1[None], E_ref[None])[0]
    e_fin = jnp.nan_to_num(e_fin, nan=jnp.inf, posinf=jnp.inf)
    inliers = valid & (e_fin < th2)
    R, t = recover_pose_from_essential(E_ref, rays0, rays1, inliers)
    # Nonlinear 5-dof Gauss-Newton on the Sampson error (PoseLib's 'bundle'
    # refinement analogue) — the algebraic 8-point LO alone leaves several
    # degrees of translation-direction error at realistic noise.
    w = jnp.where(inliers, 1.0 / (1.0 + e_fin / th2), 0.0)
    R, t = refine_pose_sampson(R, t, rays0, rays1, w, iters=8)
    from ...geometry.utils import skew_symmetric

    E_ref = skew_symmetric(t[None])[0] @ R
    e_fin = sampson_distance(rays0[None], rays1[None], E_ref[None])[0]
    e_fin = jnp.nan_to_num(e_fin, nan=jnp.inf, posinf=jnp.inf)
    inliers = valid & (e_fin < th2)
    final_score = inliers.sum() / jnp.maximum(valid.sum(), 1)
    return E_ref, R, t, inliers, final_score


class RelativePoseEstimator(BaseEstimator):
    """conf: ransac_th in PIXELS (converted to normalized units by the mean
    focal length, as the reference estimators do —
    relative_pose/opencv.py:19-24)."""

    default_conf = {
        "ransac_th": 2.0,
        "num_hypotheses": 512,  # 5pt yields up to 10 candidates per sample
        "lo_iters": 6,
        "minimal_solver": "5pt",  # "5pt" (Nister-class) | "8pt"
        "seed": 0,
    }

    def _forward(self, data: dict) -> dict:
        camera0: Camera = data["camera0"]
        camera1: Camera = data["camera1"]
        kpts0 = jnp.asarray(data["m_kpts0"], jnp.float32)
        kpts1 = jnp.asarray(data["m_kpts1"], jnp.float32)
        valid = data.get("valid")
        if valid is None:
            valid = jnp.ones(kpts0.shape[0], bool)
        else:
            valid = jnp.asarray(valid, bool)
        rays0 = camera0.image2cam(kpts0[None])[0]
        rays1 = camera1.image2cam(kpts1[None])[0]
        f_mean = float(
            np.asarray(jnp.mean(jnp.concatenate([camera0.f.ravel(), camera1.f.ravel()])))
        )
        th_norm = float(self.conf.ransac_th) / f_mean
        key = jax.random.key(self.conf.seed)
        E, R, t, inliers, score = ransac_essential(
            rays0, rays1, valid, key,
            th=th_norm,
            num_hypotheses=int(self.conf.num_hypotheses),
            lo_iters=int(self.conf.lo_iters),
            minimal_solver=str(self.conf.minimal_solver),
        )
        n_inl = int(np.asarray(inliers.sum()))
        return {
            "success": n_inl >= 8,
            "M_0to1": Pose.from_Rt(R, t),
            "E": E,
            "inliers": inliers,
            "score": float(np.asarray(score)),
        }


__main_estimator__ = RelativePoseEstimator
