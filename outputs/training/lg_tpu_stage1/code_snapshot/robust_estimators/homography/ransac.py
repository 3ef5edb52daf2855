"""Batched TPU LO-RANSAC for homography estimation.

Replaces the reference's external C++ RANSAC wheels
(gluefactory/robust_estimators/homography/{opencv,poselib,homography_est}.py):
instead of a sequential hypothesize-verify loop on the host, ALL hypotheses
are generated and scored at once on device:

  1. sample S minimal 4-point subsets with one jax.random call,
  2. solve S DLTs as one batched 9x9 eigendecomposition (geometry/homography),
  3. score all S x N symmetric reprojection residuals with one einsum-shaped
     pass (MSAC truncated-quadratic scoring),
  4. pick the best hypothesis and run iteratively-reweighted DLT local
     optimization on its inlier set (the LO step that gives PoseLib-class
     accuracy, SURVEY.md §7.3.1).

Everything is static-shape and jittable; invalid (padded) correspondences are
weight-zeroed."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...geometry.homography import compute_homography, sym_homography_error
from ..base_estimator import BaseEstimator


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "lo_iters"))
def ransac_homography(
    kpts0: jnp.ndarray,
    kpts1: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    th: float,
    num_hypotheses: int = 1024,
    lo_iters: int = 4,
):
    """kpts0/1 (N, 2), valid (N,) -> (H (3,3), inliers (N,), score ())."""
    n = kpts0.shape[0]
    nvalid = jnp.maximum(valid.sum(), 1)
    # --- 1. minimal sample indices, biased to valid entries ----------------
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, num_hypotheses)
    sample_idx = jax.vmap(
        lambda k: jax.random.categorical(k, logits, shape=(4,))
    )(keys)  # (S, 4)
    p0 = kpts0[sample_idx]  # (S, 4, 2)
    p1 = kpts1[sample_idx]
    # Degenerate samples (repeated points) yield garbage H that simply scores
    # badly — no special-casing needed.
    # --- 2. batched minimal solve -----------------------------------------
    H = compute_homography(p0, p1)  # (S, 3, 3)
    # --- 3. MSAC scoring ---------------------------------------------------
    err = sym_homography_error(kpts0[None], kpts1[None], H)  # (S, N)
    err = jnp.where(valid[None], err, jnp.inf)
    err = jnp.nan_to_num(err, nan=jnp.inf, posinf=jnp.inf)
    score = jnp.sum(jnp.maximum(0.0, 1.0 - (err / th) ** 2), axis=-1)  # (S,)
    best = jnp.argmax(score)
    H_best = H[best]

    # --- 4. local optimization: iteratively reweighted DLT with a shrinking
    # inlier threshold (Lebeda-style LO-RANSAC: start wide at 4x th so noisy
    # inliers near the threshold are not truncated away, shrink toward th).
    def msac(Hm):
        ee = sym_homography_error(kpts0[None], kpts1[None], Hm[None])[0]
        ee = jnp.nan_to_num(ee, nan=jnp.inf, posinf=jnp.inf)
        return jnp.sum(jnp.where(valid, jnp.maximum(0.0, 1.0 - (ee / th) ** 2), 0.0))

    th_seq = jnp.geomspace(4.0 * th, th, max(lo_iters, 1))

    def lo_step(H_cur, th_i):
        e = sym_homography_error(kpts0[None], kpts1[None], H_cur[None])[0]
        e = jnp.nan_to_num(e, nan=jnp.inf, posinf=jnp.inf)
        w = jnp.where(valid & (e < th_i), 1.0, 0.0)
        enough = w.sum() > 8.0
        H_new = compute_homography(kpts0[None], kpts1[None], w[None])[0]
        ok = jnp.all(jnp.isfinite(H_new)) & enough & (msac(H_new) >= msac(H_cur))
        return jnp.where(ok, H_new, H_cur), None

    H_ref, _ = jax.lax.scan(lo_step, H_best, th_seq)
    e_fin = sym_homography_error(kpts0[None], kpts1[None], H_ref[None])[0]
    e_fin = jnp.nan_to_num(e_fin, nan=jnp.inf, posinf=jnp.inf)
    inliers = valid & (e_fin < th)
    final_score = inliers.sum() / nvalid
    return H_ref, inliers, final_score


class HomographyEstimator(BaseEstimator):
    """conf: ransac_th (px), num_hypotheses, lo_iters, seed."""

    default_conf = {
        "ransac_th": 3.0,
        "num_hypotheses": 1024,
        "lo_iters": 4,
        "seed": 0,
    }

    def _forward(self, data: dict) -> dict:
        kpts0 = jnp.asarray(data["m_kpts0"], jnp.float32)
        kpts1 = jnp.asarray(data["m_kpts1"], jnp.float32)
        valid = data.get("valid")
        if valid is None:
            valid = jnp.ones(kpts0.shape[0], bool)
        else:
            valid = jnp.asarray(valid, bool)
        key = jax.random.key(self.conf.seed)
        H, inliers, score = ransac_homography(
            kpts0, kpts1, valid, key,
            th=float(self.conf.ransac_th),
            num_hypotheses=int(self.conf.num_hypotheses),
            lo_iters=int(self.conf.lo_iters),
        )
        n_inl = int(np.asarray(inliers.sum()))
        return {
            "success": n_inl >= 4 and bool(np.isfinite(np.asarray(H)).all()),
            "M_0to1": H,
            "inliers": inliers,
            "score": float(np.asarray(score)),
        }


__main_estimator__ = HomographyEstimator
