"""AdaLAM-style adaptive locally-affine match filtering.

(reference surface: gluefactory/models/matchers/adalam.py — an EMPTY stub in
the reference; the algorithm is AdaLAM, Cavalli et al., ECCV 2020. This is a
from-scratch TPU-first implementation, not a port of the kornia original,
which loops over seeds on the host.)

Filters putative matches by local geometric consistency:
  1. SEEDS: matches that are score maxima within a spatial radius r1 (batch
     radius-NMS on the matched kp0 positions), top-``num_seeds`` kept;
  2. NEIGHBORHOODS: for every seed, the ``neighbors`` nearest matches whose
     kp0 lies within r1 of the seed's kp0 AND whose kp1 lies within r2 of
     the seed's kp1 (both-side locality — the AdaLAM compatibility test);
  3. LOCAL AFFINE RANSAC: ``hypotheses`` minimal 3-match affine fits per
     seed (closed-form 3x3 solve), residuals scored on the whole
     neighborhood, inliers under an adaptive threshold tied to r2;
  4. VERDICT: a match survives if ANY seed's best hypothesis reaches
     ``min_inliers`` with the match among its inliers.

Everything is one batched (B, S, T, K) computation — no per-seed loops, no
dynamic shapes: masked neighborhoods instead of ragged gathers, masked
hypothesis sampling instead of rejection sampling. Runs in the
TwoViewPipeline ``filter`` slot (same contract as matchers.match_refiner) on
top of any matcher's ``matches0``.
"""

from __future__ import annotations

from typing import ClassVar

import jax
import jax.numpy as jnp

from ..base_model import BaseModel


def _pairwise_d2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 2), (B, M, 2) -> (B, N, M) squared distances."""
    return jnp.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)


def _solve_affine(p0: jnp.ndarray, p1: jnp.ndarray) -> jnp.ndarray:
    """Exact affine from 3 correspondences. p0/p1 (..., 3, 2) ->
    (..., 2, 3) mapping [x, y, 1] -> (x', y')."""
    ones = jnp.ones((*p0.shape[:-1], 1), p0.dtype)
    A = jnp.concatenate([p0, ones], axis=-1)  # (..., 3, 3)
    # regularized solve keeps degenerate (collinear) samples finite; their
    # hypotheses simply score few inliers
    eye = jnp.eye(3, dtype=p0.dtype) * 1e-4
    AtA = jnp.swapaxes(A, -1, -2) @ A + eye
    X = jnp.linalg.solve(AtA, jnp.swapaxes(A, -1, -2) @ p1)  # (..., 3, 2)
    return jnp.swapaxes(X, -1, -2)


class AdaLAM(BaseModel):
    default_conf: ClassVar[dict] = {
        "num_seeds": 64,
        "neighbors": 48,
        "hypotheses": 16,
        # radii as fractions of the image diagonal (AdaLAM's area-based
        # radii: r1 on the anchor image, r2 on the target image)
        "r1": 0.15,
        "r2": 0.15,
        "inlier_th": 0.15,  # fraction of r2*diag -> residual threshold
        "min_inliers": 6,
        "seed": 0,
    }
    required_data_keys: ClassVar[list] = [
        "keypoints0", "keypoints1", "matches0", "matching_scores0",
    ]

    def _forward(self, data: dict) -> dict:
        conf = self.conf
        kp0, kp1 = data["keypoints0"], data["keypoints1"]
        m0 = data["matches0"]
        ms0 = data["matching_scores0"]
        b, n = m0.shape
        valid = m0 > -1
        tgt = jnp.take_along_axis(kp1, jnp.clip(m0, 0, None)[..., None], axis=1)

        size = data.get("view0", {}).get("image_size")
        if size is not None:
            diag = jnp.linalg.norm(size, axis=-1)[:, None]  # (B, 1)
        else:
            span = jnp.max(kp0, axis=1) - jnp.min(kp0, axis=1)
            diag = jnp.linalg.norm(span, axis=-1)[:, None]
        r1 = float(conf.r1) * diag
        r2 = float(conf.r2) * diag
        score = jnp.where(valid, ms0, -jnp.inf)

        # ---- 1. seeds: radius-NMS maxima of the match score ---------------
        d2_00 = _pairwise_d2(kp0, kp0)  # (B, N, N)
        near = d2_00 < (r1[..., None] ** 2)
        stronger = (score[:, None, :] > score[:, :, None]) | (
            (score[:, None, :] == score[:, :, None])
            & (jnp.arange(n)[None, :] < jnp.arange(n)[:, None])[None]
        )
        dominated = jnp.any(near & stronger & valid[:, None, :], axis=-1)
        seed_score = jnp.where(valid & ~dominated, score, -jnp.inf)
        S = int(conf.num_seeds)
        seed_idx = jnp.argsort(-seed_score, axis=-1)[:, :S]  # (B, S)
        seed_ok = jnp.take_along_axis(seed_score, seed_idx, axis=1) > -jnp.inf

        # ---- 2. neighborhoods: both-side locality wrt each seed -----------
        s_kp0 = jnp.take_along_axis(kp0, seed_idx[..., None], axis=1)
        s_tgt = jnp.take_along_axis(tgt, seed_idx[..., None], axis=1)
        d2_s0 = _pairwise_d2(s_kp0, kp0)  # (B, S, N)
        d2_s1 = _pairwise_d2(s_tgt, tgt)
        compat = (
            valid[:, None, :]
            & (d2_s0 < (r1[..., None] ** 2))
            & (d2_s1 < (r2[..., None] ** 2))
        )
        K = int(conf.neighbors)
        nb_rank = jnp.where(compat, d2_s0, jnp.inf)
        nb_idx = jnp.argsort(nb_rank, axis=-1)[..., :K]  # (B, S, K)
        nb_ok = jnp.take_along_axis(compat, nb_idx, axis=-1)  # (B, S, K)
        nb_p0 = jnp.take_along_axis(
            kp0[:, None, :, :].repeat(S, 1), nb_idx[..., None], axis=2)
        nb_p1 = jnp.take_along_axis(
            tgt[:, None, :, :].repeat(S, 1), nb_idx[..., None], axis=2)

        # ---- 3. batched local affine RANSAC -------------------------------
        T = int(conf.hypotheses)
        key = jax.random.key(int(conf.seed))
        # sample 3 distinct-ish neighbor slots per hypothesis; weight valid
        # slots so padded neighbors are rarely drawn (a degenerate draw just
        # wastes one hypothesis)
        logits = jnp.where(nb_ok, 0.0, -1e9)  # (B, S, K)
        draw = jax.random.categorical(
            key, logits[:, :, None, None, :], axis=-1,
            shape=(b, S, T, 3))  # (B, S, T, 3)
        tri_p0 = jnp.take_along_axis(
            nb_p0[:, :, None].repeat(T, 2), draw[..., None], axis=3)
        tri_p1 = jnp.take_along_axis(
            nb_p1[:, :, None].repeat(T, 2), draw[..., None], axis=3)
        A = _solve_affine(tri_p0, tri_p1)  # (B, S, T, 2, 3)
        ones = jnp.ones((b, S, K, 1), kp0.dtype)
        hom0 = jnp.concatenate([nb_p0, ones], axis=-1)  # (B, S, K, 3)
        proj = jnp.einsum("bstij,bskj->bstki", A, hom0)  # (B, S, T, K, 2)
        res = jnp.linalg.norm(proj - nb_p1[:, :, None], axis=-1)
        tau = float(conf.inlier_th) * r2[..., None, None]  # (B, 1|S, 1, 1)
        inl = (res < tau) & nb_ok[:, :, None, :]  # (B, S, T, K)
        n_inl = inl.sum(-1)  # (B, S, T)
        best_t = jnp.argmax(n_inl, axis=-1)  # (B, S)
        best_n = jnp.take_along_axis(n_inl, best_t[..., None], axis=-1)[..., 0]
        best_inl = jnp.take_along_axis(
            inl, best_t[..., None, None], axis=2)[:, :, 0]  # (B, S, K)

        # ---- 4. verdict: inlier of any confident seed ---------------------
        seed_conf = seed_ok & (best_n >= int(conf.min_inliers))  # (B, S)
        keep_vote = best_inl & seed_conf[..., None]  # (B, S, K)
        keep = jnp.zeros((b, n), bool)
        flat = (jnp.arange(b)[:, None, None] * n + nb_idx).reshape(-1)
        keep = keep.reshape(-1).at[flat].max(
            keep_vote.reshape(-1)).reshape(b, n)
        keep = keep & valid

        new_m0 = jnp.where(keep, m0, -1)
        # rebuild matches1 from the surviving forward assignment
        m1 = data.get("matches1")
        if m1 is not None:
            # out-of-bounds sentinel + mode="drop": removed matches write
            # nowhere (clipping would clobber the last slot instead)
            kept_tgt = jnp.where(keep, m0, m1.shape[1])
            m1_new = jnp.full_like(m1, -1)
            src = jnp.arange(n)[None].repeat(b, 0)
            m1_new = m1_new.at[
                jnp.arange(b)[:, None], kept_tgt
            ].set(src, mode="drop")
        out = {
            "matches0": new_m0,
            "matching_scores0": jnp.where(keep, ms0, 0.0),
            "adalam_seeds": seed_idx,
            "adalam_kept": keep.sum(-1),
        }
        if m1 is not None:
            out["matches1"] = m1_new
            out["matching_scores1"] = jnp.where(
                m1_new > -1, data.get("matching_scores1", 0.0), 0.0)
        return out

    def loss(self, pred, data):
        raise NotImplementedError


__main_model__ = AdaLAM
