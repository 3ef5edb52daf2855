"""Hybrid point+line homography LO-RANSAC
(replaces the reference's homography_est C++ wheel,
gluefactory/robust_estimators/homography/homography_est.py:14-45 /
SURVEY.md §2.9).

Hypotheses come from 4-point minimal samples (batched DLT); scoring and the
shrinking-threshold local optimization use BOTH point reprojection errors and
line constraints: a matched line contributes two point-on-line residuals —
each endpoint of the view-0 segment, warped by H, must lie on the infinite
line of its view-1 partner. The LO refit solves the joint weighted DLT: point
rows kron(x0, [x1]_skew-style) plus line rows kron(e0, l1) for endpoints e0
and normalized target lines l1, all in one 9x9 eigenproblem."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...geometry.homography import _normalize_pts, compute_homography, sym_homography_error
from ...geometry.utils import to_homogeneous
from ..base_estimator import BaseEstimator


def line_coeffs(segs: jnp.ndarray) -> jnp.ndarray:
    """(..., L, 2, 2) segments -> normalized homogeneous lines (..., L, 3)."""
    p0 = to_homogeneous(segs[..., 0, :])
    p1 = to_homogeneous(segs[..., 1, :])
    l = jnp.cross(p0, p1)
    n = jnp.linalg.norm(l[..., :2], axis=-1, keepdims=True)
    return l / jnp.maximum(n, 1e-8)


def point_on_line_residual(segs0: jnp.ndarray, l1: jnp.ndarray, H: jnp.ndarray):
    """|l1 . (H e0)| for both endpoints -> (..., L) mean distance in px."""
    e = to_homogeneous(segs0.reshape(*segs0.shape[:-3], -1, 2))  # (..., 2L, 3)
    He = jnp.einsum("...ij,...nj->...ni", H, e)
    He = He / jnp.maximum(jnp.abs(He[..., 2:3]), 1e-8)
    d = jnp.abs(jnp.einsum("...ni,...ni->...n", He,
                           jnp.repeat(l1, 2, axis=-2)))
    shp = d.shape[:-1] + (segs0.shape[-3], 2)
    return d.reshape(shp).mean(-1)


def joint_dlt(pts0, pts1, w_pts, segs0, segs1, l1, w_lines):
    """Weighted DLT over point correspondences + endpoint-on-line rows.

    Hartley normalization of BOTH views uses points AND selected line
    endpoints. View 1 MUST be normalized from the line endpoints when no
    point carries weight: with T1=identity the line rows kron(e0n, l1) mix
    Hartley-scale endpoints with image-frame line coefficients (offsets of
    hundreds of px), and the f32 9x9 eigensolve loses the solution —
    line-only fits returned ~1.4 px corner error on EXACT correspondences
    (the round-4 `H_error_lines = 0.0` root cause); normalized, the same
    fit is exact to <1e-2 px."""
    dtype = jnp.float32
    pts0 = pts0.astype(dtype)
    pts1 = pts1.astype(dtype)
    w_pts = w_pts.astype(dtype)
    w_lines = w_lines.astype(dtype)
    ends0 = segs0.reshape(*segs0.shape[:-3], -1, 2).astype(dtype)
    ends1 = segs1.reshape(*segs1.shape[:-3], -1, 2).astype(dtype)
    wl2_n = jnp.repeat(w_lines, 2, axis=-1)
    _, T0 = _normalize_pts(
        jnp.concatenate([pts0, ends0], axis=-2),
        jnp.concatenate([w_pts, wl2_n], axis=-1),
    )
    _, T1 = _normalize_pts(
        jnp.concatenate([pts1, ends1], axis=-2),
        jnp.concatenate([w_pts, wl2_n], axis=-1),
    )
    p0n = jnp.einsum(
        "...ij,...nj->...ni", T0, to_homogeneous(pts0))[..., :2]
    p1n = jnp.einsum(
        "...ij,...nj->...ni", T1, to_homogeneous(pts1))[..., :2]
    x0, y0 = p0n[..., 0], p0n[..., 1]
    x1, y1 = p1n[..., 0], p1n[..., 1]
    z = jnp.zeros_like(x0)
    o = jnp.ones_like(x0)
    r1 = jnp.stack([-x0, -y0, -o, z, z, z, x1 * x0, x1 * y0, x1], axis=-1)
    r2 = jnp.stack([z, z, z, -x0, -y0, -o, y1 * x0, y1 * y0, y1], axis=-1)
    A_pts = jnp.concatenate([r1, r2], axis=-2)
    w2 = jnp.concatenate([w_pts, w_pts], axis=-1)
    AtA = jnp.einsum("...ni,...n,...nj->...ij", A_pts, w2, A_pts)
    # line rows in NORMALIZED frames: l1' = T1^-T l1 (lines transform
    # contravariantly); endpoints e0' = T0 e0
    e0 = to_homogeneous(segs0.reshape(*segs0.shape[:-3], -1, 2))
    e0n = jnp.einsum("...ij,...nj->...ni", T0, e0)
    T1_invT = jnp.swapaxes(jnp.linalg.inv(T1), -1, -2)
    l1n = jnp.einsum("...ij,...nj->...ni", T1_invT, l1)
    l1n = l1n / jnp.maximum(jnp.linalg.norm(l1n[..., :2], axis=-1, keepdims=True), 1e-8)
    l1r = jnp.repeat(l1n, 2, axis=-2)  # per endpoint
    # row: kron(e0, l1): (l1 . H e0) = sum_ij l1_i H_ij e0_j; vec(H) order row-major
    rows = l1r[..., :, None] * e0n[..., None, :]
    rows = rows.reshape(*rows.shape[:-2], 9)
    wl = jnp.repeat(w_lines, 2, axis=-1)
    AtA = AtA + jnp.einsum("...ni,...n,...nj->...ij", rows, wl, rows)
    _, vecs = jnp.linalg.eigh(AtA)
    Hn = vecs[..., :, 0].reshape(*AtA.shape[:-2], 3, 3)
    H = jnp.linalg.inv(T1) @ Hn @ T0
    return H / (H[..., 2:3, 2:3] + 1e-12)


@functools.partial(jax.jit, static_argnames=("num_hypotheses", "lo_iters"))
def hybrid_ransac_homography(
    kpts0, kpts1, valid_pts, segs0, segs1, valid_lines, key,
    th: float, line_th: float, num_hypotheses: int = 1024, lo_iters: int = 4,
):
    l1 = line_coeffs(segs1)
    n, m = kpts0.shape[0], segs0.shape[0]
    # minimal sets are sampled from the UNION of point and line
    # correspondences (each unit contributes 2 DLT rows), so line-only and
    # mixed hypotheses work — a point-only sampler crashes with zero points
    # and can never estimate from segments alone
    unit_logits = jnp.concatenate(
        [jnp.where(valid_pts, 0.0, -1e9), jnp.where(valid_lines, 0.0, -1e9)]
    )
    keys = jax.random.split(key, num_hypotheses)
    sample_idx = jax.vmap(
        lambda k: jax.random.categorical(k, unit_logits, shape=(4,))
    )(keys)  # (K, 4) indices into points ++ lines
    onehot = jax.nn.one_hot(sample_idx, n + m).sum(axis=1)  # (K, n+m)
    wp = onehot[:, :n]
    wl = onehot[:, n:]
    H = joint_dlt(
        jnp.broadcast_to(kpts0, (num_hypotheses, n, 2)),
        jnp.broadcast_to(kpts1, (num_hypotheses, n, 2)),
        wp,
        jnp.broadcast_to(segs0, (num_hypotheses, m, 2, 2)),
        jnp.broadcast_to(segs1, (num_hypotheses, m, 2, 2)),
        jnp.broadcast_to(l1, (num_hypotheses, m, 3)),
        wl,
    )
    p_err = sym_homography_error(kpts0[None], kpts1[None], H)
    p_err = jnp.nan_to_num(jnp.where(valid_pts[None], p_err, jnp.inf), nan=jnp.inf)
    l_err = point_on_line_residual(segs0[None], l1[None], H)
    l_err = jnp.nan_to_num(jnp.where(valid_lines[None], l_err, jnp.inf), nan=jnp.inf)
    score = jnp.sum(jnp.maximum(0.0, 1.0 - (p_err / th) ** 2), axis=-1) + jnp.sum(
        jnp.maximum(0.0, 1.0 - (l_err / line_th) ** 2), axis=-1
    )
    best = jnp.argmax(score)
    H_best = H[best]

    def msac(Hm):
        pe = sym_homography_error(kpts0[None], kpts1[None], Hm[None])[0]
        pe = jnp.nan_to_num(pe, nan=jnp.inf, posinf=jnp.inf)
        le = point_on_line_residual(segs0[None], l1[None], Hm[None])[0]
        le = jnp.nan_to_num(le, nan=jnp.inf, posinf=jnp.inf)
        return jnp.sum(jnp.where(valid_pts, jnp.maximum(0.0, 1.0 - (pe / th) ** 2), 0.0)) + \
            jnp.sum(jnp.where(valid_lines, jnp.maximum(0.0, 1.0 - (le / line_th) ** 2), 0.0))

    th_seq = jnp.geomspace(4.0 * th, th, max(lo_iters, 1))

    def lo_step(H_cur, th_i):
        pe = sym_homography_error(kpts0[None], kpts1[None], H_cur[None])[0]
        pe = jnp.nan_to_num(pe, nan=jnp.inf, posinf=jnp.inf)
        le = point_on_line_residual(segs0[None], l1[None], H_cur[None])[0]
        le = jnp.nan_to_num(le, nan=jnp.inf, posinf=jnp.inf)
        wp = jnp.where(valid_pts & (pe < th_i), 1.0, 0.0)
        wl = jnp.where(valid_lines & (le < th_i * line_th / th), 1.0, 0.0)
        enough = wp.sum() + 2 * wl.sum() > 8.0
        H_new = joint_dlt(kpts0[None], kpts1[None], wp[None], segs0[None],
                          segs1[None], l1[None], wl[None])[0]
        ok = jnp.all(jnp.isfinite(H_new)) & enough & (msac(H_new) >= msac(H_cur))
        return jnp.where(ok, H_new, H_cur), None

    H_ref, _ = jax.lax.scan(lo_step, H_best, th_seq)
    pe = sym_homography_error(kpts0[None], kpts1[None], H_ref[None])[0]
    le = point_on_line_residual(segs0[None], l1[None], H_ref[None])[0]
    inl_p = valid_pts & (jnp.nan_to_num(pe, nan=jnp.inf) < th)
    inl_l = valid_lines & (jnp.nan_to_num(le, nan=jnp.inf) < line_th)
    return H_ref, inl_p, inl_l


class HybridHomographyEstimator(BaseEstimator):
    """Point+line homography (≙ homography_est's H_estimation_hybrid)."""

    default_conf = {
        "ransac_th": 3.0,
        "line_th": 3.0,
        "num_hypotheses": 1024,
        "lo_iters": 4,
        "seed": 0,
    }

    def _forward(self, data: dict) -> dict:
        kpts0 = jnp.asarray(data["m_kpts0"], jnp.float32)
        kpts1 = jnp.asarray(data["m_kpts1"], jnp.float32)
        valid = data.get("valid")
        valid = jnp.ones(kpts0.shape[0], bool) if valid is None else jnp.asarray(valid, bool)
        segs0 = data.get("m_lines0")
        segs1 = data.get("m_lines1")
        if segs0 is None:
            segs0 = jnp.zeros((1, 2, 2), jnp.float32)
            segs1 = jnp.zeros((1, 2, 2), jnp.float32)
            vlines = jnp.zeros((1,), bool)
        else:
            segs0 = jnp.asarray(segs0, jnp.float32)
            segs1 = jnp.asarray(segs1, jnp.float32)
            vlines = data.get("valid_lines")
            vlines = jnp.ones(segs0.shape[0], bool) if vlines is None else jnp.asarray(vlines, bool)
        H, inl_p, inl_l = hybrid_ransac_homography(
            kpts0, kpts1, valid, segs0, segs1, vlines, jax.random.key(self.conf.seed),
            th=float(self.conf.ransac_th), line_th=float(self.conf.line_th),
            num_hypotheses=int(self.conf.num_hypotheses),
            lo_iters=int(self.conf.lo_iters),
        )
        n_inl = int(np.asarray(inl_p.sum()) + np.asarray(inl_l.sum()))
        return {
            "success": n_inl >= 4 and bool(np.isfinite(np.asarray(H)).all()),
            "M_0to1": H,
            "inliers": inl_p,
            "line_inliers": inl_l,
        }


__main_estimator__ = HybridHomographyEstimator
