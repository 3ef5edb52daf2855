"""Batched essential-matrix solving, triangulation, and pose recovery — the
device-side replacement for PoseLib/OpenCV findEssentialMat + recoverPose
(reference: gluefactory/robust_estimators/relative_pose/*.py, SURVEY.md §2.9).

All inputs are normalized camera coordinates (unit-plane rays)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .epipolar import decompose_essential_matrix
from .utils import to_homogeneous


def eight_point_essential(
    x0: jnp.ndarray, x1: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Weighted 8-point algorithm: (..., N, 2|3) x2 -> (..., 3, 3) essential
    matrices with x1^T E x0 = 0, rank-2/equal-singular-value constraints
    enforced by SVD projection. Batches as one 9x9 eigendecomposition."""
    if x0.shape[-1] == 2:
        x0 = to_homogeneous(x0)
    if x1.shape[-1] == 2:
        x1 = to_homogeneous(x1)
    if weights is None:
        weights = jnp.ones(x0.shape[:-1], dtype=x0.dtype)
    # Row i: kron(x0_i, x1_i) so that A @ vec(E) = 0 with E in x1^T E x0.
    a = (x1[..., :, None] * x0[..., None, :]).reshape(*x0.shape[:-1], 9)
    AtA = jnp.einsum("...ni,...n,...nj->...ij", a, weights, a)
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[..., :, 0].reshape(*AtA.shape[:-2], 3, 3)
    # Project onto the essential manifold: singular values -> (1, 1, 0).
    U, s, Vt = jnp.linalg.svd(E)
    d = jnp.zeros_like(s).at[..., 0].set(1.0).at[..., 1].set(1.0)
    E = U @ (d[..., :, None] * Vt)
    return E


def sampson_distance(x0: jnp.ndarray, x1: jnp.ndarray, E: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error (..., N) in normalized coords."""
    if x0.shape[-1] == 2:
        x0 = to_homogeneous(x0)
    if x1.shape[-1] == 2:
        x1 = to_homogeneous(x1)
    Ex0 = jnp.einsum("...ij,...nj->...ni", E, x0)
    Etx1 = jnp.einsum("...ji,...nj->...ni", E, x1)
    x1Ex0 = jnp.einsum("...ni,...ni->...n", x1, Ex0)
    denom = Ex0[..., 0] ** 2 + Ex0[..., 1] ** 2 + Etx1[..., 0] ** 2 + Etx1[..., 1] ** 2
    return x1Ex0**2 / (denom + 1e-15)


def triangulate_depths(
    r0: jnp.ndarray, r1: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form two-view depths for rays r0 (view 0) and r1 (view 1) under
    x1 = R x0 + t: solve min ||s*R r0 + t - u*r1||^2 for (s, u) via the 2x2
    normal equations. Returns (s, u), each (..., N)."""
    Rr0 = jnp.einsum("...ij,...nj->...ni", R, r0)
    a = jnp.sum(Rr0 * Rr0, axis=-1)
    b = -jnp.sum(Rr0 * r1, axis=-1)
    c = jnp.sum(r1 * r1, axis=-1)
    d = -jnp.sum(Rr0 * t[..., None, :], axis=-1)
    e = jnp.sum(r1 * t[..., None, :], axis=-1)
    # Normal equations: [a b; b c] [s; u] = [d; e], solved by Cramer's rule
    # (a = |R r0|^2, b = -R r0 . r1, c = |r1|^2, d = -R r0 . t, e = r1 . t).
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    s = (d * c - b * e) / det
    u = (a * e - b * d) / det
    return s, u


def recover_pose_from_essential(
    E: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    valid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Choose the (R, t) candidate with maximal cheirality support
    (≙ cv2.recoverPose; reference relative_pose/opencv.py:10-40).

    E (3, 3); x0/x1 (N, 2|3) normalized coords; valid (N,).
    Returns (R (3, 3), t (3,))."""
    if x0.shape[-1] == 2:
        x0 = to_homogeneous(x0)
    if x1.shape[-1] == 2:
        x1 = to_homogeneous(x1)
    Rs, t = decompose_essential_matrix(E)  # (2, 3, 3), (3,)
    cands_R = jnp.stack([Rs[0], Rs[0], Rs[1], Rs[1]], axis=0)  # (4, 3, 3)
    cands_t = jnp.stack([t, -t, t, -t], axis=0)  # (4, 3)
    s, u = triangulate_depths(x0[None], x1[None], cands_R, cands_t)  # (4, N)
    support = jnp.sum((s > 0) & (u > 0) & valid[None], axis=-1)  # (4,)
    best = jnp.argmax(support)
    return cands_R[best], cands_t[best]


# ---------------------------------------------------------------------------
# Batched 5-point (Nister-class) minimal solver
# ---------------------------------------------------------------------------
#
# TPU-first formulation (replaces PoseLib's C++ Nister solver, reference
# robust_estimators/relative_pose/poselib.py:9-31): instead of the classic
# symbolic Gauss-Jordan + companion-matrix eigendecomposition (nonsymmetric
# eig is unsupported on TPU), we use a *numeric hidden-variable resultant*:
#
#   1. nullspace X,Y,Z,W of the 5x9 epipolar system (batched SVD);
#      E(x,y,z) = xX + yY + zZ + W.
#   2. The 10 cubic constraints (det E = 0 and 2 E E^T E - tr(E E^T) E = 0)
#      are polynomials in (x,y,z) over the 20 degree<=3 monomials. Their
#      coefficients are recovered NUMERICALLY: evaluate each constraint at 20
#      fixed sample points and multiply by a precomputed inverse Vandermonde
#      (exact, no symbolic expansion to maintain).
#   3. Hiding z: group the 20 monomials by their (x, y) part -> a 10x10
#      matrix A(z) with entries polynomial in z (degree <= 3). Solutions
#      require det A(z) = 0.
#   4. Real roots of det A(z): sign changes of the determinant on a
#      tan(theta) grid covering the real line, then fixed-iteration
#      bisection — batched 10x10 determinants, no eigensolver.
#   5. For each root, the nullvector of A(z*) (batched SVD) yields the
#      remaining (x, y) monomials -> E candidate.
#
# Everything is static-shape and vmaps over hypotheses; up to 10 candidate
# essential matrices per 5-point sample, with a validity mask.

import numpy as _np

_MONOMIALS_3 = [
    (a, b, c)
    for a in range(4)
    for b in range(4 - a)
    for c in range(4 - a - b)
]  # 20 monomials x^a y^b z^c, a+b+c <= 3
_XY_MONOMIALS = sorted({(a, b) for (a, b, _c) in _MONOMIALS_3})  # 10


def _make_vandermonde_inv():
    rng = _np.random.default_rng(1234)
    for _ in range(100):
        pts = rng.normal(size=(20, 3))
        V = _np.stack(
            [
                _np.prod(pts ** _np.asarray(m, float), axis=-1)
                for m in _MONOMIALS_3
            ],
            axis=-1,
        )  # (20 points, 20 monomials)
        if _np.linalg.cond(V) < 1e4:
            return pts, _np.linalg.inv(V)
    raise RuntimeError("could not build a well-conditioned monomial basis")


_FP_PTS, _FP_VINV = _make_vandermonde_inv()
# map 20 monomial coeffs -> (10 xy-groups, 4 z-powers) scatter layout
_GROUP_IDX = _np.zeros((20, 2), _np.int64)
for _i, (_a, _b, _c) in enumerate(_MONOMIALS_3):
    _GROUP_IDX[_i] = (_XY_MONOMIALS.index((_a, _b)), _c)
_XY_DEG = _np.asarray([3 - a - b for (a, b) in _XY_MONOMIALS], _np.float32)
_IDX_ONE = _XY_MONOMIALS.index((0, 0))
_IDX_X = _XY_MONOMIALS.index((1, 0))
_IDX_Y = _XY_MONOMIALS.index((0, 1))


def _essential_constraints(E: jnp.ndarray) -> jnp.ndarray:
    """det(E) and the 9 trace-constraint entries -> (..., 10)."""
    det = jnp.linalg.det(E)
    EEt = E @ jnp.swapaxes(E, -1, -2)
    tr = jnp.trace(EEt, axis1=-2, axis2=-1)
    C = 2.0 * (EEt @ E) - tr[..., None, None] * E
    return jnp.concatenate([det[..., None], C.reshape(*E.shape[:-2], 9)], -1)


def five_point_essential(
    x0: jnp.ndarray, x1: jnp.ndarray, grid_size: int = 128, bisect_iters: int = 40
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Minimal 5-point solver: (..., 5, 2|3) x2 -> up to 10 essential
    matrices (..., 10, 3, 3) with x1^T E x0 = 0 and a validity mask
    (..., 10)."""
    if x0.shape[-1] == 2:
        x0 = to_homogeneous(x0)
    if x1.shape[-1] == 2:
        x1 = to_homogeneous(x1)
    batch = x0.shape[:-2]
    a = (x1[..., :, None] * x0[..., None, :]).reshape(*batch, 5, 9)
    # nullspace: right-singular vectors for the 4 smallest singular values
    _, _, Vt = jnp.linalg.svd(a, full_matrices=True)
    basis = Vt[..., 5:9, :]  # (..., 4, 9) = X, Y, Z, W
    XYZW = basis.reshape(*batch, 4, 3, 3)

    # constraint coefficients over the 20-monomial basis via fixed-point fit
    pts = jnp.asarray(_FP_PTS, x0.dtype)  # (20, 3)
    coef_xyzw = jnp.concatenate(
        [pts, jnp.ones((20, 1), x0.dtype)], axis=-1
    )  # (20, 4): weights of X, Y, Z, W at each sample point
    E_pts = jnp.einsum("pk,...kij->...pij", coef_xyzw, XYZW)
    F = _essential_constraints(E_pts)  # (..., 20 points, 10 constraints)
    F = jnp.swapaxes(F, -1, -2)  # (..., 10 constraints, 20 points)
    coeffs = F @ jnp.asarray(_FP_VINV, x0.dtype).T  # (..., 10, 20 monomials)
    # normalize constraint rows for determinant conditioning
    coeffs = coeffs / (
        jnp.linalg.norm(coeffs, axis=-1, keepdims=True) + 1e-12
    )
    # regroup: (..., 10 constraints, 10 xy-groups, 4 z-powers)
    grouped = jnp.zeros((*coeffs.shape[:-1], 10, 4), coeffs.dtype)
    grouped = grouped.at[..., _GROUP_IDX[:, 0], _GROUP_IDX[:, 1]].set(coeffs)

    def detA(z):
        """det of the hidden-variable matrix at z (..., Z)."""
        zp = jnp.stack([jnp.ones_like(z), z, z * z, z**3], -1)  # (..., Z, 4)
        A = jnp.einsum("...cgp,...zp->...zcg", grouped, zp)
        # column scaling keeps determinants O(1) for large |z|
        scale = (1.0 + jnp.abs(z))[..., None] ** jnp.asarray(_XY_DEG, z.dtype)
        return jnp.linalg.det(A / scale[..., None, :])

    eps = 1e-3
    theta = jnp.linspace(-_np.pi / 2 + eps, _np.pi / 2 - eps, grid_size)
    zgrid = jnp.tan(theta)
    d = detA(jnp.broadcast_to(zgrid, (*batch, grid_size)))
    sign_change = jnp.sign(d[..., :-1]) * jnp.sign(d[..., 1:]) < 0  # (..., G-1)
    # first 10 bracketed roots (stable order)
    order = jnp.argsort(~sign_change, axis=-1, stable=True)[..., :10]
    has_root = jnp.take_along_axis(sign_change, order, axis=-1)
    zl = jnp.take_along_axis(
        jnp.broadcast_to(zgrid[:-1], sign_change.shape), order, axis=-1
    )
    zr = jnp.take_along_axis(
        jnp.broadcast_to(zgrid[1:], sign_change.shape), order, axis=-1
    )
    fl = jnp.take_along_axis(d[..., :-1], order, axis=-1)

    def bisect(carry, _):
        zl, zr, fl = carry
        zm = 0.5 * (zl + zr)
        fm = detA(zm)
        left = jnp.sign(fm) == jnp.sign(fl)
        zl = jnp.where(left, zm, zl)
        fl = jnp.where(left, fm, fl)
        zr = jnp.where(left, zr, zm)
        return (zl, zr, fl), None

    (zl, zr, _), _ = jax.lax.scan(bisect, (zl, zr, fl), None, length=bisect_iters)
    z_root = 0.5 * (zl + zr)  # (..., 10)

    # nullvector of A(z*) -> xy monomials -> (x, y)
    zp = jnp.stack([jnp.ones_like(z_root), z_root, z_root**2, z_root**3], -1)
    A_root = jnp.einsum("...cgp,...rp->...rcg", grouped, zp)  # (..., 10, 10, 10)
    _, s_min, Vt_r = jnp.linalg.svd(A_root)
    v = Vt_r[..., -1, :]  # (..., 10 roots, 10 xy monomials)
    denom = v[..., _IDX_ONE]
    ok_denom = jnp.abs(denom) > 1e-6
    denom = jnp.where(ok_denom, denom, 1.0)
    x = v[..., _IDX_X] / denom
    y = v[..., _IDX_Y] / denom
    xyzw = jnp.stack([x, y, z_root, jnp.ones_like(x)], -1)  # (..., 10, 4)
    E = jnp.einsum("...rk,...kij->...rij", xyzw, XYZW)
    E = E / (jnp.linalg.norm(E, axis=(-2, -1), keepdims=True) + 1e-12)
    valid = has_root & ok_denom & jnp.isfinite(E).all((-2, -1))
    return E, valid


# ---------------------------------------------------------------------------
# Nonlinear pose refinement (the PoseLib 'bundle refinement' analogue)
# ---------------------------------------------------------------------------


def _sampson_residual(E, x0, x1):
    """Signed first-order geometric residual (N,) — sqrt of sampson_distance
    with sign, suitable for least squares."""
    Ex0 = jnp.einsum("ij,nj->ni", E, x0)
    Etx1 = jnp.einsum("ji,nj->ni", E, x1)
    x1Ex0 = jnp.einsum("ni,ni->n", x1, Ex0)
    denom = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return x1Ex0 / jnp.sqrt(denom + 1e-15)


def refine_pose_sampson(
    R: jnp.ndarray,
    t: jnp.ndarray,
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 8,
    damping: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Damped Gauss-Newton on the weighted Sampson error over the 5-dof
    relative pose (so(3) x unit-sphere tangent), the on-device equivalent of
    PoseLib's LM bundle refinement step that the algebraic 8-point LO lacks
    (reference relative_pose/poselib.py — 'bundle' option). x0/x1 (N, 2|3)
    normalized coords; weights (N,) >= 0 (0 = ignore)."""
    from .utils import skew_symmetric, so3exp_map

    if x0.shape[-1] == 2:
        x0 = to_homogeneous(x0)
    if x1.shape[-1] == 2:
        x1 = to_homogeneous(x1)

    def tangent_basis(t):
        a = jnp.where(jnp.abs(t[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]),
                      jnp.array([0.0, 1.0, 0.0]))
        b1 = jnp.cross(t, a)
        b1 = b1 / (jnp.linalg.norm(b1) + 1e-12)
        b2 = jnp.cross(t, b1)
        return jnp.stack([b1, b2], axis=-1)  # (3, 2)

    def step(carry, _):
        R, t = carry
        B = tangent_basis(t)

        def residuals(delta):
            R_new = R @ so3exp_map(delta[:3][None])[0]
            t_new = t + B @ delta[3:5]
            t_new = t_new / (jnp.linalg.norm(t_new) + 1e-12)
            E = skew_symmetric(t_new[None])[0] @ R_new
            return _sampson_residual(E, x0, x1)

        zero = jnp.zeros(5, x0.dtype)
        r = residuals(zero)
        J = jax.jacfwd(residuals)(zero)  # (N, 5)
        Jw = J * weights[:, None]
        H = J.T @ Jw + damping * jnp.eye(5, dtype=x0.dtype)
        g = Jw.T @ r
        delta = -jnp.linalg.solve(H, g)
        # accept only improving steps (cheap trust region)
        new_cost = jnp.sum(weights * residuals(delta) ** 2)
        old_cost = jnp.sum(weights * r**2)
        ok = (new_cost < old_cost) & jnp.all(jnp.isfinite(delta))
        R_new = R @ so3exp_map(jnp.where(ok, delta[:3], 0.0)[None])[0]
        t_new = t + B @ jnp.where(ok, delta[3:5], 0.0)
        t_new = t_new / (jnp.linalg.norm(t_new) + 1e-12)
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t
