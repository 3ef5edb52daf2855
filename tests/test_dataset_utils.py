"""datasets/utils intrinsics-rotation suite (reference datasets/utils.py):
exactness is verified by projecting 3-D points through the rotated
camera/pose and comparing with the rotated pixel coordinates."""

import numpy as np

from gluefactory_tpu.datasets.utils import (
    crop,
    get_divisible_wh,
    rotate_intrinsics,
    rotate_pose_inplane,
    scale_intrinsics,
    zero_pad,
)

rng = np.random.default_rng(3)


def _project(K, T, X):
    Xc = (T[:3, :3] @ X.T + T[:3, 3:4]).T
    uv = (K @ Xc.T).T
    return uv[:, :2] / uv[:, 2:]


def _rotate_pixels(p, rot, h0, w0):
    x, y = p[:, 0], p[:, 1]
    if rot % 4 == 0:
        return p
    if rot % 4 == 1:
        return np.stack([y, (w0 - 1) - x], -1)
    if rot % 4 == 2:
        return np.stack([(w0 - 1) - x, (h0 - 1) - y], -1)
    return np.stack([(h0 - 1) - y, x], -1)


def test_rotate_intrinsics_pose_projection_consistency():
    h0, w0 = 480, 640
    K = np.array([[520.0, 0, 310.0], [0, 540.0, 245.0], [0, 0, 1]])
    R, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    R *= np.sign(np.linalg.det(R))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.normal(size=3)
    X = rng.normal(size=(50, 3)) * 2.0
    # keep points in front of the camera
    Xc = (T[:3, :3] @ X.T + T[:3, 3:4]).T
    X = X[Xc[:, 2] > 0.5]
    p0 = _project(K, T, X)
    for rot in range(4):
        shape_after = (w0, h0) if rot % 2 else (h0, w0)
        K_r = rotate_intrinsics(K, shape_after, rot)
        T_r = rotate_pose_inplane(T, rot)
        p_r = _project(K_r, T_r, X)
        expected = _rotate_pixels(p0, rot, h0, w0)
        np.testing.assert_allclose(p_r, expected, atol=1e-4)


def test_scale_intrinsics():
    K = np.array([[520.0, 0, 310.0], [0, 540.0, 245.0], [0, 0, 1]])
    K2 = scale_intrinsics(K, (0.5, 0.25))
    assert K2[0, 0] == 260.0 and K2[1, 1] == 135.0
    assert K2[0, 2] == 155.0 and K2[1, 2] == 61.25


def test_divisible_crop_pad():
    assert get_divisible_wh(641, 483, 32) == (640, 480)
    assert get_divisible_wh(641, 483) == (641, 483)
    img = rng.normal(size=(64, 80)).astype(np.float32)
    depth = rng.normal(size=(64, 80)).astype(np.float32)
    K = np.array([[100.0, 0, 40.0], [0, 100.0, 32.0], [0, 0, 1]])
    out, d2, K2, bbox = crop(img, 32, rng=rng, other=depth, K=K,
                             return_bbox=True)
    top, bottom, left, right = bbox
    assert out.shape == (32, 32) and d2.shape == (32, 32)
    np.testing.assert_allclose(out, img[top:bottom, left:right])
    assert K2[0, 2] == K[0, 2] - left and K2[1, 2] == K[1, 2] - top
    (p1, p2) = zero_pad(96, out, None)
    assert p1.shape == (96, 96) and p2 is None
    np.testing.assert_allclose(p1[:32, :32], out)
