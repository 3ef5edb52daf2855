"""Sub-pixel match refinement (models/matchers/match_refiner.py).

Validates the fine-refinement stage the reference only has inside LoFTR
(gluefactory/models/matchers/loftr.py:40-66): noisy matched positions on a
textured pair under a known homography must snap back to the true
correspondences, while flat regions and unmatched keypoints stay put.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.geometry.homography import warp_points_np
from gluefactory_tpu.models import build_model


def _textured_image(h, w, seed=0, octaves=(4, 9, 17), hi=None, wi=None):
    """Smooth band-limited texture: sum of random low-frequency cosines —
    differentiable everywhere so the quadratic sub-pixel fit is exact-ish."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.zeros((h, w), np.float32)
    for k in octaves:
        for _ in range(6):
            fx, fy = rng.uniform(-k, k, 2) / max(h, w) * 2 * np.pi
            ph = rng.uniform(0, 2 * np.pi)
            img += rng.uniform(0.2, 1.0) * np.cos(fx * xx + fy * yy + ph)
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


def _warped_pair(h=96, w=96, seed=0):
    """Render image1 = image0 warped by a mild homography, by inverse
    sampling the SAME analytic texture (no resampling blur)."""
    H = np.array(
        [[1.02, 0.05, 3.0], [-0.04, 0.98, -2.0], [1e-4, -8e-5, 1.0]],
        np.float64,
    )
    img0 = _textured_image(h, w, seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float64)
    back = warp_points_np(pts, H, inverse=True)
    from scipy.ndimage import map_coordinates

    img1 = map_coordinates(
        img0, [back[:, 1], back[:, 0]], order=3, mode="nearest"
    ).reshape(h, w).astype(np.float32)
    return img0, img1, H


def _build_inputs(img0, img1, H, n=48, noise=1.5, seed=3):
    h, w = img0.shape
    rng = np.random.default_rng(seed)
    p0 = rng.uniform(12, min(h, w) - 12, (n, 2)).astype(np.float32)
    p1_true = warp_points_np(p0.astype(np.float64), H).astype(np.float32)
    keep = (p1_true > 10).all(-1) & (p1_true < min(h, w) - 10).all(-1)
    p0, p1_true = p0[keep][: n - 8], p1_true[keep][: n - 8]
    n_eff = p0.shape[0]
    p1_noisy = p1_true + rng.normal(0, noise, p1_true.shape).astype(np.float32)
    data = {
        "view0": {"image": jnp.asarray(img0)[None, :, :, None]},
        "view1": {"image": jnp.asarray(img1)[None, :, :, None]},
        "keypoints0": jnp.asarray(p0)[None],
        "keypoints1": jnp.asarray(p1_noisy)[None],
        "matches0": jnp.arange(n_eff, dtype=jnp.int32)[None],
        "matching_scores0": jnp.ones((1, n_eff), jnp.float32),
    }
    return data, p1_true


@pytest.fixture(scope="module")
def refiner():
    model = build_model("matchers.match_refiner", {"name": "matchers.match_refiner"})
    params = model.init(jax.random.key(0), {
        "view0": {"image": jnp.zeros((1, 32, 32, 1))},
        "view1": {"image": jnp.zeros((1, 32, 32, 1))},
        "keypoints0": jnp.zeros((1, 4, 2)),
        "keypoints1": jnp.zeros((1, 4, 2)),
        "matches0": -jnp.ones((1, 4), jnp.int32),
        "matching_scores0": jnp.zeros((1, 4)),
    })
    return model, params


def test_refiner_recovers_subpixel_positions(refiner):
    model, params = refiner
    img0, img1, H = _warped_pair()
    data, p1_true = _build_inputs(img0, img1, H, noise=1.5)
    before = np.linalg.norm(np.asarray(data["keypoints1"][0]) - p1_true, axis=-1)
    pred = jax.jit(model.apply)(params, data)
    after = np.linalg.norm(np.asarray(pred["keypoints1"][0]) - p1_true, axis=-1)
    # mean error must drop hard (1.5 px noise -> sub-half-pixel)
    assert after.mean() < 0.45, (before.mean(), after.mean())
    assert after.mean() < before.mean() / 2.5


def test_refiner_keeps_flat_regions_and_unmatched(refiner):
    model, params = refiner
    img = np.full((96, 96), 0.5, np.float32)
    rng = np.random.default_rng(0)
    p0 = rng.uniform(16, 80, (16, 2)).astype(np.float32)
    p1 = p0 + rng.normal(0, 1.0, p0.shape).astype(np.float32)
    matches = np.arange(16, dtype=np.int32)
    matches[8:] = -1  # half unmatched
    data = {
        "view0": {"image": jnp.asarray(img)[None, :, :, None]},
        "view1": {"image": jnp.asarray(img)[None, :, :, None]},
        "keypoints0": jnp.asarray(p0)[None],
        "keypoints1": jnp.asarray(p1)[None],
        "matches0": jnp.asarray(matches)[None],
        "matching_scores0": jnp.ones((1, 16), jnp.float32),
    }
    pred = model.apply(params, data)
    # flat texture -> gate blocks every update; unmatched rows untouched
    np.testing.assert_allclose(np.asarray(pred["keypoints1"][0]), p1, atol=1e-5)


def test_refiner_ignores_gross_outliers(refiner):
    """A match 30 px off must not be dragged by the (wrong) local ZNCC peak
    toward anything — and must never corrupt OTHER keypoints' refinement."""
    model, params = refiner
    img0, img1, H = _warped_pair(seed=5)
    data, p1_true = _build_inputs(img0, img1, H, noise=0.8, seed=7)
    kp1 = np.array(data["keypoints1"])
    kp1[0, 0] = kp1[0, 0] + 30.0  # gross outlier
    data["keypoints1"] = jnp.asarray(kp1)
    pred = model.apply(params, data)
    after = np.linalg.norm(np.asarray(pred["keypoints1"][0, 1:]) - p1_true[1:], axis=-1)
    assert after.mean() < 0.45


def test_window_sampling_matches_legacy():
    """The TPU fast path (one dense integer window per match + in-window
    interpolation) must reproduce the legacy direct-bilinear path bit-close
    away from borders/extreme warps — it replaced it as the default in
    round 5 (~30x fewer HBM gathers)."""
    img0, img1, H = _warped_pair(seed=11)
    data, _ = _build_inputs(img0, img1, H, noise=1.2, seed=13)
    outs = {}
    for mode in (False, True):
        model = build_model("matchers.match_refiner",
                           {"window_sampling": mode})
        params = model.init(jax.random.key(0), data)
        outs[mode] = np.asarray(model.apply(params, data)["keypoints1"])
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-3)
