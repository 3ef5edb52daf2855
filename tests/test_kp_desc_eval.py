"""Keypoint/descriptor evaluation metric tests (reference
utils/kp_evaluation.py + utils/desc_evaluation.py semantics)."""

import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.eval.metrics import (
    descriptor_homography_correctness,
    descriptor_matching_score_H,
    symmetric_rep_loc_H,
)
from gluefactory_tpu.geometry.homography import warp_points_np

rng = np.random.default_rng(3)


def test_symmetric_rep_loc_identity():
    kp = jnp.asarray(rng.uniform(5, 55, size=(1, 20, 2)), jnp.float32)
    scores = jnp.ones((1, 20))
    valid = jnp.ones((1, 20), bool)
    H = jnp.eye(3)[None]
    size = jnp.full((1, 2), 64.0)
    rep, loc = symmetric_rep_loc_H(
        kp, kp, scores, scores, valid, valid, H, size, size, k=300, th=3.0
    )
    assert float(rep[0]) == 1.0
    assert float(loc[0]) == 0.0


def test_symmetric_rep_loc_topk_and_threshold():
    # 4 shared points + 4 low-score far outliers on side 1; k=4 keeps only
    # the shared ones -> rep 1; with k=8 the outliers count -> rep drops
    base = rng.uniform(10, 50, size=(4, 2)).astype(np.float32)
    far = base + 25.0
    kp0 = jnp.asarray(base[None])
    kp1 = jnp.asarray(np.concatenate([base, far])[None])
    s0 = jnp.ones((1, 4))
    s1 = jnp.asarray(np.concatenate([np.ones(4), np.zeros(4)])[None])
    v0 = jnp.ones((1, 4), bool)
    v1 = jnp.ones((1, 8), bool)
    H = jnp.eye(3)[None]
    size = jnp.full((1, 2), 100.0)
    rep_k4, _ = symmetric_rep_loc_H(kp0, kp1, s0, s1, v0, v1, H, size, size, k=4)
    rep_k8, _ = symmetric_rep_loc_H(kp0, kp1, s0, s1, v0, v1, H, size, size, k=8)
    assert float(rep_k4[0]) == 1.0
    # counts: all 4 of view0 + 4 shared of view1 -> 8 / (4 + 8)
    np.testing.assert_allclose(float(rep_k8[0]), 8 / 12, atol=1e-6)


def test_descriptor_matching_score_thresholds():
    kp0 = jnp.asarray(rng.uniform(5, 55, size=(1, 6, 2)), jnp.float32)
    # partner points: three exact, two off by 2px, one off by 10px
    offsets = np.array([[0, 0], [0, 0], [0, 0], [2, 0], [0, 2], [10, 0]])
    kp1 = kp0 + jnp.asarray(offsets[None], jnp.float32)
    m0 = jnp.arange(6)[None]
    valid = jnp.ones((1, 6), bool)
    H = jnp.eye(3)[None]
    size = jnp.full((1, 2), 64.0)
    scores = descriptor_matching_score_H(kp0, kp1, m0, valid, H, size,
                                         thresholds=(1.0, 3.0, 50.0))
    np.testing.assert_allclose(float(scores[1.0][0]), 3 / 6, atol=1e-6)
    np.testing.assert_allclose(float(scores[3.0][0]), 5 / 6, atol=1e-6)
    np.testing.assert_allclose(float(scores[50.0][0]), 1.0, atol=1e-6)


def test_descriptor_homography_correctness_recovers_H():
    H_gt = np.array(
        [[1.05, 0.02, 3.0], [-0.01, 0.97, -2.0], [1e-4, -5e-5, 1.0]],
        dtype=np.float32,
    )
    n = 48
    pts0 = rng.uniform(8, 90, size=(n, 2)).astype(np.float32)
    pts1 = warp_points_np(pts0, H_gt).astype(np.float32)
    # distinctive descriptors, shuffled on side 1
    desc = rng.normal(size=(n, 16)).astype(np.float32) * 4
    perm = rng.permutation(n)
    corr, err = descriptor_homography_correctness(
        jnp.asarray(pts0), jnp.asarray(desc), jnp.ones(n, bool),
        jnp.asarray(pts1[perm]), jnp.asarray(desc[perm]), jnp.ones(n, bool),
        jnp.asarray(H_gt), jnp.full((2,), 100.0),
    )
    assert err < 1.0, err
    assert corr[3.0] == 1.0
