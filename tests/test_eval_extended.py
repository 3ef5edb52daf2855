import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.eval.metrics import (
    keypoint_repeatability,
    line_repeatability,
    matching_score,
)

rng = np.random.default_rng(51)


def test_keypoint_repeatability_identity():
    kpts = jnp.asarray(rng.uniform(10, 90, (1, 32, 2)), jnp.float32)
    valid = jnp.ones((1, 32), bool)
    H = jnp.eye(3, dtype=jnp.float32)[None]
    size = jnp.asarray([[100.0, 100.0]])
    rep, loc = keypoint_repeatability(kpts, kpts, valid, valid, H, size)
    assert float(rep[0]) == 1.0
    assert float(loc[0]) < 1e-4


def test_keypoint_repeatability_partial():
    k0 = jnp.asarray(rng.uniform(10, 90, (1, 16, 2)), jnp.float32)
    # second view only re-detects half, shifted by 1px
    k1 = np.array(k0)
    k1[0, :8] += 1.0
    k1[0, 8:] = 500.0  # far away
    rep, loc = keypoint_repeatability(
        k0, jnp.asarray(k1), jnp.ones((1, 16), bool), jnp.ones((1, 16), bool),
        jnp.eye(3)[None].astype(jnp.float32), jnp.asarray([[600.0, 600.0]]), th=3.0,
    )
    assert abs(float(rep[0]) - 0.5) < 1e-5
    assert abs(float(loc[0]) - np.sqrt(2)) < 1e-4


def test_line_repeatability_identity():
    lines = jnp.asarray(rng.uniform(10, 90, (1, 8, 2, 2)), jnp.float32)
    valid = jnp.ones((1, 8), bool)
    H = jnp.eye(3, dtype=jnp.float32)[None]
    size = jnp.asarray([[100.0, 100.0]])
    rep, loc = line_repeatability(lines, lines, valid, valid, H, size)
    assert float(rep[0]) == 1.0
    assert float(loc[0]) < 1e-3


def test_matching_score():
    m0 = jnp.asarray([[0, 1, 2, -1]])
    gt = jnp.asarray([[0, 1, 3, -1]])
    valid = jnp.ones((1, 4), bool)
    ms = matching_score(m0, gt, valid)
    assert abs(float(ms[0]) - 2 / 3) < 1e-6


def test_desc_losses():
    import jax
    from gluefactory_tpu.models.utils.desc_losses import (
        caps_window_loss, nll_desc_loss, triplet_loss,
    )

    g = np.random.default_rng(3)
    B, N, D = 2, 16, 8
    d0 = g.normal(size=(B, N, D)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    perm = g.permutation(N)
    d1 = d0[:, perm]
    gt = np.tile(np.argsort(perm), (B, 1)).astype(np.int32)
    # perfect correspondence: losses near their floors
    tl = triplet_loss(jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(gt))
    nl = nll_desc_loss(jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(gt))
    assert float(np.asarray(tl).mean()) < 0.6
    # wrong correspondence must cost much more
    gt_bad = (gt + 3) % N
    tl_bad = triplet_loss(jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(gt_bad))
    nl_bad = nll_desc_loss(jnp.asarray(d0), jnp.asarray(d1), jnp.asarray(gt_bad))
    assert float(np.asarray(tl_bad).mean()) > float(np.asarray(tl).mean())
    assert float(np.asarray(nl_bad).mean()) > float(np.asarray(nl).mean())
    # caps: descriptor map whose center matches -> near-zero expected offset
    dense = g.normal(size=(B, 32, 32, D)).astype(np.float32)
    kpts = g.uniform(8, 24, size=(B, N, 2)).astype(np.float32)
    from gluefactory_tpu.ops.interpolate import bilinear_sample
    d_center = np.array(bilinear_sample(jnp.asarray(dense), jnp.asarray(kpts)))
    d_center /= np.linalg.norm(d_center, axis=-1, keepdims=True)
    cl = caps_window_loss(jnp.asarray(d_center), jnp.asarray(kpts), jnp.asarray(dense),
                          temperature=0.01)
    assert float(np.asarray(cl).mean()) < 1.5
