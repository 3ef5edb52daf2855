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
