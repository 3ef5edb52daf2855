"""On-device synthetic-shapes engine (datasets/synthetic_shapes_ondevice):
pool build, in-jit warp + analytic GT recomputation, parity of the jitted
DF/AF fields with the host exact implementation, and one JPLDD train step
consuming the engine batch end-to-end."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gluefactory_tpu.datasets import get_dataset
from gluefactory_tpu.datasets.synthetic_shapes import draw_scene, exact_df_af
from gluefactory_tpu.datasets.synthetic_shapes_ondevice import (
    _df_af_from_segments,
    _splat_heatmap,
)

ENGINE_CONF = {
    "pool_size": 6,
    "val_pool_size": 2,
    "source_size": [96, 96],
    "image_size": 64,
    "max_segments": 16,
    "max_vertices": 32,
    "train_batch_size": 2,
    "val_batch_size": 2,
    "steps_per_epoch": 2,
    "val_steps": 1,
}


def test_df_af_parity_with_host():
    rng = np.random.default_rng(3)
    _, segs, _ = draw_scene(rng, 64, 16)
    sp = np.zeros((16, 2, 2), np.float32)
    sv = np.zeros(16, bool)
    sp[: len(segs)] = segs
    sv[: len(segs)] = True
    df_ref, af_ref = exact_df_af(segs, 64)
    df_j, af_j = _df_af_from_segments(
        jnp.asarray(sp)[None], jnp.asarray(sv)[None], 64, 1e9
    )
    np.testing.assert_allclose(np.asarray(df_j)[0], df_ref, atol=1e-4)
    near = df_ref < 5
    d_ang = np.abs(np.asarray(af_j)[0] - af_ref)
    d_ang = np.minimum(d_ang, np.pi - d_ang)
    assert (d_ang[near] > 0.05).mean() < 0.01


def test_heatmap_splat():
    vp = np.zeros((8, 2), np.float32)
    vv = np.zeros(8, bool)
    vp[:2] = [[40, 40], [5, 60]]
    vv[:2] = True
    h = np.asarray(
        _splat_heatmap(jnp.asarray(vp)[None], jnp.asarray(vv)[None], 64, 1.0)
    )[0]
    assert h[40, 40] > 0.999 and h[60, 5] > 0.999
    assert h[0, 63] < 1e-3  # far from any vertex
    # invalid slots (zeros) must not splat at the origin
    assert h[0, 0] < 1e-3


def test_engine_batch_and_jpldd_step():
    ds = get_dataset("synthetic_shapes_ondevice")(ENGINE_CONF)
    pool = ds.build_pool("train")
    assert pool["images"].shape == (6, 96, 96, 3)
    batch = jax.jit(ds.make_batch, static_argnames="split")(
        pool, jax.random.key(0), split="train"
    )
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["gt_heatmap"].shape == (2, 64, 64)
    # supervision is consistent: heatmap peaks sit at valid warped vertices
    heat = np.asarray(batch["gt_heatmap"])
    kp = np.asarray(batch["gt_keypoints"])
    kv = np.asarray(batch["gt_keypoint_valid"])
    for b in range(2):
        for j in np.flatnonzero(kv[b])[:5]:
            x, y = np.round(kp[b, j]).astype(int)
            assert heat[b, max(y - 1, 0):y + 2, max(x - 1, 0):x + 2].max() > 0.6
    # DF is exactly zero on warped segment midpoints that landed inside
    segs = np.asarray(batch["gt_segments"])
    sv = np.asarray(batch["gt_segment_valid"])
    df = np.asarray(batch["gt_distance_field"])
    mid = segs.mean(2)
    for b in range(2):
        for j in np.flatnonzero(sv[b])[:5]:
            x, y = np.round(mid[b, j]).astype(int)
            if 1 <= x < 63 and 1 <= y < 63:
                assert df[b, y - 1:y + 2, x - 1:x + 2].min() < 1.0

    # one JPLDD forward+loss step on the engine batch
    from gluefactory_tpu.models import build_model

    model = build_model(
        "extractors.joint_point_line_extractor",
        {"channels": [4, 8, 16, 32], "dim": 32, "max_num_keypoints": 64,
         "detection_threshold": 0.0},
    )
    params = model.init(jax.random.key(1), batch, method=model.forward_and_loss)

    def loss_fn(p):
        _pred, (losses, _metrics) = model.apply(
            p, batch, method=model.forward_and_loss)
        return losses["total"].mean()

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float((np.asarray(g) ** 2).sum())
                for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
