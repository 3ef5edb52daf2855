import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.datasets import get_dataset
from gluefactory_tpu.models import build_model
from gluefactory_tpu.train import filter_batch

rng = np.random.default_rng(91)


def test_homographies_point_line_dataset():
    ds = get_dataset("homographies_point_line")(
        {"image_size": 96, "source_size": 128, "train_size": 4,
         "train_batch_size": 2, "num_workers": 0, "compute_fields": True}
    )
    batch = next(iter(ds.get_data_loader("train")))
    assert batch["view0"]["lines"].shape == (2, 24, 2, 2)
    assert batch["view0"]["gt_distance_field"].shape == (2, 96, 96)
    assert batch["gt_line_matches0"].shape == (2, 24)
    # GT line correspondence: warped view-0 line i must be near view-1 line i
    from gluefactory_tpu.geometry.lines import struct_line_dist
    from gluefactory_tpu.geometry.homography import warp_lines

    H = jnp.asarray(batch["H_0to1"])
    l0 = jnp.asarray(batch["view0"]["lines"])
    l1 = jnp.asarray(batch["view1"]["lines"])
    gl = np.asarray(batch["gt_line_matches0"])
    warped, wvalid = warp_lines(l0, H, jnp.asarray(batch["view1"]["image_size"]))
    D = np.asarray(struct_line_dist(warped, l1))
    for b in range(2):
        for i in np.nonzero(gl[b] >= 0)[0][:5]:
            assert D[b, i, gl[b, i]] < 8.0, (b, i, D[b, i, gl[b, i]])


def test_gluestick_trains_on_point_line_data():
    """Full point+line training step: wireframe extractor on synthetic pair
    data with GT line matches -> GlueStick loss finite with gradients."""
    ds = get_dataset("homographies_point_line")(
        {"image_size": 96, "source_size": 128, "train_size": 2,
         "train_batch_size": 1, "num_workers": 0}
    )
    batch = next(iter(ds.get_data_loader("train")))
    data = filter_batch(batch)
    # drop the dataset-slot line GT: the pipeline's GT oracle recomputes
    # matches between the DETECTED lines (different slot layout)
    data = {k: v for k, v in data.items() if not k.startswith("gt_line")}
    pipe = build_model(
        "two_view_pipeline",
        {
            "extractor": {
                "name": "lines.wireframe",
                "point_extractor": {
                    "name": "extractors.superpoint", "max_num_keypoints": 32,
                    "detection_threshold": 0.0, "dense_outputs": True,
                    "channels": [8, 8, 16, 16, 32, 32, 32, 32],
                    "head_channels": 32, "descriptor_dim": 32,
                },
                "line_extractor": {"name": "lines.lsd", "max_num_lines": 16},
            },
            "matcher": {
                "name": "matchers.gluestick", "input_dim": 32,
                "descriptor_dim": 32, "n_layers": 2, "num_heads": 2,
            },
            "ground_truth": {
                "name": "matchers.homography_matcher", "use_lines": True,
            },
            "run_gt_in_forward": True,
        },
    )
    params = pipe.init(jax.random.key(0), data, method=pipe.forward_and_loss)
    pred = pipe.apply(params, data)
    losses, _ = pipe.apply(params, pred, data, method=pipe.loss)
    assert np.isfinite(np.asarray(losses["total"])).all()


def test_deeplsd_model():
    ds = get_dataset("synthetic_shapes")(
        {"image_size": 64, "train_size": 2, "train_batch_size": 1, "num_workers": 0}
    )
    batch = next(iter(ds.get_data_loader("train")))
    data = filter_batch(batch)
    model = build_model(
        "lines.deeplsd",
        {"channels": [8, 16, 32], "max_num_candidates": 64,
         "line_extractor": {"name": "lines.pold2_extractor",
                            "max_num_points": 64, "max_num_lines": 64}},
    )
    params = model.init(jax.random.key(0), data, method=model.forward_and_loss)
    pred = model.apply(params, data)
    assert pred["distance_field"].shape == (1, 64, 64)
    assert pred["lines"].shape[1] == 64
    losses, _ = model.apply(params, pred, data, method=model.loss)
    assert np.isfinite(np.asarray(losses["total"])).all()


def test_pold2_mlp_learns():
    import optax

    ds = get_dataset("pold2_mlp_dataset")(
        {"image_size": 96, "train_size": 8, "train_batch_size": 4, "num_workers": 0}
    )
    batch = next(iter(ds.get_data_loader("train")))
    data = filter_batch(batch)
    model = build_model("lines.pold2_mlp", {"hidden": [32, 16]})
    params = model.init(jax.random.key(0), data, method=model.forward_and_loss)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            pr = model.apply(p, data)
            l, m = model.apply(p, pr, data, method=model.loss)
            return jnp.mean(l["total"]), m

        (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss, m

    accs = []
    for _ in range(40):
        params, opt, loss, m = step(params, opt)
        accs.append(float(np.asarray(m["accuracy"]).mean()))
    assert accs[-1] > 0.9, accs[-1]


def test_lbd_descriptor_and_matcher():
    """LBD descriptors match identical lines in identical images."""
    from gluefactory_tpu.datasets.synthetic_shapes import draw_scene

    g = np.random.default_rng(5)
    img, segments, _ = draw_scene(g, 96, 8)
    L = 8
    lines = np.zeros((L, 2, 2), np.float32)
    lv = np.zeros((L,), bool)
    n = min(len(segments), L)
    lines[:n], lv[:n] = segments[:n], True
    desc_model = build_model("lines.lbd", {})
    data = {"image": jnp.asarray(img)[None], "lines": jnp.asarray(lines)[None],
            "valid_lines": jnp.asarray(lv)[None]}
    params = desc_model.init(jax.random.key(0), data)
    d0 = desc_model.apply(params, data)["line_descriptors"]
    # permuted second view
    perm = g.permutation(n)
    lines1 = lines.copy()
    lines1[:n] = lines[perm]
    data1 = {**data, "lines": jnp.asarray(lines1)[None]}
    d1 = desc_model.apply(params, data1)["line_descriptors"]
    from gluefactory_tpu.models.lines.lbd import LineMatcherLBD

    matcher = LineMatcherLBD.from_conf({})
    mdata = {
        "line_descriptors0": d0, "line_descriptors1": d1,
        "valid_lines0": jnp.asarray(lv)[None], "valid_lines1": jnp.asarray(lv)[None],
    }
    mparams = matcher.init(jax.random.key(0), mdata)
    pred = matcher.apply(mparams, mdata)
    m0 = np.asarray(pred["line_matches0"][0])[:n]
    expected = np.argsort(perm)
    assert (m0 == expected).mean() > 0.8, (m0, expected)


def test_gt_line_matches_from_pose_depth_plane():
    """On the synthetic fronto-parallel plane (uniform depth), line GT from
    depth must recover the identity correspondence of shifted lines."""
    import jax.numpy as jnp

    from gluefactory_tpu.geometry.lines import gt_line_matches_from_pose_depth
    from gluefactory_tpu.geometry.wrappers import Camera, Pose

    H, W, f, z, tx = 120, 160, 200.0, 5.0, 0.6  # 24px disparity
    cam = Camera.from_fc(size=jnp.array([[W, H]], jnp.float32),
                         f=jnp.array([[f, f]]), c=jnp.array([[W / 2, H / 2]]))
    T = Pose.from_Rt(jnp.eye(3)[None], jnp.array([[-tx, 0.0, 0.0]]))
    depth = jnp.full((1, H, W), z)
    g = np.random.default_rng(2)
    L = 6
    l0 = g.uniform([30, 20], [W - 10, H - 20], size=(L, 2, 2)).astype(np.float32)
    disp = f * tx / z
    l1 = l0.copy()
    l1[..., 0] -= disp
    perm = g.permutation(L)
    out = gt_line_matches_from_pose_depth(
        jnp.asarray(l0)[None], jnp.asarray(l1[perm])[None],
        jnp.ones((1, L), bool), jnp.ones((1, L), bool),
        depth, depth, cam, cam, T, dist_th=3.0,
    )
    m0 = np.asarray(out["line_matches0"][0])
    matched = m0 >= 0
    assert matched.sum() >= L - 1  # borders may clip one
    expected = np.argsort(perm)
    assert (m0[matched] == expected[matched]).all()


def test_merge_lines_clusters_and_extends():
    from gluefactory_tpu.geometry.lines import merge_lines

    segs = jnp.asarray([[
        [[0.0, 0.0], [10.0, 0.0]],
        [[5.0, 0.3], [20.0, 0.3]],   # overlaps + near-collinear with 0
        [[19.0, 0.2], [30.0, 0.1]],  # chains onto 1
        [[50.0, 50.0], [60.0, 60.0]],
        [[0.0, 0.0], [0.0, 0.0]],
    ]])
    valid = jnp.asarray([[True, True, True, True, False]])
    merged, mv = jax.jit(merge_lines)(segs, valid)
    merged, mv = np.asarray(merged), np.asarray(mv)
    assert mv[0].tolist() == [True, False, False, True, False]
    # the chain 0-1-2 merges into one segment spanning x ~ [0, 30]
    xs = merged[0, 0, :, 0]
    assert xs.min() < 1.0 and xs.max() > 29.0
    np.testing.assert_allclose(merged[0, 3], np.asarray(segs[0, 3]), atol=1e-4)


def test_kp_losses_peaky_and_soft_argmax():
    from gluefactory_tpu.geometry.kp_losses import (
        peaky_loss,
        soft_argmax_loc_loss,
    )

    H = W = 32
    heat_sharp = jnp.zeros((1, H, W)).at[0, 10, 12].set(1.0)
    heat_flat = jnp.full((1, H, W), 0.5)
    kp = jnp.asarray([[[12.0, 10.0]]])
    valid = jnp.ones((1, 1), bool)
    sharp = float(peaky_loss(heat_sharp, kp, valid)[0])
    flat = float(peaky_loss(heat_flat, kp, valid)[0])
    assert sharp < flat  # sharp peak -> lower peaky loss
    # soft-argmax pulls toward the mass center: loss smaller when GT is at
    # the peak than 2px away
    gt_on = jnp.asarray([[[12.0, 10.0]]])
    gt_off = jnp.asarray([[[14.0, 10.0]]])
    l_on = float(soft_argmax_loc_loss(heat_sharp, kp, gt_on, valid)[0])
    l_off = float(soft_argmax_loc_loss(heat_sharp, kp, gt_off, valid)[0])
    assert l_on < l_off
    assert l_on < 0.5
