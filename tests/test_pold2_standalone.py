"""Standalone POLD2 model (reference extractors/pold2.py): two-view training
with selectable descriptor losses and dynamic uncertainty weighting."""

import jax
import jax.numpy as jnp
import numpy as np

from gluefactory_tpu.models import build_model

rng = np.random.default_rng(23)

BACKBONE = {
    "name": "extractors.joint_point_line_extractor",
    "channels": [8, 16, 24, 32], "dim": 32,
    "max_num_keypoints": 24, "detection_threshold": 0.0,
    "use_angle_field": True,
}


def _data(h=56, w=56):
    def view():
        return {
            "image": jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32),
            "gt_heatmap": jnp.asarray(
                rng.uniform(0, 1, (1, h, w)) > 0.97, jnp.float32),
            "gt_distance_field": jnp.asarray(
                rng.uniform(0, 6, (1, h, w)), jnp.float32),
            "gt_angle_field": jnp.asarray(
                rng.uniform(0, np.pi, (1, h, w)), jnp.float32),
        }

    return {"view0": view(), "view1": view(),
            "H_0to1": jnp.eye(3, dtype=jnp.float32)[None]}


def _pipeline(desc_loss, weights_type="static", temperature=50.0):
    return build_model("two_view_pipeline", {
        "extractor": {
            "name": "extractors.pold2",
            "backbone": BACKBONE,
            "descriptor_dim": 16,
            "desc_loss": desc_loss,
            "temperature": temperature,
            "loss_weights": {"type": weights_type},
        },
        "ground_truth": {"name": "matchers.homography_matcher"},
        "run_gt_in_forward": True,
    })


def test_pold2_forward_and_caps_loss():
    model = _pipeline("caps")
    data = _data()
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    assert pred["descriptors0"].shape == (1, 24, 16)
    assert pred["descriptors_dense0"].shape == (1, 56, 56, 16)
    assert "distance_field0" in pred and "angle_field0" in pred

    def loss_fn(p):
        pr = model.apply(p, data)
        losses, _ = model.apply(p, pr, data, method=model.loss)
        return jnp.mean(losses["total"]), losses

    (val, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(val))
    for k in ("kp", "df", "af", "desc"):
        assert k in losses, sorted(losses)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # descriptor branch receives gradient through the CAPS loss
    gd = jax.tree.leaves(
        grads["params"]["extractor"]["desc_conv"])
    assert any(float(jnp.abs(g).max()) > 0 for g in gd)


def test_pold2_dynamic_weights_and_learned_temp():
    model = _pipeline("nll", weights_type="dynamic", temperature="learned")
    data = _data()
    params = model.init(jax.random.key(1), data)
    ext = params["params"]["extractor"]
    assert "log_vars" in ext and "log_temp" in ext

    def loss_fn(p):
        pr = model.apply(p, data)
        losses, _ = model.apply(p, pr, data, method=model.loss)
        return jnp.mean(losses["total"])

    grads = jax.grad(loss_fn)(params)
    lv = np.asarray(grads["params"]["extractor"]["log_vars"])
    assert np.isfinite(lv).all() and (np.abs(lv) > 0).any()


def test_pold2_triplet_loss_path():
    model = _pipeline("triplet")
    data = _data()
    params = model.init(jax.random.key(2), data)
    pred = model.apply(params, data)
    losses, _ = model.apply(params, pred, data, method=model.loss)
    assert np.isfinite(np.asarray(losses["desc"])).all()
