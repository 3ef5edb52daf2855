"""End-to-end trajectory benchmark (scripts/sfm_trajectory): rendered
multi-view arc -> two-view pipeline matching -> incremental SfM -> ATE.
Uses SIFT+NN (no trained weights needed) on a short 4-view trajectory."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_trajectory_render_and_sfm(tmp_path):
    import jax.numpy as jnp

    from gluefactory_tpu.models import build_model
    from gluefactory_tpu.scripts.sfm_trajectory import (
        render_trajectory_scene,
        run_scene,
    )

    rng = np.random.default_rng(99)
    scene = tmp_path / "scene_0"
    render_trajectory_scene(scene, rng, n_views=4, step_rot_deg=3.0,
                            step_t=0.10)
    meta = json.loads((scene / "poses.json").read_text())
    assert len(meta["poses_0tok"]) == 4
    # consecutive GT poses are distinct, first is identity
    T = [np.asarray(t) for t in meta["poses_0tok"]]
    assert np.allclose(T[0], np.eye(4))
    assert np.linalg.norm(T[1][:3, 3]) > 0.05

    model = build_model("two_view_pipeline", {
        "extractor": {"name": "extractors.sift", "max_num_keypoints": 512,
                      "contrast_threshold": 0.02},
        "matcher": {"name": "matchers.nearest_neighbor_matcher",
                    "ratio_thresh": 0.9, "mutual_check": True},
    })
    data0 = {
        "view0": {"image": jnp.zeros((1, 480, 640, 3)),
                  "image_size": jnp.asarray([[640.0, 480.0]])},
        "view1": {"image": jnp.zeros((1, 480, 640, 3)),
                  "image_size": jnp.asarray([[640.0, 480.0]])},
    }
    params = model.init(jax.random.key(0), data0)
    res = run_scene(scene, model, params, jax.jit(model.apply))
    assert res["n_matches_mean"] > 30, res
    # ATE after alignment under 15% of the trajectory extent, and BA reduced
    # the reprojection cost
    assert res["ate"] / res["extent"] < 0.15, res
    assert res["ba_cost_last"] <= res["ba_cost_first"], res
