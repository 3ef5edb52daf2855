"""Integration tests over the named model-card configs — the structural
equivalent of the reference's tests/test_integration.py:50-134, which runs
four full pipelines from YAML configs on a real pair. Without downloadable
pretrained weights (zero-egress), the gates here are structural: the
pipeline builds from the YAML, runs on a synthetic pair, and obeys the
prediction contract; numeric recovery gates live in test_eval_pipeline.py
(oracle) and test_misc_models.py (SIFT self-matching)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.core.config import Config
from gluefactory_tpu.datasets.homographies import generate_structured_image
from gluefactory_tpu.eval.io import parse_config_path
from gluefactory_tpu.models import build_model

rng = np.random.default_rng(71)

CONFIGS = [
    "superpoint+nn",
    "superpoint+lightglue",
    "superpoint+lsd+gluestick",
    "superpoint+superglue",
    "superpoint+lightglue_adaptive",
    "gluestick_official_compat",
    "aliked_official_compat",
    "sift+superglue",
    "disk+nn",
    "disk+lightglue",
    "xfeat+nn",
    "aliked+nn",
    "sift+nn",
    "superpoint_open+nn",
    "keynet+nn",
    "loftr_homography",
    "sold2+wunsch",
    "lsd+lbd",
]

SMALL_OVERRIDES = {
    "superpoint+nn": {"extractor": {"max_num_keypoints": 64}},
    "superpoint+lightglue": {
        "extractor": {"max_num_keypoints": 64},
        "matcher": {"n_layers": 2},
    },
    "superpoint+lsd+gluestick": {
        "extractor": {
            "point_extractor": {"max_num_keypoints": 64},
            "line_extractor": {"max_num_lines": 16},
        },
        "matcher": {"n_layers": 2},
    },
    "superpoint+superglue": {
        "extractor": {"max_num_keypoints": 64},
        "matcher": {"n_layers": 2, "sinkhorn_iterations": 10},
    },
    "superpoint+lightglue_adaptive": {
        "extractor": {"max_num_keypoints": 64},
        "matcher": {"n_layers": 2},
    },
    "gluestick_official_compat": {
        "extractor": {
            "point_extractor": {"max_num_keypoints": 64},
            "line_extractor": {"max_num_lines": 16},
        },
        "matcher": {"n_layers": 2},
    },
    "sift+superglue": {
        "extractor": {"max_num_keypoints": 64},
        "matcher": {"n_layers": 2, "sinkhorn_iterations": 10},
    },
    "aliked_official_compat": {
        "extractor": {"model_name": "aliked-t16", "max_num_keypoints": 64,
                      "detection_threshold": -1e9},
    },
    "disk+nn": {"extractor": {"max_num_keypoints": 64}},
    "disk+lightglue": {
        "extractor": {"max_num_keypoints": 64},
        "matcher": {"n_layers": 2},
    },
    "xfeat+nn": {"extractor": {"max_num_keypoints": 64,
                               "detection_threshold": 0.0}},
    "aliked+nn": {"extractor": {"model_name": "aliked-t16",
                                "max_num_keypoints": 64,
                                "detection_threshold": 0.0}},
    "sift+nn": {"extractor": {"max_num_keypoints": 64}},
    "superpoint_open+nn": {"extractor": {"max_num_keypoints": 64}},
    "keynet+nn": {"extractor": {"max_num_keypoints": 48, "pyramid_levels": 2}},
    "lsd+lbd": {"extractor": {"max_num_lines": 64}},
    "sold2+wunsch": {"extractor": {
        "channels": [8, 16, 24], "descriptor_dim": 16,
        "max_num_junctions": 32, "max_num_lines": 64,
        "junction_threshold": 0.0, "mean_score_threshold": 0.0,
        "heatmap_threshold": 0.0, "inlier_ratio": 0.0, "min_length": 4.0,
    }},
    "loftr_homography": {
        "initial_dim": 16, "block_dims": [16, 24, 32], "fine_dim": 16,
        "coarse_layers": 1, "fine_layers": 1, "heads": 2, "max_matches": 64,
        "match_threshold": 0.01,
    },
}


@pytest.mark.parametrize("name", CONFIGS)
def test_model_card_runs(name):
    conf = Config.load(parse_config_path(name))
    model_conf = Config(conf.model).merge(SMALL_OVERRIDES[name])
    model = build_model(model_conf.name, model_conf)
    img = generate_structured_image(rng, (160, 120))
    warped = cv2.warpPerspective(
        img, np.array([[1, 0, 6.0], [0, 1, -4.0], [0, 0, 1]]), (160, 120)
    )
    data = {
        "view0": {"image": jnp.asarray(img)[None],
                  "image_size": jnp.asarray([[160.0, 120.0]])},
        "view1": {"image": jnp.asarray(warped)[None],
                  "image_size": jnp.asarray([[160.0, 120.0]])},
    }
    params = model.init(jax.random.key(0), data)
    pred = model.apply(params, data)
    # prediction contract (point pipelines; line-only cards skip to lines)
    if "matches0" in pred:
        for key in ("keypoints0", "keypoints1", "matching_scores0"):
            assert key in pred, (name, sorted(pred))
        n0 = pred["keypoints0"].shape[1]
        assert pred["matches0"].shape == (1, n0)
        m0 = np.asarray(pred["matches0"][0])
        assert ((m0 >= -1) & (m0 < pred["keypoints1"].shape[1])).all()
        assert np.isfinite(np.asarray(pred["keypoints0"])).all()
    else:
        assert "line_matches0" in pred, (name, sorted(pred))
    if "lines0" in pred:
        assert pred["line_matches0"].shape[1] == pred["lines0"].shape[1]
        lm0 = np.asarray(pred["line_matches0"][0])
        assert ((lm0 >= -1) & (lm0 < pred["lines1"].shape[1])).all()
