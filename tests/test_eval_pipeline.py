"""End-to-end benchmark-stack test: build a fake HPatches tree on disk with
known homographies, run the full two-phase HPatchesPipeline with a grid
extractor + GT-oracle matcher, and require near-perfect AUC — this validates
dataset -> pipeline -> export cache -> scoring -> RANSAC -> AUC numerically
(mirrors the reference's tests/test_integration.py:50-134 strategy without
pretrained weights)."""

import os

import cv2
import numpy as np
import pytest

from gluefactory_tpu.core.config import Config
from gluefactory_tpu.datasets.homographies import generate_structured_image


@pytest.fixture(scope="module")
def fake_hpatches(tmp_path_factory):
    root = tmp_path_factory.mktemp("hpatches-sequences-release")
    rng = np.random.default_rng(11)
    for s in range(2):
        seq = root / f"v_fake{s}"
        seq.mkdir()
        img = (generate_structured_image(rng, (320, 240)) * 255).astype(np.uint8)
        cv2.imwrite(str(seq / "1.ppm"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        for i in range(2, 7):
            # mild homography: rotation+translation+perspective
            ang = rng.uniform(-0.1, 0.1)
            H = np.array(
                [
                    [np.cos(ang), -np.sin(ang), rng.uniform(-10, 10)],
                    [np.sin(ang), np.cos(ang), rng.uniform(-10, 10)],
                    [rng.uniform(-1e-4, 1e-4), rng.uniform(-1e-4, 1e-4), 1.0],
                ]
            )
            warped = cv2.warpPerspective(img, H, (320, 240))
            cv2.imwrite(str(seq / f"{i}.ppm"), cv2.cvtColor(warped, cv2.COLOR_RGB2BGR))
            np.savetxt(seq / f"H_1_{i}", H)
    return root


@pytest.mark.slow
def test_hpatches_pipeline_oracle(fake_hpatches, tmp_path):
    from gluefactory_tpu.eval.hpatches import HPatchesPipeline

    conf = {
        "data": {
            "data_dir": str(fake_hpatches),
            "preprocessing": {"resize": 240, "side": "long", "square_pad": True},
            "num_workers": 0,
        },
        "model": {
            "name": "two_view_pipeline",
            "extractor": {"name": "extractors.grid_extractor", "cell_size": 4},
            "matcher": {"name": "matchers.oracle_matcher", "th_positive": 3.0},
        },
        "eval": {"estimator": "ransac", "ransac_th": 2.0, "num_hypotheses": 256},
    }
    pipeline = HPatchesPipeline(conf)
    summaries, results = pipeline.run(tmp_path / "hp_eval")
    # Oracle matches are grid-quantized (cell 4 => error <= ~2.8px), but DLT /
    # RANSAC over ~10^3 matches average the noise out => sub-pixel H recovery.
    assert summaries["H_error_dlt@3px"] > 80.0, summaries
    assert summaries["H_error_ransac@3px"] > 70.0, summaries
    assert summaries["mprec@5px"] > 0.99, summaries
    assert summaries["mnum_matches"] > 500
    # phase-2 rerun from cache only (no model) gives identical summaries
    summaries2, _ = pipeline.run(tmp_path / "hp_eval")
    assert summaries2 == summaries
