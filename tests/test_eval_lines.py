"""Extended line benchmarks: 1-1 segment metrics + hpatches_lines /
rdnim_lines end-to-end CLI pipelines on generated data."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.eval.line_metrics import (
    match_segments_one_to_one,
    segment_distance_matrix,
    segment_localization_error,
    segment_repeatability,
)

rng = np.random.default_rng(3)


def test_one_to_one_assignment_exact():
    # segs1 = permuted segs0 with small jitter -> assignment = permutation
    L = 6
    segs0 = rng.uniform(10, 90, (1, L, 2, 2)).astype(np.float32)
    # spread segments apart to make the assignment unambiguous
    segs0[0, :, :, 0] += np.arange(L)[:, None] * 120
    perm = rng.permutation(L)
    segs1 = segs0[:, perm] + rng.normal(0, 0.3, (1, L, 2, 2)).astype(np.float32)
    dist = segment_distance_matrix(
        jnp.asarray(segs0), jnp.asarray(segs1), kind="struct"
    )
    valid = np.ones((1, L), bool)
    assign, mdist = match_segments_one_to_one(np.asarray(dist), valid, valid)
    # the assignment must invert the permutation
    np.testing.assert_array_equal(perm[assign[0]], np.arange(L))
    assert (mdist[0] < 2.0).all()
    rep = segment_repeatability(mdist, np.array([L]), np.array([L]), [5.0])
    assert rep["rep@5.0"][0] == 1.0
    loc = segment_localization_error(mdist, [5.0])
    assert 0 <= loc["loc@5.0"][0] < 2.0


def test_orth_distance_overlap_gating():
    # collinear but non-overlapping segments must NOT match under 'orth'
    segs0 = jnp.asarray([[[[0.0, 0.0], [10.0, 0.0]]]])
    segs1 = jnp.asarray([[[[100.0, 0.0], [110.0, 0.0]]]])
    d = segment_distance_matrix(segs0, segs1, kind="orth", min_overlap=0.5)
    assert float(d[0, 0, 0]) > 1e6


@pytest.fixture(scope="module")
def line_rich_hpatches(tmp_path_factory):
    """hpatches-format sequences with strong straight edges for LSD."""
    from gluefactory_tpu.scripts.generate_eval_set import render_sequence

    root = tmp_path_factory.mktemp("hpatches-lines")
    for s in range(2):
        render_sequence(root / f"v_l{s}", np.random.default_rng(50 + s), (320, 240))
    return root


def test_hpatches_lines_pipeline(line_rich_hpatches, tmp_path):
    from gluefactory_tpu.eval.hpatches_lines import HPatchesLinesPipeline

    conf = {
        "data": {
            "data_dir": str(line_rich_hpatches),
            "preprocessing": {"resize": 240, "side": "short"},
        },
        "model": {
            "name": "two_view_pipeline",
            "extractor": {"name": "lines.lsd", "max_num_lines": 64},
        },
    }
    pipeline = HPatchesLinesPipeline(conf)
    summaries, results = pipeline.run(tmp_path / "run")
    assert summaries["mnum_lines0"] > 3
    # LSD on the same scene under mild warps must be fairly repeatable
    assert summaries["morth_rep@5.0"] > 0.2, summaries
    assert summaries["mstruct_rep@5.0"] > 0.1, summaries
    assert np.isfinite(summaries.get("morth_loc@5.0", np.nan))


def test_rdnim_lines_pipeline(tmp_path):
    from gluefactory_tpu.eval.rdnim_lines import RDNIMLinesPipeline
    from gluefactory_tpu.scripts.generate_eval_set import render_sequence

    # fake RDNIM layout: <root>/day/<scene>/H_<stem>, <stem>_ref.jpg, _query.jpg
    root = tmp_path / "RDNIM"
    day = root / "day" / "scene0"
    day.mkdir(parents=True)
    tmp_seq = tmp_path / "seq"
    render_sequence(tmp_seq, np.random.default_rng(99), (320, 240))
    img1 = cv2.imread(str(tmp_seq / "1.ppm"))
    img2 = cv2.imread(str(tmp_seq / "2.ppm"))
    H = np.loadtxt(tmp_seq / "H_1_2")
    cv2.imwrite(str(day / "p0_ref.jpg"), img1)
    cv2.imwrite(str(day / "p0_query.jpg"), img2)
    np.savetxt(day / "H_p0", H)
    conf = {
        "data": {
            "data_dir": str(root),
            "reference": "day",
            "preprocessing": {"resize": 240, "side": "long", "square_pad": True},
        },
        "model": {
            "name": "two_view_pipeline",
            "extractor": {"name": "lines.lsd", "max_num_lines": 64},
        },
    }
    pipeline = RDNIMLinesPipeline(conf)
    summaries, results = pipeline.run(tmp_path / "run_rdnim")
    assert summaries["mnum_lines0"] > 3
    assert "morth_rep@5.0" in summaries
