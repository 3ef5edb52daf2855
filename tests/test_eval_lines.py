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


def test_megadepth1500_extended_line_metrics(tmp_path):
    """Exact-correspondence line pairs under a known relative pose must score
    line_epi_prec == 1; a corrupted match scores lower."""
    import h5py
    import torch  # noqa: F401  (ensures torch-free path not required)

    from gluefactory_tpu.eval.megadepth1500_extended import (
        MegaDepth1500ExtendedPipeline,
    )
    from gluefactory_tpu.geometry.wrappers import Camera, Pose

    rng2 = np.random.default_rng(0)
    f = 200.0
    K = np.array([[f, 0, 80], [0, f, 60], [0, 0, 1]], np.float32)
    cam = Camera.from_calibration_matrix(K[None], size=jnp.asarray([[160.0, 120.0]]))
    aa = jnp.asarray([[0.02, -0.03, 0.01]], jnp.float32)
    t = jnp.asarray([[0.3, 0.05, 0.02]], jnp.float32)
    T = Pose.from_aa(aa[0], t[0])
    # 3D segments -> exact 2D projections in both views
    p3d_a = rng2.uniform([-1, -1, 4], [1, 1, 6], (6, 3)).astype(np.float32)
    p3d_b = p3d_a + rng2.uniform(-0.5, 0.5, (6, 3)).astype(np.float32)

    def project(p3d, Tm=None):
        p = jnp.asarray(p3d)[None]
        if Tm is not None:
            p = Tm.transform(p)
        uv, _ = cam.cam2image(p)
        return np.asarray(uv[0])

    l0 = np.stack([project(p3d_a), project(p3d_b)], axis=1)  # (6, 2, 2)
    l1 = np.stack([project(p3d_a, T), project(p3d_b, T)], axis=1)
    kp = rng2.uniform(0, 100, (8, 2)).astype(np.float32)

    pred_file = tmp_path / "predictions.h5"
    name = "pair0"
    with h5py.File(str(pred_file), "w") as hf:
        g = hf.create_group(name)
        g.create_dataset("keypoints0", data=kp)
        g.create_dataset("keypoints1", data=kp)
        g.create_dataset("matches0", data=-np.ones(8, np.int32))
        g.create_dataset("matching_scores0", data=np.zeros(8, np.float32))
        g.create_dataset("lines0", data=l0.astype(np.float32))
        g.create_dataset("lines1", data=l1.astype(np.float32))
        g.create_dataset("valid_lines0", data=np.ones(6, bool))
        g.create_dataset("valid_lines1", data=np.ones(6, bool))
        g.create_dataset("line_matches0", data=np.arange(6, dtype=np.int32))

    batch = {
        "name": [name],
        "camera0": cam, "camera1": cam,
        "T_0to1": Pose.from_aa(aa, t),
        "view0": {"image_size": jnp.asarray([[160.0, 120.0]])},
        "view1": {"image_size": jnp.asarray([[160.0, 120.0]])},
    }
    pipe = MegaDepth1500ExtendedPipeline.__new__(MegaDepth1500ExtendedPipeline)
    from gluefactory_tpu.core.config import Config

    merged = {}
    for klass in reversed(type(pipe).__mro__):
        dc = klass.__dict__.get("default_conf")
        if dc:
            merged = Config(merged).merge(dc).to_dict()
    pipe.conf = Config(merged)

    line_results = {}
    # drive only the line section: monkeypatch the base run_eval away
    import gluefactory_tpu.eval.megadepth1500 as md

    orig = md.MegaDepth1500Pipeline.run_eval
    md.MegaDepth1500Pipeline.run_eval = lambda self, l, p: ({}, {}, {})
    try:
        summaries, _, results = pipe.run_eval([batch], pred_file)
    finally:
        md.MegaDepth1500Pipeline.run_eval = orig
    assert summaries["mline_epi_prec@1e-03"] == 1.0, summaries
    assert summaries["mnum_line_matches"] == 6
    # corrupt one match -> precision drops
    with h5py.File(str(pred_file), "a") as hf:
        lm = np.arange(6, dtype=np.int32)
        lm[0] = 3
        del hf[name]["line_matches0"]
        hf[name].create_dataset("line_matches0", data=lm)
    md.MegaDepth1500Pipeline.run_eval = lambda self, l, p: ({}, {}, {})
    try:
        summaries2, _, _ = pipe.run_eval([batch], pred_file)
    finally:
        md.MegaDepth1500Pipeline.run_eval = orig
    assert summaries2["mline_epi_prec@1e-03"] < 1.0


def test_area_distance_ranks_sanely():
    from gluefactory_tpu.eval.line_metrics import segment_distance_matrix

    base = jnp.asarray([[[[0.0, 0.0], [10.0, 0.0]]]])
    close = jnp.asarray([[[[0.0, 0.5], [10.0, 0.7]]]])
    far = jnp.asarray([[[[0.0, 20.0], [10.0, 28.0]]]])
    d_close = float(segment_distance_matrix(base, close, kind="area")[0, 0, 0])
    d_far = float(segment_distance_matrix(base, far, kind="area")[0, 0, 0])
    assert d_close < d_far


def test_wireframe_pipeline(tmp_path):
    from gluefactory_tpu.eval.wireframe import WireframePipeline

    # fake wireframe npz: white canvas with drawn GT segments
    root = tmp_path / "wireframe" / "test"
    root.mkdir(parents=True)
    rng_l = np.random.default_rng(5)
    for i in range(2):
        img = np.full((240, 320, 3), 255, np.uint8)
        junctions, lines = [], []
        for s in range(6):
            p0 = rng_l.uniform((20, 20), (300, 220)).astype(np.float32)
            ang = rng_l.uniform(0, np.pi)
            ln = rng_l.uniform(60, 120)
            p1 = p0 + ln * np.array([np.cos(ang), np.sin(ang)], np.float32)
            p1 = np.clip(p1, 5, (315, 235)).astype(np.float32)
            cv2.line(img, tuple(p0.astype(int)), tuple(p1.astype(int)),
                     (0, 0, 0), 2)
            junctions += [p0, p1]
            lines.append([2 * s, 2 * s + 1])
        np.savez(root / f"im{i}.npz", image=img,
                 junctions=np.asarray(junctions),
                 lines=np.asarray(lines, np.int64))
    conf = {
        "data": {
            "data_dir": str(tmp_path / "wireframe"),
            "preprocessing": {"resize": 240, "side": "long",
                              "square_pad": True},
            "max_junctions": 32, "max_lines": 32,
        },
        "model": {"name": "lines.lsd", "max_num_lines": 64},
    }
    pipeline = WireframePipeline(conf)
    summaries, results = pipeline.run(tmp_path / "run_wireframe")
    assert summaries["mnum_lines"] > 3
    assert summaries["mnum_gt_lines"] == 6.0
    # LSD on clean renders must recover most GT segments
    assert summaries["morth_recall@5.0px"] > 0.5, summaries
    assert "mstruct_rep@5.0px" in summaries


def _ref_area_dist(seg1, seg2, lbd=1 / 24):
    """Direct numpy transliteration of the reference get_area_line_dist
    (utils/ls_evaluation.py:125-174) for parity checking."""

    def orient(p, q, r):
        return np.sign(np.sum(
            (q - p)[:, [1, 0]] * (r - p) * np.array([-1.0, 1.0]), axis=1))

    def intersect(l1, l2):
        o1 = orient(l1[:, 0], l1[:, 1], l2[:, 0])
        o2 = orient(l1[:, 0], l1[:, 1], l2[:, 1])
        o3 = orient(l2[:, 0], l2[:, 1], l1[:, 0])
        o4 = orient(l2[:, 0], l2[:, 1], l1[:, 1])
        return (o1 != o2) & (o3 != o4)

    def asym(l1, l2):
        n1, n2 = len(l1), len(l2)
        a1 = np.repeat(l1[:, None], n2, 1).reshape(-1, 2, 2)
        a2 = np.repeat(l2[None], n1, 0).reshape(-1, 2, 2)
        crossing = intersect(a1, a2).reshape(n1, n2)
        d = l1[:, 1] - l1[:, 0]
        u = d / (np.linalg.norm(d, axis=1, keepdims=True) + 1e-12)
        pts = l2.reshape(-1, 2)
        rel = pts[None] - l1[:, None, 0]
        od = np.abs(rel[..., 0] * u[:, None, 1] - rel[..., 1] * u[:, None, 0])
        od = od.reshape(n1, n2, 2)
        d1 = l1[:, 1] - l1[:, 0]
        d2 = l2[:, 1] - l2[:, 0]
        d1 = d1 / (np.linalg.norm(d1, axis=1, keepdims=True) + 1e-12)
        d2 = d2 / (np.linalg.norm(d2, axis=1, keepdims=True) + 1e-12)
        theta = np.arccos(np.minimum(1, np.abs(d1 @ d2.T)))
        parallel = np.abs(theta) < 1e-8
        tan_t = np.tan(theta)
        tan_t[parallel] = 1
        len2 = np.linalg.norm(l2[:, 1] - l2[:, 0], axis=1)[None]
        area = (od**2).sum(2) / (2 * tan_t * len2**2) * (1.0 - parallel)
        non_int = lbd * od.min(2) + np.sin(2 * theta) / 4
        area[~crossing] = non_int[~crossing]
        return area

    return (asym(seg1, seg2) + asym(seg2, seg1).T) / 2


def test_area_distance_reference_parity():
    from gluefactory_tpu.geometry.lines import area_line_dist

    rng_a = np.random.default_rng(3)
    seg1 = rng_a.uniform(0, 100, (12, 2, 2)).astype(np.float64)
    seg2 = rng_a.uniform(0, 100, (9, 2, 2)).astype(np.float64)
    ours = np.asarray(area_line_dist(
        jnp.asarray(seg1, jnp.float32), jnp.asarray(seg2, jnp.float32)))
    ref = _ref_area_dist(seg1, seg2)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
    # self-distance of identical segments is exactly zero
    self_d = np.asarray(area_line_dist(
        jnp.asarray(seg1, jnp.float32), jnp.asarray(seg1, jnp.float32)))
    np.testing.assert_allclose(np.diag(self_d), 0.0, atol=1e-5)


def test_eval_homography_robust_feeds_lines_to_hybrid():
    """eval_homography_robust passes matched line segments through to a
    line-aware estimator (reference eval/utils.py:146-157): with few noisy
    points but many clean lines, hybrid_ransac must recover H where the
    point-only estimate is poor."""
    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.eval.utils import eval_homography_robust

    rng = np.random.default_rng(5)
    H_gt = np.array([[1.05, 0.02, 8.0], [-0.03, 0.97, -5.0], [1e-4, -5e-5, 1.0]],
                    np.float32)

    def warp(p):
        ph = np.concatenate([p, np.ones_like(p[..., :1])], -1) @ H_gt.T
        return ph[..., :2] / ph[..., 2:]

    # 6 points, half of them gross outliers
    kp0 = rng.uniform(50, 400, (6, 2)).astype(np.float32)
    kp1 = warp(kp0)
    kp1[3:] += rng.uniform(40, 80, (3, 2)).astype(np.float32)
    # 24 clean line segments
    l0 = rng.uniform(50, 400, (24, 2, 2)).astype(np.float32)
    l1 = warp(l0)
    pred = {
        "keypoints0": kp0, "keypoints1": kp1,
        "matches0": np.arange(6), "matching_scores0": np.ones(6, np.float32),
        "lines0": l0, "lines1": l1,
        "line_matches0": np.arange(24),
        "line_matching_scores0": np.ones(24, np.float32),
    }
    data = {"H_0to1": H_gt, "view0": {"image_size": np.array([480.0, 480.0])}}
    res = eval_homography_robust(
        data, pred, Config({"estimator": "hybrid_ransac", "ransac_th": 3.0}))
    assert res["H_error_ransac"] < 2.0, res
    # point-only path is unaffected by the new keys (plain ransac ignores lines)
    res_pts = eval_homography_robust(
        data, {k: v for k, v in pred.items() if not k.startswith("line")
               and "lines" not in k},
        Config({"estimator": "ransac", "ransac_th": 3.0}))
    assert "H_error_ransac" in res_pts
