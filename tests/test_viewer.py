"""Interactive inspection viewer (visualization/global_frame.py,
two_view_frame.py, tools.py) driven headlessly on the Agg backend: frame
construction, tool availability gating, pick->child spawn, keyboard cycling.
Reference counterpart: gluefactory/visualization/global_frame.py +
two_view_frame.py (which have no tests at all)."""

import types

import h5py
import matplotlib
import numpy as np
import pytest

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from gluefactory_tpu.visualization.global_frame import GlobalFrame
from gluefactory_tpu.visualization.two_view_frame import TwoViewFrame

N_PAIRS = 4
N_KP = 16


class _StubLoader:
    """Minimal DataLoader stand-in: .dataset with len, ._get_one(ind)."""

    def __init__(self, items):
        self.items = items
        self.dataset = items

    def _get_one(self, ind):
        return self.items[int(ind)]


def _make_item(rng, name):
    img = rng.uniform(size=(48, 64, 1)).astype(np.float32)
    H = np.eye(3, dtype=np.float32)
    H[0, 2] = 2.0
    return {
        "name": name,
        "view0": {"image": img},
        "view1": {"image": img[:, ::-1].copy()},
        "H_0to1": H,
    }


@pytest.fixture()
def viewer_setup(tmp_path):
    rng = np.random.default_rng(0)
    names = [f"seq/{i}_pair" for i in range(N_PAIRS)]
    items = [_make_item(rng, n) for n in names]

    pred_files = {}
    for exp in ("expA", "expB"):
        pfile = tmp_path / f"{exp}.h5"
        with h5py.File(pfile, "w") as f:
            for n in names:
                g = f.create_group(n)
                kp0 = rng.uniform(2, 40, size=(N_KP, 2)).astype(np.float32)
                g["keypoints0"] = kp0
                g["keypoints1"] = kp0 + np.array([2.0, 0.0], np.float32)
                g["keypoint_scores0"] = rng.uniform(0.1, 1, N_KP).astype(
                    np.float32
                )
                g["keypoint_scores1"] = rng.uniform(0.1, 1, N_KP).astype(
                    np.float32
                )
                m0 = np.arange(N_KP, dtype=np.int32)
                m0[::3] = -1
                g["matches0"] = m0
                g["matching_scores0"] = rng.uniform(0, 1, N_KP).astype(
                    np.float32
                )
                g["gt_matches0"] = np.arange(N_KP, dtype=np.int32)
        pred_files[exp] = pfile

    results = {
        exp: {
            "names": names,
            "num_matches": rng.integers(5, 20, N_PAIRS).astype(float),
            "H_error_ransac": rng.uniform(0, 5, N_PAIRS),
            "prec@3px": rng.uniform(0, 1, N_PAIRS),
        }
        for exp in pred_files
    }
    loader = _StubLoader(items)
    frame = GlobalFrame(
        {"x": "num_matches", "y": "H_error_ransac"},
        results,
        loader,
        pred_files,
        child_frame=TwoViewFrame,
    )
    yield frame
    plt.close("all")


def test_global_frame_draw_and_metrics(viewer_setup):
    frame = viewer_setup
    assert set(frame.scatters) == {"expA", "expB"}
    assert frame.metrics == ["H_error_ransac", "num_matches", "prec@3px"]
    # metric cycling redraws with the new axis
    frame._cycle("x", 1)
    assert frame.conf["x"] != "num_matches"
    # diff mode: first experiment collapses onto zero on numeric axes
    frame._on_key(types.SimpleNamespace(key="d"))
    assert frame.conf["diff"]
    y0 = np.asarray(frame.scatters[frame.names[0]].get_ydata())
    assert np.allclose(y0, 0.0)


def test_spawn_child_tools_and_cycling(viewer_setup):
    frame = viewer_setup
    child = frame.spawn_child("expA", 1, event=1)
    assert child is not None and frame.childs == [child]
    # availability gating: keys in preds + data decide the offered tools
    for tool in ("image", "keypoints", "keypoint_ranking", "matches",
                 "gt_matches", "homography_matches"):
        assert tool in child.options, tool
    assert "lines" not in child.options
    assert "epipolar_matches" not in child.options  # no T_0to1/camera
    # draw every offered tool: none may raise on the Agg backend
    for tool in child.options:
        child.draw(tool)
    # match overlays land as figure-level artists; clear() removes them
    child.draw("matches")
    assert len(child.fig.artists) > 0
    child.clear()
    assert len(child.fig.artists) == 0
    # keyboard: 'r' cycles tools, 't' toggles the summary overlay
    before = child.conf["default"]
    child._on_key(types.SimpleNamespace(key="r"))
    assert child.conf["default"] != before
    child._on_key(types.SimpleNamespace(key="t"))
    assert child.conf["summary_visible"]
    assert all(t.get_visible() for t in child.summary_arts)


def test_child_navigation(viewer_setup):
    frame = viewer_setup
    child = frame.spawn_child("expA", 0, event=1)
    # 'right' closes the child and opens the next pair
    frame._on_child_key(types.SimpleNamespace(key="right"), frame=child,
                        ind=0, event=1)
    assert child not in frame.childs and len(frame.childs) == 1
    # summaries carry the per-pair metric values
    new = frame.childs[-1]
    assert "num_matches" in new.summaries["expA"]
    # wrap-around at the end of the dataset
    frame._on_child_key(types.SimpleNamespace(key="left"), frame=new,
                        ind=0, event=1)
    assert len(frame.childs) == 1


def test_homography_tool_colors_by_error(viewer_setup):
    """The fake preds shift kpts by exactly the GT translation, so every
    match must be judged correct (green) by HomographyMatchesPlot."""
    frame = viewer_setup
    child = frame.spawn_child("expA", 2, event=1)
    child.draw("homography_matches")
    greens = [
        a for a in child.fig.artists
        if tuple(np.round(a.get_edgecolor()[:3], 1)) == (0.1, 0.8, 0.1)
    ]
    assert len(greens) > 0
    assert len(greens) == len(child.fig.artists)
