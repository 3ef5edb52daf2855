"""Per-pair plot tools for the interactive result viewers (reference:
gluefactory/visualization/tools.py:117-465 — the ``__plot_dict__`` registry
used by TwoViewFrame).

Each tool is a class with a ``required_keys`` attribute and a constructor
``Tool(fig, axes, data, preds)`` that draws onto a grid of axes (one row per
experiment, two columns = the two views). A tool is offered only when every
experiment's prediction cache contains all ``required_keys`` (keys present in
the data batch also count). Unlike the reference, tool switching is plain
keyboard-driven — no matplotlib ``toolmanager`` dependency — so the frames
work on any backend (Agg for tests, webagg/TkAgg interactively).

Conventions: ``data`` is a collated batch of one pair (``view0``/``view1``
with HWC images); ``preds`` maps experiment name -> unbatched prediction dict
of numpy arrays (as served by ``models.cache_loader.CacheLoader``).
"""

from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np

from . import viz2d


def _np(x):
    return np.asarray(x)


def _unbatch(x):
    x = _np(x)
    return x[0] if x.ndim > 0 and x.shape[0] == 1 else x


def _valid_mask(pred: dict, base: str, vid: str) -> np.ndarray | None:
    """Padded-slot mask for ``<base><vid>`` (static-shape exports carry either
    an explicit validity mask or zero-score padding)."""
    n = len(_np(pred[f"{base}{vid}"]))
    mask_keys = {
        "keypoints": (f"keypoint_valid{vid}",),  # cache_loader convention
        "lines": (f"valid_lines{vid}",),
    }[base]
    for key in mask_keys:
        if key in pred:
            return _np(pred[key]).astype(bool)[:n]
    skey = {"keypoints": f"keypoint_scores{vid}", "lines": f"line_scores{vid}"}.get(
        base
    )
    if skey and skey in pred:
        s = _np(pred[skey])[:n]
        if (s <= 0).any():  # zero/negative-score slots are padding
            return s > 0
    return None


def _images(data: dict) -> list[np.ndarray]:
    imgs = []
    for vid in ("0", "1"):
        img = _unbatch(data[f"view{vid}"]["image"])
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        imgs.append(np.asarray(img))
    return imgs


class ImagePlot:
    required_keys = ["view0", "view1"]

    def __init__(self, fig, axes, data, preds):
        pass  # the frame already shows the images


class KeypointPlot:
    required_keys = ["keypoints0", "keypoints1"]

    def __init__(self, fig, axes, data, preds):
        for row, pred in zip(axes, preds.values()):
            for vid, ax in zip(("0", "1"), row):
                kp = _np(pred[f"keypoints{vid}"])
                valid = _valid_mask(pred, "keypoints", vid)
                if valid is not None:
                    kp = kp[valid]
                ax.scatter(kp[:, 0], kp[:, 1], c="lime", s=4, linewidths=0)


class KeypointRankingPlot:
    required_keys = [
        "keypoints0",
        "keypoints1",
        "keypoint_scores0",
        "keypoint_scores1",
    ]

    def __init__(self, fig, axes, data, preds):
        for row, pred in zip(axes, preds.values()):
            for vid, ax in zip(("0", "1"), row):
                kp = _np(pred[f"keypoints{vid}"])
                sc = _np(pred[f"keypoint_scores{vid}"])
                valid = _valid_mask(pred, "keypoints", vid)
                if valid is not None:
                    kp, sc = kp[valid], sc[valid]
                ax.scatter(
                    kp[:, 0], kp[:, 1], c=viz2d.cm_ranking(sc), s=4, linewidths=0
                )


class KeypointScoresPlot:
    required_keys = KeypointRankingPlot.required_keys

    def __init__(self, fig, axes, data, preds):
        for row, pred in zip(axes, preds.values()):
            for vid, ax in zip(("0", "1"), row):
                kp = _np(pred[f"keypoints{vid}"])
                sc = _np(pred[f"keypoint_scores{vid}"]).astype(float)
                valid = _valid_mask(pred, "keypoints", vid)
                if valid is not None:
                    kp, sc = kp[valid], sc[valid]
                rng = sc.max() - sc.min()
                c = plt.get_cmap("viridis")((sc - sc.min()) / (rng + 1e-12))
                ax.scatter(kp[:, 0], kp[:, 1], c=c, s=6, linewidths=0)


class HeatmapPlot:
    required_keys = ["heatmap0", "heatmap1"]

    def __init__(self, fig, axes, data, preds):
        for row, pred in zip(axes, preds.values()):
            for vid, ax in zip(("0", "1"), row):
                heat = np.squeeze(_np(pred[f"heatmap{vid}"]))
                if heat.ndim == 3:  # CHW logits -> max over channels
                    heat = heat.max(0)
                viz2d.plot_heatmap(ax, heat, alpha=0.6, cmap="Spectral_r")


def _matched_pairs(pred: dict):
    kp0 = _np(pred["keypoints0"])
    kp1 = _np(pred["keypoints1"])
    m0 = _np(pred["matches0"]).astype(int)
    valid = m0 > -1
    vmask = _valid_mask(pred, "keypoints", "0")
    if vmask is not None:
        valid = valid & vmask
    return kp0[valid], kp1[np.clip(m0[valid], 0, len(kp1) - 1)], valid


class MatchesPlot:
    """Matches colored by matching confidence (reference MatchesPlot:191)."""

    required_keys = ["keypoints0", "keypoints1", "matches0", "matching_scores0"]

    def __init__(self, fig, axes, data, preds):
        for row, (name, pred) in zip(axes, preds.items()):
            p0, p1, valid = _matched_pairs(pred)
            sc = _np(pred["matching_scores0"]).astype(float)[valid]
            viz2d.plot_matches(
                row[0], row[1], p0, p1, np.arange(len(p0)),
                color=list(plt.get_cmap("turbo")(np.clip(sc, 0, 1))), lw=0.5,
            )
            viz2d.add_text(row[0], f"{len(p0)} matches", pos=(0.01, 0.01),
                           fs=10, va="bottom")


class GtMatchesPlot:
    """Matches colored by ground-truth correctness (reference
    GtMatchesPlot:248): green = agrees with gt_matches0, red = wrong."""

    required_keys = ["keypoints0", "keypoints1", "matches0", "gt_matches0"]

    def __init__(self, fig, axes, data, preds):
        gt_src = None
        if "gt_matches0" in _first(preds):
            gt_src = "pred"
        for row, (name, pred) in zip(axes, preds.items()):
            gt = _np(pred["gt_matches0"] if gt_src == "pred"
                     else _unbatch(data["gt_matches0"])).astype(int)
            m0 = _np(pred["matches0"]).astype(int)
            p0, p1, valid = _matched_pairs(pred)
            correct = (m0 == gt)[valid]
            viz2d.plot_matches(
                row[0], row[1], p0, p1, np.arange(len(p0)),
                color=list(viz2d.cm_RdGn(correct.astype(float))), lw=0.5,
            )
            n_gt = int((gt > -1).sum())
            viz2d.add_text(
                row[0],
                f"{int(correct.sum())}/{len(p0)} correct · {n_gt} gt",
                pos=(0.01, 0.01), fs=10, va="bottom",
            )


class HomographyMatchesPlot:
    """Matches colored by reprojection error under the GT homography
    (reference HomographyMatchesPlot:307), threshold 3 px."""

    required_keys = ["keypoints0", "keypoints1", "matches0", "H_0to1"]
    threshold = 3.0

    def __init__(self, fig, axes, data, preds):
        H = _unbatch(data["H_0to1"]).astype(float)
        for row, (name, pred) in zip(axes, preds.items()):
            p0, p1, _ = _matched_pairs(pred)
            proj = (np.concatenate([p0, np.ones((len(p0), 1))], -1) @ H.T)
            proj = proj[:, :2] / np.maximum(np.abs(proj[:, 2:]), 1e-12) * np.sign(
                proj[:, 2:]
            )
            err = np.linalg.norm(proj - p1, axis=-1)
            viz2d.plot_matches(
                row[0], row[1], p0, p1, np.arange(len(p0)),
                color=list(viz2d.cm_RdGn(1.0 - np.clip(err / self.threshold, 0, 1))),
                lw=0.5,
            )
            ok = err < self.threshold
            viz2d.add_text(
                row[0],
                f"{int(ok.sum())}/{len(p0)} < {self.threshold:g}px "
                f"(med {np.median(err) if len(err) else float('nan'):.2f}px)",
                pos=(0.01, 0.01), fs=10, va="bottom",
            )


class EpipolarMatchesPlot:
    """Matches colored by symmetric epipolar error from the GT relative pose,
    plus epipolar lines for a subsample (reference EpipolarMatchesPlot:366)."""

    required_keys = ["keypoints0", "keypoints1", "matches0", "T_0to1", "view0",
                     "view1"]
    threshold = 5.0  # px
    n_lines = 12

    def __init__(self, fig, axes, data, preds):
        T = data["T_0to1"]
        R = _unbatch(T.R if hasattr(T, "R") else T["R"]).astype(float)
        t = _unbatch(T.t if hasattr(T, "t") else T["t"]).astype(float)
        K0 = _unbatch(data["view0"]["camera"].calibration_matrix()).astype(float)
        K1 = _unbatch(data["view1"]["camera"].calibration_matrix()).astype(float)
        tx = np.array(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]], float
        )
        F = np.linalg.inv(K1).T @ (tx @ R) @ np.linalg.inv(K0)
        for row, (name, pred) in zip(axes, preds.items()):
            p0, p1, _ = _matched_pairs(pred)
            x0 = np.concatenate([p0, np.ones((len(p0), 1))], -1)
            x1 = np.concatenate([p1, np.ones((len(p1), 1))], -1)
            Fx0 = x0 @ F.T
            Ftx1 = x1 @ F
            d = np.abs(np.sum(x1 * Fx0, -1))
            err = 0.5 * d * (
                1.0 / np.maximum(np.hypot(Fx0[:, 0], Fx0[:, 1]), 1e-12)
                + 1.0 / np.maximum(np.hypot(Ftx1[:, 0], Ftx1[:, 1]), 1e-12)
            )
            viz2d.plot_matches(
                row[0], row[1], p0, p1, np.arange(len(p0)),
                color=list(viz2d.cm_RdGn(1.0 - np.clip(err / self.threshold, 0, 1))),
                lw=0.5,
            )
            if len(p0):
                sel = np.linspace(0, len(p0) - 1, min(self.n_lines, len(p0)))
                sel = np.unique(sel.astype(int))
                viz2d.plot_epipolar_lines(row[0], row[1], F, p0[sel], p1[sel])
            viz2d.add_text(
                row[0],
                f"med epi {np.median(err) if len(err) else float('nan'):.2f}px",
                pos=(0.01, 0.01), fs=10, va="bottom",
            )


class LinePlot:
    required_keys = ["lines0", "lines1"]

    def __init__(self, fig, axes, data, preds):
        for row, pred in zip(axes, preds.values()):
            for vid, ax in zip(("0", "1"), row):
                lines = _np(pred[f"lines{vid}"])
                valid = _valid_mask(pred, "lines", vid)
                viz2d.plot_lines([ax], [lines],
                                 [valid] if valid is not None else None)


class LineMatchesPlot:
    required_keys = ["lines0", "lines1", "line_matches0"]

    def __init__(self, fig, axes, data, preds):
        for row, pred in zip(axes, preds.values()):
            viz2d.plot_color_line_matches(
                row[0], row[1], _np(pred["lines0"]), _np(pred["lines1"]),
                _np(pred["line_matches0"]).astype(int),
            )


class GtLineMatchesPlot:
    required_keys = ["lines0", "lines1", "line_matches0", "line_gt_matches0"]

    def __init__(self, fig, axes, data, preds):
        for row, pred in zip(axes, preds.values()):
            gt = _np(pred["line_gt_matches0"]).astype(int)
            m0 = _np(pred["line_matches0"]).astype(int)
            l0 = _np(pred["lines0"])
            l1 = _np(pred["lines1"])
            matched = m0 > -1
            correct = matched & (m0 == gt)
            for i in np.flatnonzero(matched):
                c = (0.1, 0.8, 0.1) if correct[i] else (0.8, 0.1, 0.1)
                row[0].plot(l0[i, :, 0], l0[i, :, 1], color=c, lw=2.0)
                j = m0[i]
                row[1].plot(l1[j, :, 0], l1[j, :, 1], color=c, lw=2.0)
            viz2d.add_text(
                row[0], f"{int(correct.sum())}/{int(matched.sum())} correct",
                pos=(0.01, 0.01), fs=10, va="bottom",
            )


def _first(d: dict) -> dict:
    return next(iter(d.values())) if d else {}


PLOT_TOOLS = {
    "image": ImagePlot,
    "keypoints": KeypointPlot,
    "keypoint_ranking": KeypointRankingPlot,
    "keypoint_scores": KeypointScoresPlot,
    "heatmaps": HeatmapPlot,
    "matches": MatchesPlot,
    "gt_matches": GtMatchesPlot,
    "homography_matches": HomographyMatchesPlot,
    "epipolar_matches": EpipolarMatchesPlot,
    "lines": LinePlot,
    "line_matches": LineMatchesPlot,
    "gt_line_matches": GtLineMatchesPlot,
}
