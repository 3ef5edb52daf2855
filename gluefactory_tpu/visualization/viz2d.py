"""2D visualization of keypoints / matches / lines / heatmaps
(reference: gluefactory/visualization/viz2d.py — matplotlib, host-side).

All functions accept numpy or jax arrays; padded slots are dropped via the
validity masks before plotting."""

from __future__ import annotations

import os

import matplotlib

# Headless default; honour an explicit backend choice (MPLBACKEND=webagg
# serves the interactive viewers from a server, DISPLAY enables Tk/Qt).
if not os.environ.get("DISPLAY") and not os.environ.get("MPLBACKEND"):
    matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np


def cm_RdGn(x):
    """Red (0) -> green (1) colormap for correctness coloring
    (reference viz2d.py:cm_RdGn)."""
    x = np.clip(np.asarray(x, float), 0, 1)[..., None]
    c = x * np.array([[0.1, 0.8, 0.1]]) + (1 - x) * np.array([[0.8, 0.1, 0.1]])
    return np.clip(c, 0, 1)


def plot_images(imgs, titles=None, cmaps="gray", dpi=100, size=4, pad=0.5):
    """(reference viz2d.py:plot_images)"""
    n = len(imgs)
    if not isinstance(cmaps, (list, tuple)):
        cmaps = [cmaps] * n
    ratios = [i.shape[1] / i.shape[0] for i in imgs]
    figsize = [sum(ratios) * size, size]
    fig, ax = plt.subplots(1, n, figsize=figsize, dpi=dpi,
                           gridspec_kw={"width_ratios": ratios})
    if n == 1:
        ax = [ax]
    for i in range(n):
        img = np.asarray(imgs[i])
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        ax[i].imshow(img, cmap=plt.get_cmap(cmaps[i]) if img.ndim == 2 else None)
        ax[i].set_axis_off()
        if titles:
            ax[i].set_title(titles[i])
    fig.tight_layout(pad=pad)
    return fig, ax


def plot_keypoints(axes, kpts, valid=None, colors="lime", ps=4):
    """(reference viz2d.py:plot_keypoints)"""
    for ax, k in zip(axes, kpts):
        k = np.asarray(k)
        if valid is not None:
            k = k[np.asarray(valid[0] if isinstance(valid, (list, tuple)) else valid)]
        ax.scatter(k[:, 0], k[:, 1], c=colors, s=ps, linewidths=0)


def plot_matches(ax0, ax1, kpts0, kpts1, matches0, color=None, lw=0.5, ps=2):
    """Draw match segments across two axes (reference viz2d.py:plot_matches)."""
    kpts0, kpts1 = np.asarray(kpts0), np.asarray(kpts1)
    m0 = np.asarray(matches0)
    valid = m0 > -1
    p0 = kpts0[valid]
    p1 = kpts1[m0[valid]]
    if color is None:
        color = ["lime"] * len(p0)
    fig = ax0.figure
    for i in range(len(p0)):
        con = matplotlib.patches.ConnectionPatch(
            xyA=p0[i], xyB=p1[i], coordsA=ax0.transData, coordsB=ax1.transData,
            color=color[i] if not isinstance(color, str) else color, linewidth=lw,
        )
        fig.add_artist(con)
    ax0.scatter(p0[:, 0], p0[:, 1], c="royalblue", s=ps)
    ax1.scatter(p1[:, 0], p1[:, 1], c="royalblue", s=ps)
    return fig


def plot_lines(axes, lines_list, valid_list=None, color="orange", lw=1.5):
    """(reference viz2d.py:plot_lines)"""
    for i, (ax, lines) in enumerate(zip(axes, lines_list)):
        lines = np.asarray(lines)
        if valid_list is not None:
            lines = lines[np.asarray(valid_list[i])]
        for seg in lines:
            ax.plot([seg[0, 0], seg[1, 0]], [seg[0, 1], seg[1, 1]], c=color, lw=lw)


def plot_heatmap(ax, heat, alpha=0.5, cmap="viridis"):
    ax.imshow(np.asarray(heat), alpha=alpha, cmap=cmap)


def plot_cumulative_error(errors_dict, thresholds=None, title="", dpi=100):
    """AUC-style cumulative error curves (reference viz2d.py)."""
    fig, ax = plt.subplots(dpi=dpi)
    for name, errs in errors_dict.items():
        errs = np.sort(np.asarray(errs, float))
        errs = errs[np.isfinite(errs)]
        if errs.size == 0:
            continue
        recall = np.arange(1, len(errs) + 1) / len(errs)
        ax.plot(errs, recall, label=name)
    if thresholds is not None:
        ax.set_xlim(0, max(thresholds))
    ax.set_xlabel("error")
    ax.set_ylabel("recall")
    ax.set_title(title)
    ax.legend()
    ax.grid(alpha=0.3)
    return fig


def save_plot(path, fig=None, **kw):
    (fig or plt.gcf()).savefig(path, bbox_inches="tight", **kw)


def cm_BlRdGn(x):
    """Blue (-1) -> red (0) -> green (1) for signed scores
    (reference viz2d.py:cm_BlRdGn)."""
    x = np.clip(np.asarray(x, float), -1, 1)[..., None]
    pos = np.clip(x, 0, 1)
    neg = np.clip(-x, 0, 1)
    c = (
        pos * np.array([[0.1, 0.8, 0.1]])
        + neg * np.array([[0.1, 0.1, 0.8]])
        + (1 - pos - neg) * np.array([[0.8, 0.1, 0.1]])
    )
    return np.clip(c, 0, 1)


def cm_ranking(scores, ths=(512, 1024, 2048, 4096)):
    """Color keypoints by score rank bucket (reference viz2d.py:cm_ranking)."""
    scores = np.asarray(scores, float)
    order = np.argsort(-scores)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(scores))
    colors = np.array(
        [[0.1, 0.8, 0.1], [0.6, 0.8, 0.1], [0.8, 0.6, 0.1], [0.8, 0.3, 0.1],
         [0.8, 0.1, 0.1]]
    )
    bucket = np.searchsorted(np.asarray(ths), rank)
    return colors[np.clip(bucket, 0, len(colors) - 1)]


def add_text(ax, text, pos=(0.01, 0.99), fs=15, color="w", lcolor="k", lwidth=2,
             ha="left", va="top", **kwargs):
    """(reference viz2d.py:add_text)"""
    import matplotlib.patheffects as path_effects

    t = ax.text(
        *pos, text, fontsize=fs, ha=ha, va=va, color=color,
        transform=ax.transAxes, **kwargs,
    )
    if lcolor is not None:
        t.set_path_effects(
            [
                path_effects.Stroke(linewidth=lwidth, foreground=lcolor),
                path_effects.Normal(),
            ]
        )
    return t


def plot_image_grid(imgs, titles=None, cmaps="gray", dpi=100, size=3, pad=0.5):
    """Rows x cols grid of images (reference viz2d.py:plot_image_grid).
    imgs: list of rows, each a list of images. Returns (fig, axes 2D)."""
    nr = len(imgs)
    nc = len(imgs[0])
    if not isinstance(cmaps, (list, tuple)):
        cmaps = [cmaps] * nc
    fig, axes = plt.subplots(
        nr, nc, figsize=(nc * size, nr * size), dpi=dpi, squeeze=False
    )
    for r in range(nr):
        for c in range(nc):
            ax = axes[r][c]
            ax.imshow(
                np.asarray(imgs[r][c]),
                cmap=plt.get_cmap(cmaps[c]) if imgs[r][c].ndim == 2 else None,
            )
            ax.set_axis_off()
            if titles is not None:
                ax.set_title(titles[r][c])
    fig.tight_layout(pad=pad)
    return fig, axes


def _epipolar_line_endpoints(line, w, h):
    """Intersect homogeneous image line ax+by+c=0 with the image border."""
    a, b, c = line
    pts = []
    if abs(b) > 1e-12:
        for x in (0.0, w - 1.0):
            y = -(a * x + c) / b
            if 0 <= y <= h - 1:
                pts.append((x, y))
    if abs(a) > 1e-12:
        for y in (0.0, h - 1.0):
            x = -(b * y + c) / a
            if 0 <= x <= w - 1:
                pts.append((x, y))
    return pts[:2]


def plot_epipolar_lines(ax0, ax1, F, kpts0, kpts1, color="orange", lw=0.75):
    """Draw epipolar lines of kpts0 in view 1 (l1 = F x0) and of kpts1 in
    view 0 (l0 = F^T x1) (reference viz2d.py:plot_epipolar_lines:311)."""
    F = np.asarray(F, float)
    h1, w1 = ax1.images[0].get_array().shape[:2]
    h0, w0 = ax0.images[0].get_array().shape[:2]
    for kp in np.asarray(kpts0, float):
        l1 = F @ np.array([kp[0], kp[1], 1.0])
        pts = _epipolar_line_endpoints(l1, w1, h1)
        if len(pts) == 2:
            ax1.plot(*zip(*pts), color=color, lw=lw)
    for kp in np.asarray(kpts1, float):
        l0 = F.T @ np.array([kp[0], kp[1], 1.0])
        pts = _epipolar_line_endpoints(l0, w0, h0)
        if len(pts) == 2:
            ax0.plot(*zip(*pts), color=color, lw=lw)


def plot_color_line_matches(ax0, ax1, lines0, lines1, matches0, lw=2.0):
    """Matched line pairs share a color; unmatched lines are gray
    (reference viz2d.py:plot_color_line_matches:400)."""
    lines0 = np.asarray(lines0, float)
    lines1 = np.asarray(lines1, float)
    matches0 = np.asarray(matches0)
    n_match = int((matches0 > -1).sum())
    cmap = plt.get_cmap("hsv")
    ci = 0
    for i, l0 in enumerate(lines0):
        m = matches0[i]
        if m > -1:
            color = cmap(ci / max(n_match, 1))
            ci += 1
            l1 = lines1[int(m)]
            ax1.plot(l1[:, 0], l1[:, 1], color=color, lw=lw)
        else:
            color = (0.6, 0.6, 0.6, 0.7)
        ax0.plot(l0[:, 0], l0[:, 1], color=color, lw=lw)
