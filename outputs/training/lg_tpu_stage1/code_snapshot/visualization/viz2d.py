"""2D visualization of keypoints / matches / lines / heatmaps
(reference: gluefactory/visualization/viz2d.py — matplotlib, host-side).

All functions accept numpy or jax arrays; padded slots are dropped via the
validity masks before plotting."""

from __future__ import annotations

import matplotlib
import matplotlib.pyplot as plt
import numpy as np

matplotlib.use("Agg")


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
