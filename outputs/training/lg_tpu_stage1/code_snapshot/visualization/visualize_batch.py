"""Training-time qualitative match figures
(reference: gluefactory/visualization/visualize_batch.py:7-57): matches drawn
green/red by homography or epipolar correctness."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..geometry.epipolar import generalized_epi_dist
from ..geometry.homography import sym_homography_error
from .viz2d import cm_RdGn, plot_images, plot_matches


def make_match_figures(pred: dict, data: dict, n_pairs: int = 2) -> dict:
    figs = {}
    images0 = np.asarray(data["view0"]["image"])
    images1 = np.asarray(data["view1"]["image"])
    for i in range(min(n_pairs, images0.shape[0])):
        kpts0 = np.asarray(pred["keypoints0"][i])
        kpts1 = np.asarray(pred["keypoints1"][i])
        m0 = np.asarray(pred["matches0"][i])
        valid = m0 > -1
        p0, p1 = kpts0[valid], kpts1[np.clip(m0[valid], 0, None)]
        if "H_0to1" in data:
            err = np.asarray(
                sym_homography_error(
                    jnp.asarray(p0)[None], jnp.asarray(p1)[None],
                    jnp.asarray(data["H_0to1"][i])[None],
                )
            )[0]
            correct = np.clip(1.0 - err / 5.0, 0, 1)
        elif "T_0to1" in data:
            err = np.asarray(
                generalized_epi_dist(
                    jnp.asarray(p0)[None], jnp.asarray(p1)[None],
                    data["view0"]["camera"][i], data["view1"]["camera"][i],
                    data["T_0to1"][i],
                )
            )[0]
            correct = np.clip(1.0 - err / 1e-3, 0, 1)
        else:
            correct = np.ones(len(p0))
        fig, ax = plot_images([images0[i], images1[i]])
        colors = [tuple(c) for c in cm_RdGn(correct)]
        fake_m = np.full(len(p0), -1)
        # draw directly with the matched subsets
        for j in range(len(p0)):
            import matplotlib.patches as mpatches

            con = mpatches.ConnectionPatch(
                xyA=p0[j], xyB=p1[j], coordsA=ax[0].transData,
                coordsB=ax[1].transData, color=colors[j], linewidth=0.5,
            )
            fig.add_artist(con)
        figs[f"match_fig_{i}"] = fig
    return figs
