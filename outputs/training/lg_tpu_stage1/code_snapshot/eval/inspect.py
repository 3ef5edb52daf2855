"""Results inspector (reference: gluefactory/eval/inspect.py +
visualization/global_frame.py / two_view_frame.py — the interactive matplotlib
viewer over cached benchmark results).

Headless-friendly version: prints the summary table, per-pair metric
scatter, and renders match figures for selected pairs to PNG (interactive
click-through requires a display; on servers use --pair to dump figures).

CLI: ``python -m gluefactory_tpu.eval.inspect <benchmark> <tag> [<tag2> ...]
[--metric H_error_ransac] [--pair 0] [--out dir]``"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from .. import logger
from ..settings import EVAL_PATH
from .eval_pipeline import load_eval


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("benchmark")
    parser.add_argument("tags", nargs="+")
    parser.add_argument("--metric", type=str, default=None)
    parser.add_argument("--pair", type=int, default=None)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    all_summaries = {}
    all_results = {}
    for tag in args.tags:
        exp_dir = EVAL_PATH / args.benchmark / tag
        if not exp_dir.exists():
            logger.error("No results at %s", exp_dir)
            continue
        summaries, results = load_eval(exp_dir)
        all_summaries[tag] = summaries
        all_results[tag] = results

    # summary table
    keys = sorted({k for s in all_summaries.values() for k in s})
    w = max(len(k) for k in keys) + 2
    header = " " * w + "  ".join(f"{t:>14}" for t in all_summaries)
    print(header)
    for k in keys:
        row = f"{k:<{w}}" + "  ".join(
            f"{all_summaries[t].get(k, float('nan')):>14}" for t in all_summaries
        )
        print(row)

    # per-pair metric comparison
    if args.metric:
        from ..visualization.viz2d import plot_cumulative_error, save_plot

        errors = {
            t: np.asarray(r[args.metric])
            for t, r in all_results.items()
            if args.metric in r
        }
        if errors:
            fig = plot_cumulative_error(errors, title=args.metric)
            out = Path(args.out or ".") / f"{args.benchmark}_{args.metric}.png"
            save_plot(out, fig)
            logger.info("Wrote %s", out)

    # dump a specific pair's matches
    if args.pair is not None:
        import h5py

        from ..visualization.viz2d import plot_images, plot_matches, save_plot

        tag = args.tags[0]
        exp_dir = EVAL_PATH / args.benchmark / tag
        with h5py.File(str(exp_dir / "predictions.h5"), "r") as f:
            names = sorted(f.keys())
            name = names[args.pair]
            grp = f[name]
            kpts0 = np.asarray(grp["keypoints0"])
            kpts1 = np.asarray(grp["keypoints1"])
            m0 = np.asarray(grp["matches0"])
        logger.info("Pair %s: %d matches", name, int((m0 > -1).sum()))
        fig, ax = plot_images(
            [np.zeros((480, 640)), np.zeros((480, 640))], titles=[name, tag]
        )
        plot_matches(ax[0], ax[1], kpts0, kpts1, m0)
        out = Path(args.out or ".") / f"{args.benchmark}_{tag}_pair{args.pair}.png"
        save_plot(out, fig)
        logger.info("Wrote %s", out)


if __name__ == "__main__":
    main()
