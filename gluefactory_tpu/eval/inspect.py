"""Results inspector (reference: gluefactory/eval/inspect.py +
visualization/global_frame.py / two_view_frame.py).

Three modes over cached benchmark results:
  - default: print the cross-experiment summary table (+ optional cumulative
    error curve / single-pair PNG dumps);
  - ``--html``: one-file report with a sortable per-pair table and match
    renderings for the extreme pairs (server-friendly);
  - ``--interactive``: the full matplotlib viewer — per-pair metric scatter
    across experiments (GlobalFrame), click a point to open the pair with
    switchable overlay tools (TwoViewFrame). Use ``MPLBACKEND=webagg`` on a
    headless machine to serve it over HTTP.

CLI: ``python -m gluefactory_tpu.eval.inspect <benchmark> <tag> [<tag2> ...]
[--metric H_error_ransac] [--pair 0] [--out dir] [--html out.html]
[--interactive [--x metric --y metric]]``"""

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
    parser.add_argument("--html", type=str, default=None,
                        help="write a self-contained HTML report here")
    parser.add_argument("--interactive", action="store_true",
                        help="launch the matplotlib GlobalFrame viewer")
    parser.add_argument("--x", type=str, default=None)
    parser.add_argument("--y", type=str, default=None)
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

    if args.html:
        write_html_report(args.benchmark, args.tags, Path(args.html),
                          metric=args.metric)

    if args.interactive:
        launch_viewer(args.benchmark, list(all_results), all_results,
                      x=args.x, y=args.y)
        return

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




def launch_viewer(benchmark: str, tags: list[str], all_results: dict,
                  x: str | None = None, y: str | None = None):
    """Launch the interactive GlobalFrame/TwoViewFrame viewer (reference
    eval/inspect.py:24-58). The dataloader is rebuilt from the first tag's
    saved eval conf so pair indices line up with the cached predictions."""
    import matplotlib.pyplot as plt

    from . import get_benchmark
    from ..core.config import Config
    from ..visualization.global_frame import GlobalFrame
    from ..visualization.two_view_frame import TwoViewFrame

    exp_dir = EVAL_PATH / benchmark / tags[0]
    conf = Config.load(exp_dir / "conf.yaml")
    pipeline = get_benchmark(benchmark)(conf)
    loader = pipeline.get_dataloader()
    predictions = {
        tag: EVAL_PATH / benchmark / tag / "predictions.h5" for tag in tags
    }
    frame = GlobalFrame(
        {"x": x, "y": y}, all_results, loader, predictions,
        title=f"{benchmark}: {', '.join(tags)}", child_frame=TwoViewFrame,
    )
    plt.show()
    return frame


# ---------------------------------------------------------------------------
# Self-contained HTML report (the server-friendly take on the reference's
# interactive viewer: sortable per-pair metric table + embedded match
# renderings for the extreme pairs).
# ---------------------------------------------------------------------------


def _render_pair_png(exp_dir: Path, name: str, data_root: Path | None) -> bytes:
    import base64
    import io

    import h5py
    import matplotlib.pyplot as plt

    from ..visualization.viz2d import plot_images, plot_keypoints, plot_matches

    with h5py.File(str(exp_dir / "predictions.h5"), "r") as f:
        grp = f[name]
        kpts0 = np.asarray(grp["keypoints0"])
        kpts1 = np.asarray(grp["keypoints1"])
        m0 = np.asarray(grp["matches0"])
    imgs = None
    if data_root is not None:
        # hpatches layout: name = "<seq>/<i>_<j>"
        try:
            seq, pair = name.split("/")
            i, j = pair.split("_")
            from ..utils.image import read_image

            imgs = [
                read_image(data_root / seq / f"{i}.ppm") / 255.0,
                read_image(data_root / seq / f"{j}.ppm") / 255.0,
            ]
        except Exception:
            imgs = None
    if imgs is None:
        h = int(max(kpts0[:, 1].max(), kpts1[:, 1].max())) + 8
        w = int(max(kpts0[:, 0].max(), kpts1[:, 0].max())) + 8
        imgs = [np.ones((h, w)), np.ones((h, w))]
    fig, ax = plot_images(imgs, titles=[name, f"{int((m0 > -1).sum())} matches"])
    plot_keypoints(ax, [kpts0, kpts1], ps=2)
    plot_matches(ax[0], ax[1], kpts0, kpts1, m0)
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=75, bbox_inches="tight")
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def write_html_report(
    benchmark: str, tags: list[str], out: Path, metric: str | None = None,
    n_figures: int = 6,
):
    """One-file report: summary table across tags, sortable per-pair table,
    match renderings for the worst/best pairs by ``metric``."""
    import html as html_mod
    import json

    rows = []
    all_summaries = {}
    per_pair = {}
    data_root = None
    for tag in tags:
        exp_dir = EVAL_PATH / benchmark / tag
        summaries, results = load_eval(exp_dir)
        all_summaries[tag] = summaries
        per_pair[tag] = results
        try:
            from ..core.config import Config
            from ..settings import DATA_PATH

            conf = Config.load(exp_dir / "conf.yaml")
            dd = conf.get("data", {}).get("data_dir", "hpatches-sequences-release")
            data_root = Path(dd) if Path(dd).is_absolute() else DATA_PATH / dd
        except Exception:
            pass
    keys = sorted({k for s in all_summaries.values() for k in s})
    srows = "".join(
        "<tr><td>{}</td>{}</tr>".format(
            html_mod.escape(k),
            "".join(f"<td>{all_summaries[t].get(k, '')}</td>" for t in tags),
        )
        for k in keys
    )
    tag0 = tags[0]
    r0 = per_pair[tag0]
    names = [
        n.decode() if isinstance(n, bytes) else str(n)
        for n in np.asarray(r0.get("names", []))
    ]
    metric = metric or next(
        (k for k in ("H_error_ransac", "H_error_dlt", "num_matches") if k in r0),
        None,
    )
    figures = ""
    if names and metric and metric in r0:
        vals = np.asarray(r0[metric], float)
        pair_rows = [
            {"name": names[i], **{
                k: float(np.asarray(v[i]))
                for k, v in r0.items()
                if k != "names" and np.ndim(v) == 1 and i < len(v)
                and np.issubdtype(np.asarray(v).dtype, np.number)
            }}
            for i in range(len(names))
        ]
        rows = pair_rows
        order = np.argsort(np.nan_to_num(vals, nan=np.inf))
        picks = list(order[: n_figures // 2]) + list(order[::-1][: n_figures // 2])
        exp_dir = EVAL_PATH / benchmark / tag0
        for i in picks:
            try:
                b64 = _render_pair_png(exp_dir, names[i], data_root)
                figures += (
                    f"<figure><img src='data:image/png;base64,{b64}'/>"
                    f"<figcaption>{html_mod.escape(names[i])} — {metric}="
                    f"{vals[i]:.2f}</figcaption></figure>"
                )
            except Exception as e:  # pragma: no cover
                logger.warning("figure for %s failed: %s", names[i], e)
    html_doc = f"""<!DOCTYPE html><html><head><meta charset='utf-8'>
<title>{benchmark} inspector</title><style>
body{{font-family:sans-serif;margin:2em}} table{{border-collapse:collapse}}
td,th{{border:1px solid #ccc;padding:3px 8px;text-align:right}}
th{{cursor:pointer;background:#eee}} figure{{display:inline-block;margin:6px}}
img{{max-width:640px}} figcaption{{font-size:12px;text-align:center}}
</style></head><body>
<h1>{benchmark}: {', '.join(tags)}</h1>
<h2>Summaries</h2>
<table><tr><th>metric</th>{''.join(f'<th>{t}</th>' for t in tags)}</tr>{srows}</table>
<h2>Per-pair ({tag0}) — click headers to sort</h2>
<table id='pairs'></table>
<h2>Extreme pairs by {metric}</h2>{figures}
<script>
const data = {json.dumps(rows)};
const tbl = document.getElementById('pairs');
function render(rows) {{
  if (!rows.length) return;
  const cols = Object.keys(rows[0]);
  tbl.innerHTML = '<tr>' + cols.map(c =>
    `<th onclick="sortBy('${{c}}')">${{c}}</th>`).join('') + '</tr>' +
    rows.map(r => '<tr>' + cols.map(c => {{
      const v = r[c];
      return `<td>${{typeof v === 'number' ? v.toFixed(3) : v}}</td>`;
    }}).join('') + '</tr>').join('');
}}
let asc = true;
function sortBy(c) {{
  data.sort((a, b) => (a[c] > b[c] ? 1 : -1) * (asc ? 1 : -1));
  asc = !asc; render(data);
}}
render(data);
</script></body></html>"""
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(html_doc)
    logger.info("Wrote %s", out)
    return out


if __name__ == "__main__":
    main()
