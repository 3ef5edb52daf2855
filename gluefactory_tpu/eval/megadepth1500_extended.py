"""MegaDepth-1500 extended: point AND line matching under epipolar geometry
(reference: gluefactory/eval/megadepth1500_extended.py:99-229 — the fork's
variant that additionally exports line predictions and scores them; pose AUC
is shared with the base benchmark).

Adds to eval/megadepth1500.py:
  - line exports (lines, validity, matches, scores),
  - line-match epipolar precision: points sampled along each matched segment
    pair, scored with the generalized epipolar distance at
    {1e-4, 5e-4, 1e-3} (the point thresholds of eval_matches_epipolar).

CLI: python -m gluefactory_tpu.eval.megadepth1500_extended --conf <card>
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..geometry.epipolar import T_to_E
from ..geometry.lines import sample_points_on_lines
from ..models.cache_loader import CacheLoader
from ..settings import EVAL_PATH
from ..utils.tensor import map_tensor
from .io import get_eval_parser, parse_eval_args
from .megadepth1500 import MegaDepth1500Pipeline


class MegaDepth1500ExtendedPipeline(MegaDepth1500Pipeline):
    default_conf = {
        "eval": {"line_samples": 8},
    }
    export_keys = MegaDepth1500Pipeline.export_keys
    optional_export_keys = [
        "lines0", "lines1", "valid_lines0", "valid_lines1",
        "line_scores0", "line_scores1",
        "line_matches0", "line_matches1",
        "line_matching_scores0", "line_matching_scores1",
    ]

    def run_eval(self, loader, pred_file: Path):
        summaries, figures, results = super().run_eval(loader, pred_file)
        conf = self.conf.eval
        cache_loader = CacheLoader({"path": str(pred_file), "collate": False})
        line_results = defaultdict(list)
        n_samples = int(conf.line_samples)
        for batch in tqdm(loader, desc="md1500 extended lines"):
            data = map_tensor(
                batch, lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x
            )
            name = batch["name"][0]
            pred = cache_loader(
                {"name": [name],
                 **{k: v for k, v in batch.items() if k.startswith("view")}}
            )
            if "lines0" not in pred:
                continue
            pred = {k: jnp.asarray(np.asarray(v)) for k, v in pred.items()}
            lm0 = np.asarray(pred.get("line_matches0", -np.ones(
                pred["lines0"].shape[0], np.int32)))
            matched = lm0 > -1
            if not matched.any():
                line_results["num_line_matches"].append(0)
                continue
            cam0 = batch["camera0"]
            cam1 = batch["camera1"]
            T = batch["T_0to1"]
            E = T_to_E(T)[0]
            segs0 = pred["lines0"][jnp.asarray(matched)]
            segs1 = pred["lines1"][jnp.asarray(np.clip(lm0, 0, None)[matched])]
            p0 = sample_points_on_lines(segs0[None], n_samples)[0]
            r0 = cam0.image2cam(p0.reshape(1, -1, 2))[0]
            n_m = segs0.shape[0]
            # points along matched segments correspond only up to position
            # along the line, so score each sample's epipolar LINE against
            # the whole matched SEGMENT: zero if the line crosses it, else
            # the nearer endpoint's line distance (a point-to-point epipolar
            # residual would penalize correct matches whose detections cover
            # different extents of the same 3-D line)
            # image2cam already returns homogeneous unit-depth rays
            lines1 = jnp.einsum("ij,nj->ni", E, r0).reshape(
                n_m, n_samples, 3)
            ends_h = cam1.image2cam(
                segs1.reshape(1, -1, 2))[0].reshape(n_m, 2, 3)
            nrm = jnp.linalg.norm(lines1[..., :2], axis=-1)
            sa = jnp.einsum("nsk,nk->ns", lines1, ends_h[:, 0]) / nrm
            sb = jnp.einsum("nsk,nk->ns", lines1, ends_h[:, 1]) / nrm
            d = np.asarray(jnp.where(
                sa * sb <= 0, 0.0, jnp.minimum(jnp.abs(sa), jnp.abs(sb))
            ))
            med = np.median(d, axis=1)
            for th in (1e-4, 5e-4, 1e-3):
                line_results[f"line_epi_prec@{th:.0e}"].append(
                    float((med < th).mean())
                )
            line_results["num_line_matches"].append(int(matched.sum()))
        for k, v in line_results.items():
            if v:
                summaries[f"m{k}"] = round(float(np.nanmean(v)), 4)
        return summaries, figures, {**results, **line_results}


def main():
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    conf = parse_eval_args(
        "megadepth1500_extended", args, MegaDepth1500ExtendedPipeline.default_conf
    )
    pipeline = MegaDepth1500ExtendedPipeline(conf)
    s, _ = pipeline.run(
        EVAL_PATH / "megadepth1500_extended" / args.tag,
        overwrite=args.overwrite, overwrite_eval=args.overwrite_eval,
    )
    import pprint

    pprint.pprint(s)


if __name__ == "__main__":
    main()
