"""Extended HPatches benchmark: point AND line detector/matcher metrics
(reference: gluefactory/eval/hpatches_extended.py:120+, hpatches_lines.py —
the fork's benchmarks adding repeatability/localization and line-matching
scores to the standard homography AUC).

Per pair: keypoint rep/loc-error, line rep/loc-error (orth + struct), match
precision, DLT/robust H AUC (shared with eval/hpatches.py), line match
precision under GT H."""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..core.config import Config
from ..geometry.lines import orth_line_dist
from ..geometry.homography import warp_lines
from ..models.cache_loader import CacheLoader
from ..settings import EVAL_PATH
from ..utils.tensor import map_tensor
from .hpatches import HPatchesPipeline
from .io import get_eval_parser, parse_eval_args
from .metrics import keypoint_repeatability, line_repeatability


class HPatchesExtendedPipeline(HPatchesPipeline):
    default_conf = {
        "eval": {
            "rep_th_kp": 3.0,
            "rep_th_line": 5.0,
            "line_match_th": 5.0,
        },
    }
    export_keys = HPatchesPipeline.export_keys + [
        "keypoint_valid0", "keypoint_valid1",
        "lines0", "lines1", "valid_lines0", "valid_lines1",
        "line_matches0", "line_matching_scores0",
    ]

    def run_eval(self, loader, pred_file: Path):
        base_summaries, base_figs, base_results = super().run_eval(loader, pred_file)
        conf = self.conf.eval
        cache_loader = CacheLoader({"path": str(pred_file), "collate": False})
        results = defaultdict(list)
        for batch in tqdm(loader, desc="hpatches extended eval"):
            data = map_tensor(batch, lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x)
            name = batch["name"][0]
            pred = cache_loader(
                {"name": [name], **{k: v for k, v in batch.items() if k.startswith("view")}}
            )
            pred = {k: jnp.asarray(np.asarray(v))[None] for k, v in pred.items()}
            H = jnp.asarray(data["H_0to1"])[None]
            size1 = jnp.asarray(data["view1"]["image_size"])[None]
            v0 = pred.get("keypoint_valid0", jnp.ones(pred["keypoints0"].shape[:2], bool))
            v1 = pred.get("keypoint_valid1", jnp.ones(pred["keypoints1"].shape[:2], bool))
            rep, loc = keypoint_repeatability(
                pred["keypoints0"], pred["keypoints1"], v0, v1, H, size1,
                th=conf.rep_th_kp,
            )
            results["kp_repeatability"].append(float(rep[0]))
            results["kp_loc_error"].append(float(loc[0]))
            if "lines0" in pred:
                vl0 = pred.get("valid_lines0", jnp.ones(pred["lines0"].shape[:2], bool))
                vl1 = pred.get("valid_lines1", jnp.ones(pred["lines1"].shape[:2], bool))
                lrep, lloc = line_repeatability(
                    pred["lines0"], pred["lines1"], vl0, vl1, H, size1,
                    th=conf.rep_th_line,
                )
                results["line_repeatability"].append(float(lrep[0]))
                results["line_loc_error"].append(float(lloc[0]))
                if "line_matches0" in pred:
                    lm0 = np.asarray(pred["line_matches0"][0])
                    lv = lm0 > -1
                    if lv.any():
                        warped0, wv = warp_lines(pred["lines0"], H, size1)
                        d = orth_line_dist(
                            warped0, pred["lines1"]
                        )[0]
                        dm = np.asarray(d)[np.arange(len(lm0)), np.clip(lm0, 0, None)]
                        prec = float((dm[lv] < conf.line_match_th).mean())
                        results["line_match_precision"].append(prec)
                        results["num_line_matches"].append(int(lv.sum()))
        summaries = dict(base_summaries)
        for k, v in results.items():
            if v:
                summaries[f"m{k}"] = round(float(np.nanmean(v)), 4)
        return summaries, base_figs, {**base_results, **{k: v for k, v in results.items()}}


def main():
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    conf = parse_eval_args("hpatches_extended", args, HPatchesExtendedPipeline.default_conf)
    pipeline = HPatchesExtendedPipeline(conf)
    s, _ = pipeline.run(
        EVAL_PATH / "hpatches_extended" / args.tag,
        overwrite=args.overwrite, overwrite_eval=args.overwrite_eval,
    )
    import pprint

    pprint.pprint(s)


if __name__ == "__main__":
    main()
