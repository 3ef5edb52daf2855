"""HPatches line-detection/matching benchmark
(reference: gluefactory/eval/hpatches_lines.py + hpatches_lines_H_err.py —
the fork's line-only evaluations).

Per pair, with GT homography H_1_k:
  - warp the view-0 segments by H, 1-1 match them to the view-1 segments
    (orth distance with mutual-overlap gating AND structural distance,
    exact LAP — eval/line_metrics.py),
  - repeatability @ {1, 3, 5} px and localization error @ {3, 5} px for both
    distances,
  - if the model exported line matches: match precision/recall against the
    1-1 geometric assignment,
  - if enough line matches: robust H from matched segments via the hybrid
    point+line RANSAC -> line-based H corner-error AUC (≙ the reference's
    hpatches_lines_H_err).

CLI: python -m gluefactory_tpu.eval.hpatches_lines --conf <model card>
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..geometry.homography import homography_corner_error, warp_lines
from ..models.cache_loader import CacheLoader
from ..robust_estimators import load_estimator
from ..settings import EVAL_PATH
from ..utils.tensor import map_tensor
from ..utils.tools import AUCMetric
from .eval_pipeline import EvalPipeline
from .io import get_eval_parser, parse_eval_args
from .line_metrics import (
    match_segments_one_to_one,
    segment_distance_matrix,
    segment_localization_error,
    segment_repeatability,
)

from ..datasets import get_dataset
from ..utils.export_predictions import export_predictions


class HPatchesLinesPipeline(EvalPipeline):
    default_conf = {
        "data": {
            "name": "hpatches",
            "preprocessing": {"resize": 480, "side": "short"},
        },
        "model": {
            "name": "two_view_pipeline",
            "extractor": {
                "name": "lines.lsd",
                "max_num_lines": 256,
            },
        },
        "eval": {
            "rep_thresholds": [1.0, 3.0, 5.0],
            "loc_thresholds": [3.0, 5.0],
            "min_overlap": 0.5,
            "ransac_th": 3.0,
        },
        "checkpoint": None,
    }
    export_keys = [
        "lines0", "lines1", "valid_lines0", "valid_lines1",
    ]
    optional_export_keys = [
        "line_scores0", "line_scores1", "line_matches0", "line_matches1",
        "line_matching_scores0", "line_matching_scores1",
    ]

    def _init(self, conf):
        self.dataset = get_dataset(conf.data.name)(conf.data)

    def get_dataloader(self, data_conf=None):
        dataset = self.dataset if data_conf is None else get_dataset(data_conf.name)(data_conf)
        return dataset.get_data_loader("test")

    def get_predictions(self, experiment_dir: Path, model=None, params=None) -> Path:
        import jax

        from ..core.config import Config
        from ..train import filter_batch
        from .io import load_model

        pred_file = Path(experiment_dir) / "predictions.h5"
        if model is None:
            model, params = load_model(
                Config(self.conf.model), self.conf.get("checkpoint")
            )
        loader = self.get_dataloader()
        jit_apply = jax.jit(lambda p, d: model.apply(p, d))
        state = {"params": None, "flat_ckpt": params}

        def apply_fn(batch):
            data = filter_batch(batch)
            data = map_tensor(data, jnp.asarray)
            if state["params"] is None:
                from .io import restore_params

                state["params"] = restore_params(
                    model.init(jax.random.key(0), data), state["flat_ckpt"]
                )
            return jit_apply(state["params"], data)

        export_predictions(
            tqdm(loader, desc="hpatches_lines export"), apply_fn, pred_file,
            keys=self.export_keys, optional_keys=tuple(self.optional_export_keys),
        )
        return pred_file

    def run_eval(self, loader, pred_file: Path):
        conf = self.conf.eval
        cache_loader = CacheLoader({"path": str(pred_file), "collate": False})
        results = defaultdict(list)
        auc_line_h = AUCMetric([1, 3, 5])
        for batch in tqdm(loader, desc="hpatches_lines eval"):
            data = map_tensor(
                batch, lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x
            )
            name = batch["name"][0]
            pred = cache_loader(
                {"name": [name], **{k: v for k, v in batch.items() if k.startswith("view")}}
            )
            pred = {k: jnp.asarray(np.asarray(v))[None] for k, v in pred.items()}
            H = jnp.asarray(data["H_0to1"])[None]
            size1 = jnp.asarray(data["view1"]["image_size"])[None]
            segs0 = pred["lines0"]
            segs1 = pred["lines1"]
            vl0 = np.asarray(
                pred.get("valid_lines0", jnp.ones(segs0.shape[:2], bool))
            )
            vl1 = np.asarray(
                pred.get("valid_lines1", jnp.ones(segs1.shape[:2], bool))
            )
            warped0, w_valid = warp_lines(segs0, H, size1)
            vl0w = vl0 & np.asarray(w_valid)
            n0 = vl0w.sum(-1)
            n1 = vl1.sum(-1)
            results["num_lines0"].append(int(n0[0]))
            results["num_lines1"].append(int(n1[0]))
            assigns = {}
            for kind in ("orth", "struct"):
                dist = segment_distance_matrix(
                    warped0, segs1, kind=kind, min_overlap=float(conf.min_overlap)
                )
                assign, mdist = match_segments_one_to_one(dist, vl0w, vl1)
                assigns[kind] = assign
                for k, v in segment_repeatability(
                    mdist, n0, n1, list(conf.rep_thresholds)
                ).items():
                    results[f"{kind}_{k}"].append(float(v[0]))
                for k, v in segment_localization_error(
                    mdist, list(conf.loc_thresholds)
                ).items():
                    results[f"{kind}_{k}"].append(float(v[0]))
            # matcher metrics vs the geometric 1-1 assignment
            if "line_matches0" in pred:
                lm0 = np.asarray(pred["line_matches0"][0])
                gt = assigns["orth"][0]
                matched = lm0 > -1
                if matched.any():
                    correct = matched & (lm0 == gt)
                    results["line_match_precision"].append(
                        float(correct.sum() / max(matched.sum(), 1))
                    )
                    results["line_match_recall"].append(
                        float(correct.sum() / max((gt >= 0).sum(), 1))
                    )
                    results["num_line_matches"].append(int(matched.sum()))
                    # H from matched segments (hybrid point+line RANSAC with
                    # an empty point set -> line-only estimation)
                    m1 = np.clip(lm0, 0, None)
                    est = load_estimator("homography", "hybrid_ransac")(
                        {"ransac_th": float(conf.ransac_th)}
                    )
                    out = est({
                        "m_kpts0": jnp.zeros((0, 2), jnp.float32),
                        "m_kpts1": jnp.zeros((0, 2), jnp.float32),
                        "m_lines0": segs0[0][jnp.asarray(matched)],
                        "m_lines1": segs1[0][jnp.asarray(m1[matched])],
                    })
                    if out["success"]:
                        err = float(
                            np.asarray(
                                homography_corner_error(
                                    out["M_0to1"], H[0], size1[0]
                                )
                            )
                        )
                        results["H_error_lines"].append(err)
                        auc_line_h.update([err])
        summaries = {}
        for k, v in results.items():
            if v:
                summaries[f"m{k}"] = round(float(np.nanmean(v)), 4)
        if results.get("H_error_lines"):
            for t, a in zip([1, 3, 5], auc_line_h.compute()):
                summaries[f"H_error_lines@{t}px"] = round(float(a), 4)
        return summaries, {}, dict(results)


def main():
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    conf = parse_eval_args(
        "hpatches_lines", args, HPatchesLinesPipeline.default_conf
    )
    pipeline = HPatchesLinesPipeline(conf)
    s, _ = pipeline.run(
        EVAL_PATH / "hpatches_lines" / args.tag,
        overwrite=args.overwrite, overwrite_eval=args.overwrite_eval,
    )
    import pprint

    pprint.pprint(s)


if __name__ == "__main__":
    main()
