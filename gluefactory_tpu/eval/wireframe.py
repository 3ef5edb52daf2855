"""Wireframe line-detection benchmark: detected segments and junctions
against the ShanghaiTech Wireframe ground-truth annotations
(reference: gluefactory/eval/wireframe.py — rep/loc-error via 1-1 segment
matching with structural/orth/area distances + junction metrics).

Single-view: the model (any line extractor — lsd/elsed/deeplsd/sold2/
jpldd+pold2) runs per image; detected segments are 1-1 matched to the GT
segments (exact LAP, eval/line_metrics.py) under both structural and orth
distances; we report repeatability @ {1,3,5} px (here: precision/recall of
the detections against GT, since the "second view" is the annotation),
localization error @ {3,5} px, and junction precision/recall @ {2,4} px
when the model outputs junctions.

CLI: python -m gluefactory_tpu.eval.wireframe --conf <model card>
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..datasets import get_dataset
from ..models.cache_loader import CacheLoader
from ..settings import EVAL_PATH
from ..utils.export_predictions import export_predictions
from ..utils.tensor import map_tensor
from .eval_pipeline import EvalPipeline
from .io import get_eval_parser, parse_eval_args
from .line_metrics import (
    match_segments_one_to_one,
    segment_distance_matrix,
    segment_localization_error,
    segment_repeatability,
)


class WireframePipeline(EvalPipeline):
    default_conf = {
        "data": {
            "name": "wireframe",
            "preprocessing": {"resize": 512, "side": "long",
                              "square_pad": True},
        },
        "model": {
            "name": "lines.lsd",
            "max_num_lines": 512,
        },
        "eval": {
            "rep_thresholds": [1.0, 3.0, 5.0],
            "loc_thresholds": [3.0, 5.0],
            "junction_thresholds": [2.0, 4.0],
            "min_overlap": 0.5,
        },
        "checkpoint": None,
    }
    export_keys = ["lines", "valid_lines"]
    optional_export_keys = [
        "line_scores", "junctions", "junction_valid", "keypoints",
        "keypoint_valid",
    ]

    def _init(self, conf):
        self.dataset = get_dataset(conf.data.name)(conf.data)

    def get_dataloader(self, data_conf=None):
        dataset = (self.dataset if data_conf is None
                   else get_dataset(data_conf.name)(data_conf))
        return dataset.get_data_loader("test")

    def get_predictions(self, experiment_dir: Path, model=None,
                        params=None) -> Path:
        import jax

        from ..core.config import Config
        from ..train import filter_batch
        from .io import load_model

        pred_file = Path(experiment_dir) / "predictions.h5"
        if model is None:
            model, params = load_model(
                Config(self.conf.model), self.conf.get("checkpoint"))
        loader = self.get_dataloader()
        jit_apply = jax.jit(lambda p, d: model.apply(p, d))
        state = {"params": None, "flat_ckpt": params}

        def apply_fn(batch):
            data = filter_batch(batch)
            data = map_tensor(data, jnp.asarray)
            if state["params"] is None:
                from .io import restore_params

                state["params"] = restore_params(
                    model.init(jax.random.key(0), data),
                    state["flat_ckpt"])
            return jit_apply(state["params"], data)

        export_predictions(
            tqdm(loader, desc="wireframe export"), apply_fn, pred_file,
            keys=self.export_keys,
            optional_keys=tuple(self.optional_export_keys),
        )
        return pred_file

    def run_eval(self, loader, pred_file: Path):
        conf = self.conf.eval
        cache_loader = CacheLoader({"path": str(pred_file),
                                    "collate": False})
        results = defaultdict(list)
        for i, batch in enumerate(tqdm(loader, desc="wireframe eval")):
            pred = cache_loader({"name": batch["name"],
                                 "idx": np.asarray([i])})
            lines = np.asarray(pred["lines"])
            lv = np.asarray(
                pred.get("valid_lines", np.ones(lines.shape[:1], bool))
            ).reshape(-1)
            det = lines[lv]
            gt = np.asarray(batch["gt_segments"])[0]
            gv = np.asarray(batch["gt_segment_valid"])[0]
            gt = gt[gv]
            results["num_lines"].append(float(len(det)))
            results["num_gt_lines"].append(float(len(gt)))
            if len(det) == 0 or len(gt) == 0:
                continue
            n0 = np.asarray([len(det)])
            n1 = np.asarray([len(gt)])
            ones0 = np.ones((1, len(det)), bool)
            ones1 = np.ones((1, len(gt)), bool)
            for kind in ("struct", "orth"):
                D = segment_distance_matrix(
                    jnp.asarray(det[None]), jnp.asarray(gt[None]),
                    kind=kind, min_overlap=float(conf.min_overlap))
                D = np.asarray(D)
                # exact LAP wants rows <= cols; the matched-count metrics
                # below are symmetric in the two sets
                if len(det) > len(gt):
                    D = D.swapaxes(1, 2)
                    _, mdist = match_segments_one_to_one(D, ones1, ones0)
                else:
                    _, mdist = match_segments_one_to_one(D, ones0, ones1)
                rep = segment_repeatability(
                    mdist, n0, n1, list(conf.rep_thresholds))
                for name, vals in rep.items():
                    results[f"{kind}_{name}px"].append(float(vals[0]))
                    ok = float((mdist[0] <= float(
                        name.split("@")[1])).sum())
                    results[f"{kind}_prec@{name.split('@')[1]}px"].append(
                        ok / len(det))
                    results[f"{kind}_recall@{name.split('@')[1]}px"].append(
                        ok / len(gt))
                loc = segment_localization_error(
                    mdist, list(conf.loc_thresholds))
                for name, vals in loc.items():
                    results[f"{kind}_{name}px"].append(float(vals[0]))
            junc = pred.get("junctions", pred.get("keypoints"))
            if junc is not None:
                junc = np.asarray(junc)
                jv = np.asarray(
                    pred.get("junction_valid",
                             pred.get("keypoint_valid",
                                      np.ones(junc.shape[0], bool)))
                ).reshape(-1)
                j = junc[jv]
                gj = np.asarray(batch["gt_junctions"])[0][
                    np.asarray(batch["gt_junction_valid"])[0]]
                if len(j) and len(gj):
                    d = np.linalg.norm(
                        j[:, None] - gj[None], axis=-1)
                    for th in conf.junction_thresholds:
                        results[f"junc_prec@{th:g}px"].append(
                            float((d.min(1) < th).mean()))
                        results[f"junc_recall@{th:g}px"].append(
                            float((d.min(0) < th).mean()))
        summaries = {
            f"m{k}": round(float(np.nanmean(v)), 3)
            for k, v in results.items()
        }
        return summaries, {}, dict(results)


def main():
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    conf = parse_eval_args("wireframe", args, WireframePipeline.default_conf)
    pipeline = WireframePipeline(conf)
    s, _ = pipeline.run(
        EVAL_PATH / "wireframe" / args.tag,
        overwrite=args.overwrite, overwrite_eval=args.overwrite_eval,
    )
    import pprint

    pprint.pprint(s)


if __name__ == "__main__":
    main()
