"""MegaDepth-1500 relative-pose benchmark
(reference: gluefactory/eval/megadepth1500.py:26-189).

Per pair: epipolar matching precision + robust essential estimation swept over
RANSAC thresholds; summary = pose AUC@{5,10,20}deg at the best threshold.

Expects ``megadepth1500/pairs_calibrated.txt`` + images under DATA_PATH (see
datasets/image_pairs.py for the line format).

CLI: ``python -m gluefactory_tpu.eval.megadepth1500 --conf <name> [k=v ...]``"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import jax
import numpy as np
from tqdm import tqdm

from ..core.config import Config
from ..datasets import get_dataset
from ..models.cache_loader import CacheLoader
from ..settings import EVAL_PATH
from ..train import filter_batch
from ..utils.export_predictions import export_predictions
from ..utils.tensor import map_tensor
from .eval_pipeline import EvalPipeline
from .io import get_eval_parser, load_model, parse_eval_args
from .utils import eval_matches_epipolar, eval_poses, eval_relative_pose_robust


class MegaDepth1500Pipeline(EvalPipeline):
    default_conf = {
        "data": {
            "name": "image_pairs",
            "pairs": "megadepth1500/pairs_calibrated.txt",
            "root": "megadepth1500/images",
            "preprocessing": {"resize": 1600, "side": "long", "square_pad": True},
            "test_batch_size": 1,
            "num_workers": 2,
        },
        "model": {"name": None},
        "eval": {
            "estimator": "ransac",
            "ransac_th": -1.0,
            "num_hypotheses": 2048,
            "lo_iters": 6,
        },
        "checkpoint": None,
    }
    export_keys = [
        "keypoints0", "keypoints1", "keypoint_scores0", "keypoint_scores1",
        "keypoint_valid0", "keypoint_valid1",
        "matches0", "matches1", "matching_scores0", "matching_scores1",
    ]

    def _init(self, conf):
        self.dataset = get_dataset(conf.data.name)(conf.data)

    def get_dataloader(self, data_conf=None):
        dataset = self.dataset if data_conf is None else get_dataset(data_conf.name)(data_conf)
        return dataset.get_data_loader("test")

    def get_predictions(self, experiment_dir: Path, model=None, params=None) -> Path:
        pred_file = Path(experiment_dir) / "predictions.h5"
        if model is None:
            model, params = load_model(Config(self.conf.model), self.conf.get("checkpoint"))
        loader = self.get_dataloader()
        jit_apply = jax.jit(lambda p, d: model.apply(p, d))
        state = {"params": None, "flat_ckpt": params}

        def apply_fn(batch):
            data = filter_batch(batch)
            data = map_tensor(data, jax.numpy.asarray)
            if state["params"] is None:
                from .io import restore_params

                state["params"] = restore_params(
                    model.init(jax.random.key(0), data), state["flat_ckpt"]
                )
            return jit_apply(state["params"], data)

        export_predictions(
            tqdm(loader, desc="megadepth1500 export"), apply_fn, pred_file,
            keys=self.export_keys,
            # subclasses (extended benchmarks) add line exports here; absent
            # keys are skipped, so the base benchmark is unaffected
            optional_keys=("keypoint_valid0", "keypoint_valid1",
                           *self.optional_export_keys),
        )
        return pred_file

    def run_eval(self, loader, pred_file: Path):
        """(reference eval/megadepth1500.py:93-150)"""
        conf = self.conf.eval
        results = defaultdict(list)
        cache_loader = CacheLoader({"path": str(pred_file), "collate": False})
        test_thresholds = (
            [0.5, 1.0, 1.5, 2.0, 2.5, 3.0]
            if conf.ransac_th == -1.0
            else [conf.ransac_th]
        )
        pose_results = defaultdict(list)
        for batch in tqdm(loader, desc="megadepth1500 eval"):
            data = map_tensor(
                batch, lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x
            )
            name = batch["name"][0]
            pred = cache_loader(
                {"name": [name], **{k: v for k, v in batch.items() if k.startswith("view")}}
            )
            pred_b = {k: np.asarray(v) for k, v in pred.items()}
            results_i = eval_matches_epipolar(data, pred_b)
            for th in test_thresholds:
                est_conf = Config(conf.to_dict()).merge({"ransac_th": th})
                pose_results[th].append(eval_relative_pose_robust(data, pred_b, est_conf))
            results["names"].append(name)
            for k, v in results_i.items():
                results[k].append(v)
        summaries = {}
        for k, v in results.items():
            if k == "names":
                continue
            arr = np.array(v, dtype=np.float64)
            if np.issubdtype(arr.dtype, np.number):
                summaries[f"m{k}"] = round(float(np.nanmean(arr)), 3)
        summaries.update(
            eval_poses(pose_results, auc_ths=[5, 10, 20], key="rel_pose_error", unit="°")
        )
        best_th = summaries["best_ransac_th"]
        results["rel_pose_error"] = [
            r["rel_pose_error"] for r in pose_results[best_th]
        ]
        return summaries, {}, dict(results)


def main():
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    conf = parse_eval_args("megadepth1500", args, MegaDepth1500Pipeline.default_conf)
    pipeline = MegaDepth1500Pipeline(conf)
    exp_dir = EVAL_PATH / "megadepth1500" / args.tag
    s, _ = pipeline.run(
        exp_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    import pprint

    pprint.pprint(s)


if __name__ == "__main__":
    main()
