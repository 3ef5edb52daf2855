"""ETH3D point/line matching AP benchmark
(reference: gluefactory/eval/eth3d.py:18-202).

Scores cached matches against epipolar ground truth: a match is correct if
its symmetric epipolar distance is below ``correct_th``; AP aggregates
precision over the score ranking (reference eval_dataset:18-45). Line
matches are scored by endpoint epipolar consistency."""

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
from .utils import get_matches_scores


def average_precision(correct: np.ndarray, scores: np.ndarray) -> float:
    order = np.argsort(-scores)
    correct = correct[order]
    if correct.sum() == 0:
        return 0.0
    tp = np.cumsum(correct)
    precision = tp / (np.arange(len(correct)) + 1)
    return float(np.sum(precision * correct) / correct.sum())


class ETH3DPipeline(EvalPipeline):
    default_conf = {
        "data": {"name": "eth3d"},
        "model": {"name": None},
        "eval": {"correct_th": 1e-3},
        "checkpoint": None,
    }
    export_keys = [
        "keypoints0", "keypoints1", "matches0", "matches1",
        "matching_scores0", "matching_scores1",
        "lines0", "lines1", "line_matches0", "line_matches1",
        "line_matching_scores0", "line_matching_scores1",
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
            tqdm(loader, desc="eth3d export"), apply_fn, pred_file, keys=self.export_keys
        )
        return pred_file

    def run_eval(self, loader, pred_file: Path):
        from ..geometry.epipolar import generalized_epi_dist
        import jax.numpy as jnp

        conf = self.conf.eval
        cache_loader = CacheLoader({"path": str(pred_file), "collate": False})
        results = defaultdict(list)
        all_correct, all_scores = [], []
        line_correct, line_scores_acc = [], []
        for batch in tqdm(loader, desc="eth3d eval"):
            data = map_tensor(batch, lambda x: x[0] if hasattr(x, "shape") and x.ndim > 0 else x)
            name = batch["name"][0]
            pred = cache_loader(
                {"name": [name], **{k: v for k, v in batch.items() if k.startswith("view")}}
            )
            pred = {k: np.asarray(v) for k, v in pred.items()}
            pts0, pts1, scores, valid = get_matches_scores(
                pred["keypoints0"], pred["keypoints1"], pred["matches0"],
                pred["matching_scores0"],
            )
            d = np.asarray(
                generalized_epi_dist(
                    jnp.asarray(pts0)[None], jnp.asarray(pts1)[None],
                    data["camera0"] if "camera0" in data else data["view0"]["camera"],
                    data["camera1"] if "camera1" in data else data["view1"]["camera"],
                    data["T_0to1"], all_pairs=False, essential=True,
                )
            )[0]
            correct = (d < conf.correct_th) & valid
            all_correct.append(correct[valid])
            all_scores.append(scores[valid])
            results["names"].append(name)
            results["num_matches"].append(int(valid.sum()))
            if "line_matches0" in pred and "lines0" in pred:
                l0 = pred["lines0"]
                l1 = pred["lines1"]
                lm0 = pred["line_matches0"]
                lvalid = lm0 > -1
                if lvalid.any():
                    e0 = l0[lvalid].reshape(-1, 2)
                    e1 = l1[np.clip(lm0[lvalid], 0, None)].reshape(-1, 2)
                    dl = np.asarray(
                        generalized_epi_dist(
                            jnp.asarray(e0)[None], jnp.asarray(e1)[None],
                            data["view0"]["camera"], data["view1"]["camera"],
                            data["T_0to1"], all_pairs=False, essential=True,
                        )
                    )[0].reshape(-1, 2).mean(-1)
                    line_correct.append(dl < conf.correct_th * 3)
                    line_scores_acc.append(pred["line_matching_scores0"][lvalid])
        summaries = {
            "AP": round(
                average_precision(np.concatenate(all_correct), np.concatenate(all_scores)) * 100,
                2,
            )
            if all_correct else 0.0,
            "mnum_matches": float(np.mean(results["num_matches"])),
        }
        if line_correct:
            summaries["AP_lines"] = round(
                average_precision(
                    np.concatenate(line_correct), np.concatenate(line_scores_acc)
                ) * 100, 2,
            )
        return summaries, {}, dict(results)


def main():
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    conf = parse_eval_args("eth3d", args, ETH3DPipeline.default_conf)
    pipeline = ETH3DPipeline(conf)
    s, _ = pipeline.run(
        EVAL_PATH / "eth3d" / args.tag,
        overwrite=args.overwrite, overwrite_eval=args.overwrite_eval,
    )
    import pprint

    pprint.pprint(s)


if __name__ == "__main__":
    main()
