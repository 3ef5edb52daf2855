"""Two-phase benchmark pipeline (reference: gluefactory/eval/eval_pipeline.py:50-109).

Phase 1 (``get_predictions``): run the model over the benchmark loader once
and cache predictions to HDF5 — the only device-heavy phase; batches shard
over the data mesh like training.
Phase 2 (``run_eval``): score the cache on host (RANSAC still runs on device
through the batched estimators). Cache-first evaluation keeps benchmark
results exactly reproducible and lets estimator/threshold sweeps reuse one
export (reference docs/evaluation.md)."""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np

from .. import logger
from ..core.config import Config


def load_eval(dir_: Path):
    """(reference eval_pipeline.py:23-33)"""
    summaries = json.loads((Path(dir_) / "summaries.json").read_text())
    results = {}
    with h5py.File(str(Path(dir_) / "results.h5"), "r") as hfile:
        for k in hfile.keys():
            r = np.array(hfile[k])
            if len(r.shape) < 3:
                results[k] = r
    return summaries, results


def save_eval(dir_: Path, summaries: dict, figures: dict, results: dict):
    """(reference eval_pipeline.py:35-48)"""
    dir_ = Path(dir_)
    dir_.mkdir(parents=True, exist_ok=True)
    with h5py.File(str(dir_ / "results.h5"), "w") as hfile:
        for k, v in results.items():
            arr = np.array(v)
            if arr.dtype.kind in ("U", "S", "O"):  # names etc. as vlen strings
                hfile.create_dataset(
                    k, data=[str(x) for x in v], dtype=h5py.string_dtype()
                )
            else:
                hfile.create_dataset(k, data=arr)
    s = {
        k: (float(v) if np.isscalar(v) and np.isfinite(np.float64(v)) else str(v))
        for k, v in summaries.items()
    }
    (dir_ / "summaries.json").write_text(json.dumps(s, indent=4))
    for fig_name, fig in (figures or {}).items():
        fig.savefig(dir_ / f"{fig_name}.png")


def exists_eval(dir_: Path) -> bool:
    dir_ = Path(dir_)
    return (dir_ / "results.h5").exists() and (dir_ / "summaries.json").exists()


class EvalPipeline:
    default_conf: dict = {}
    export_keys: list = []
    optional_export_keys: list = []

    def __init__(self, conf):
        """(reference eval_pipeline.py:50-60)"""
        merged: dict = {}
        for klass in reversed(type(self).__mro__):
            dc = klass.__dict__.get("default_conf")
            if dc:
                merged = Config(merged).merge(dc).to_dict()
        self.conf = Config(merged).merge(conf or {})
        self.conf.freeze()
        self._init(self.conf)

    def _init(self, conf):
        pass

    def get_dataloader(self, data_conf=None):
        raise NotImplementedError

    def get_predictions(self, experiment_dir: Path, model=None, params=None) -> Path:
        raise NotImplementedError

    def run_eval(self, loader, pred_file: Path) -> tuple[dict, dict, dict]:
        raise NotImplementedError

    def save_conf(self, experiment_dir: Path, overwrite=False, overwrite_eval=False):
        """Conf drift check (reference eval_pipeline.py:94-109)."""
        conf_output_path = Path(experiment_dir) / "conf.yaml"
        if conf_output_path.exists():
            saved = Config.load(conf_output_path)
            if Config(saved.get("model", {})) != Config(self.conf.get("model", {})) and not overwrite:
                raise RuntimeError(
                    "Config model drift vs cached predictions; pass overwrite=True"
                )
            if saved != self.conf and not (overwrite or overwrite_eval):
                raise RuntimeError("Config eval drift; pass overwrite_eval=True")
        Path(experiment_dir).mkdir(parents=True, exist_ok=True)
        self.conf.save(conf_output_path)

    def run(self, experiment_dir: Path, model=None, params=None,
            overwrite=False, overwrite_eval=False):
        """(reference eval_pipeline.py:78-92)"""
        experiment_dir = Path(experiment_dir)
        experiment_dir.mkdir(parents=True, exist_ok=True)
        self.save_conf(experiment_dir, overwrite=overwrite, overwrite_eval=overwrite_eval)
        pred_file = experiment_dir / "predictions.h5"
        if not pred_file.exists() or overwrite:
            pred_file = self.get_predictions(experiment_dir, model=model, params=params)
        if not exists_eval(experiment_dir) or overwrite or overwrite_eval:
            summaries, figures, results = self.run_eval(self.get_dataloader(), pred_file)
            save_eval(experiment_dir, summaries, figures, results)
        summaries, results = load_eval(experiment_dir)
        logger.info("Eval summaries: %s", summaries)
        return summaries, results
