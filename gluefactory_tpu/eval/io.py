"""Eval config resolution + model loading (reference: gluefactory/eval/io.py)."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from ..core.config import Config
from ..models import build_model
from ..utils.experiments import load_experiment

CONFIGS_DIR = Path(__file__).parent.parent / "configs"


def parse_config_path(name_or_path: str) -> Path:
    """Named config from package resources or direct path
    (reference eval/io.py:14-32)."""
    p = Path(name_or_path)
    if p.exists():
        return p
    cand = CONFIGS_DIR / f"{name_or_path}.yaml"
    if cand.exists():
        return cand
    raise FileNotFoundError(
        f"Config {name_or_path} not found; available: "
        f"{[c.stem for c in CONFIGS_DIR.glob('*.yaml')]}"
    )


def parse_eval_args(benchmark: str, args, default_conf: Config) -> Config:
    """CLI conf > named conf > defaults (reference eval/io.py:47-84)."""
    conf = Config(default_conf)
    if getattr(args, "conf", None):
        named = Config.load(parse_config_path(args.conf))
        # a config may carry benchmark-specific sections
        bench_sub = named.get(benchmark)
        if bench_sub is not None:
            named = named.merge(bench_sub)
        conf = conf.merge(named)
    if getattr(args, "dotlist", None):
        conf = conf.merge(Config.from_cli(args.dotlist))
    if getattr(args, "checkpoint", None):
        conf = conf.merge({"checkpoint": args.checkpoint})
    return conf


def load_model(model_conf: Config, checkpoint: str | None, init_seed: int = 0):
    """Build the model; returns (model, flat_params_or_None). Flat params are
    a {path: array} dict (utils/experiments.state_to_flat_dict) to be
    restored into a freshly-initialized template with ``restore_params``
    (reference eval/io.py:87-97)."""
    if checkpoint:
        blob, ckpt_conf = load_experiment(checkpoint, best=True)
        model_conf = Config(ckpt_conf.get("model", {})).merge(model_conf or {})
        model = build_model(model_conf.name, model_conf)
        return model, blob["state"]["params"]
    model = build_model(model_conf.name, model_conf)
    return model, None


def restore_params(template_params, flat_params):
    """Restore flat checkpoint params into an initialized template. A live
    param TREE (e.g. passed by the in-training benchmark hook) is used
    as-is."""
    from ..utils.experiments import restore_from_flat_dict

    if flat_params is None:
        return template_params
    if isinstance(flat_params, dict) and any(
        isinstance(k, str) and "[" in k for k in flat_params
    ):
        return restore_from_flat_dict(template_params, flat_params)
    return flat_params


def get_eval_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tag", type=str, default="default")
    parser.add_argument("--conf", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--overwrite_eval", action="store_true")
    parser.add_argument("dotlist", nargs="*")
    return parser
