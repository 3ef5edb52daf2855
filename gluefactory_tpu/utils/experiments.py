"""Checkpoint management (reference: gluefactory/utils/experiments.py:37-134).

Checkpoints are flax-serialized msgpack files
``checkpoint_<epoch>_<iter>[_interrupted].ckpt`` holding
{params, opt_state, conf, epoch, iteration, losses, eval}; best is tracked by
``train.best_key`` and copied to ``checkpoint_best.ckpt``; keep-last-K GC."""

from __future__ import annotations

import re
import shutil
from pathlib import Path

import flax.serialization
import jax
import numpy as np
import yaml

from .. import logger
from ..core.config import Config
from ..settings import TRAINING_PATH


def state_to_flat_dict(state) -> dict:
    """Flatten ANY pytree (incl. optax namedtuple states flax can't handle)
    into {path_string: numpy array} for msgpack serialization."""
    leaves = jax.tree_util.tree_leaves_with_path(state)
    return {jax.tree_util.keystr(path): np.asarray(x) for path, x in leaves}


def restore_from_flat_dict(target, flat: dict):
    """Inverse of state_to_flat_dict given a template pytree with the same
    structure (e.g. freshly-initialized params / optimizer state).

    If NO checkpoint key matches the template, the checkpoint was written at
    a different pipeline nesting level (a standalone extractor loaded into a
    ``two_view_pipeline``, or vice versa) — adapt by inserting/stripping the
    ``['extractor']`` scope rather than silently keeping every initialized
    value (fine-tune stages like configs/jpldd_desc_stage.yaml depend on
    this)."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    target_keys = {jax.tree_util.keystr(p) for p, _ in paths_and_leaves}
    if flat and not (target_keys & set(flat)):
        candidates = [
            {k.replace("['params']", f"['params']['{scope}']", 1): v
             for k, v in flat.items()}
            for scope in ("extractor", "matcher")
        ] + [
            {k.replace(f"['params']['{scope}']", "['params']", 1): v
             for k, v in flat.items()}
            for scope in ("extractor", "matcher")
        ]
        best = max(candidates, key=lambda c: len(target_keys & set(c)))
        if target_keys & set(best):
            logger.info(
                "Adapted checkpoint nesting level: %d/%d keys now match",
                len(target_keys & set(best)), len(best),
            )
            flat = best
    new_leaves = []
    for path, leaf in paths_and_leaves:
        key = jax.tree_util.keystr(path)
        if key in flat:
            # stay on host (numpy): per-leaf device_put is pathologically slow
            # through remote TPU tunnels; callers device_put the whole tree
            arr = np.asarray(flat[key])
            if hasattr(leaf, "dtype"):
                arr = arr.astype(leaf.dtype)
            new_leaves.append(arr)
        else:
            logger.warning("Checkpoint missing %s; keeping initialized value", key)
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def list_checkpoints(dir_: Path) -> list[Path]:
    """(reference experiments.py:24-35)"""
    checkpoints = []
    for p in dir_.glob("checkpoint_*.ckpt"):
        numbers = re.findall(r"(\d+)", p.name)
        if not numbers:
            continue
        checkpoints.append((int(numbers[0]), int(numbers[1]) if len(numbers) > 1 else 0, p))
    return [p for _, _, p in sorted(checkpoints)]


def get_last_checkpoint(exp: str, allow_interrupted: bool = True) -> Path:
    """(reference experiments.py:37-44)"""
    ckpts = list_checkpoints(TRAINING_PATH / exp)
    if not allow_interrupted:
        ckpts = [p for p in ckpts if "_interrupted" not in p.name]
    if not ckpts:
        raise FileNotFoundError(f"No checkpoints in {TRAINING_PATH / exp}")
    return ckpts[-1]


def get_best_checkpoint(exp: str) -> Path:
    """(reference experiments.py:46-50)"""
    return TRAINING_PATH / exp / "checkpoint_best.ckpt"


def delete_old_checkpoints(dir_: Path, num_keep: int):
    """(reference experiments.py:52-62)"""
    ckpts = list_checkpoints(dir_)
    ckpts = [p for p in ckpts if "_interrupted" not in p.name and "best" not in p.name]
    for p in ckpts[: max(0, len(ckpts) - num_keep)]:
        logger.info("Deleting checkpoint %s", p.name)
        p.unlink()


def save_experiment(
    output_dir: Path,
    state: dict,
    conf: Config,
    epoch: int,
    iteration: int,
    losses: dict | None = None,
    eval_results: dict | None = None,
    best_eval: float | None = None,
    cp_name: str | None = None,
    keep_last: int = 5,
) -> float | None:
    """(reference experiments.py:95-134)

    Multi-host: only process 0 touches the filesystem (the reference saves
    on rank 0, train.py:559); every process still computes the updated
    ``best_eval`` so cross-host control flow stays in lockstep."""
    import jax

    best_key = conf.get("train.best_key", "loss/total") or "loss/total"
    # 'max' flips the comparison for higher-is-better selection keys (e.g.
    # an in-train benchmark mAA: train.best_key=bench/hpatches/..._mAA,
    # train.best_mode=max — the round-3 verdict ask #4: engine-val metrics
    # were anti-correlated with eval quality two retrains in a row)
    mode = conf.get("train.best_mode", "min") or "min"
    cur = (eval_results or {}).get(best_key)

    def improved(c, b):
        return c is not None and (
            b is None or (c > b if mode == "max" else c < b))

    if jax.process_count() > 1 and jax.process_index() != 0:
        if improved(cur, best_eval):
            best_eval = float(cur)
        return best_eval
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    if cp_name is None:
        cp_name = f"checkpoint_{epoch}_{iteration}.ckpt"
    # path-flattened arrays: serializes any pytree incl. optax states
    state = {k: state_to_flat_dict(v) for k, v in state.items()}
    blob = {
        "state": state,
        "epoch": epoch,
        "iteration": iteration,
        "losses": losses or {},
        "eval": eval_results or {},
    }
    path = output_dir / cp_name
    path.write_bytes(flax.serialization.msgpack_serialize(blob))
    (output_dir / "config.yaml").write_text(yaml.safe_dump(conf.to_dict(), sort_keys=False))
    if improved(cur, best_eval):
        best_eval = float(cur)
        shutil.copy(path, output_dir / "checkpoint_best.ckpt")
        logger.info("New best checkpoint: %s=%.5f", best_key, best_eval)
    delete_old_checkpoints(output_dir, keep_last)
    return best_eval


def load_experiment(exp_or_path: str | Path, best: bool = False) -> tuple[dict, Config]:
    """Load a checkpoint by experiment name, direct .ckpt path, or a
    committed weight blob (weights/*.f16.msgpack, see scripts/export_weights)
    (reference experiments.py:65-93). Returns (blob, conf)."""
    path = Path(exp_or_path)
    if path.suffix == ".msgpack":
        from ..scripts.export_weights import load_weight_blob

        flat, model_conf, meta = load_weight_blob(path)
        blob = {"state": {"params": flat}, **meta}
        return blob, Config({"model": model_conf}) if model_conf else Config()
    if path.suffix != ".ckpt":
        path = get_best_checkpoint(str(exp_or_path)) if best else get_last_checkpoint(str(exp_or_path))
    blob = flax.serialization.msgpack_restore(path.read_bytes())
    conf_path = path.parent / "config.yaml"
    conf = Config.load(conf_path) if conf_path.exists() else Config()
    return blob, conf
