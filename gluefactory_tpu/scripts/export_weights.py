"""Export a training experiment's model params as a compact committed-weight
blob: params-only, float16, msgpack — small enough to live in the repo
(weights/) so numeric integration tests and demos run without retraining.

Usage: python -m gluefactory_tpu.scripts.export_weights <experiment>
          [--out weights/<experiment>.f16.msgpack] [--best]
          [--graft blob.msgpack:OLD_PREFIX:NEW_PREFIX ...]

``--graft`` merges another blob's params in under remapped key prefixes —
the mechanism behind composed pipelines (e.g. a matcher-only training
experiment + a separately-trained extractor): the matcher keys come from the
experiment, the extractor keys are grafted from its blob with the flat-key
prefix rewritten to the eval pipeline's module path, e.g.
``--graft weights/sp_tpu_stage0b.f16.msgpack:"['params']['extractor']":"['params']['extractor']['point_extractor']"``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from .. import logger
from ..settings import ROOT_PATH
from ..utils.experiments import load_experiment


def export(experiment: str, out: Path | None = None, best: bool = True,
           graft: list[str] | None = None) -> Path:
    blob, conf = load_experiment(experiment, best=best)
    flat = dict(blob["state"]["params"])
    for spec in graft or []:
        gpath, old, new = spec.rsplit(":", 2)
        gflat, _, _ = load_weight_blob(Path(gpath))
        n = 0
        for k, v in gflat.items():
            if k.startswith(old):
                flat[new + k[len(old):]] = v
                n += 1
        if n == 0:
            raise ValueError(f"graft {gpath}: no keys start with {old!r}")
        logger.info("Grafted %d params from %s (%s -> %s)", n, gpath, old, new)
    half = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        half[k] = arr.astype(np.float16) if arr.dtype == np.float32 else arr
    if out is None:
        out = ROOT_PATH / "weights" / f"{experiment}.f16.msgpack"
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    import flax.serialization

    payload = {
        "params": half,
        "model_conf": conf.get("model", {}).to_dict() if conf.get("model") else {},
        "experiment": experiment,
        "epoch": int(blob.get("epoch", -1)),
        "iteration": int(blob.get("iteration", -1)),
    }
    out.write_bytes(flax.serialization.msgpack_serialize(payload))
    logger.info("Wrote %s (%.2f MB)", out, out.stat().st_size / 1e6)
    return out


def load_weight_blob(path: Path):
    """Returns (flat params dict (float32), model_conf dict, meta)."""
    import flax.serialization

    payload = flax.serialization.msgpack_restore(Path(path).read_bytes())
    flat = {
        k: (np.asarray(v).astype(np.float32)
            if np.asarray(v).dtype == np.float16 else np.asarray(v))
        for k, v in payload["params"].items()
    }
    meta = {k: payload[k] for k in ("experiment", "epoch", "iteration")}
    return flat, payload.get("model_conf", {}), meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment")
    ap.add_argument("--out", default=None)
    ap.add_argument("--last", action="store_true", help="last instead of best")
    ap.add_argument("--graft", action="append", default=None,
                    help="blob.msgpack:OLD_PREFIX:NEW_PREFIX (repeatable)")
    args = ap.parse_args()
    export(args.experiment, Path(args.out) if args.out else None,
           best=not args.last, graft=args.graft)


if __name__ == "__main__":
    main()
