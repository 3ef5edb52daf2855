"""Cache local features for stage-2 matcher training
(reference: gluefactory/scripts/export_megadepth.py and
export_local_features.py).

Runs an extractor over any dataset's single views and writes one HDF5 group
per image with keypoints (original-resolution coords), scores, descriptors,
and optionally the depth sampled at the keypoints (``get_kp_depth``,
reference export_megadepth.py:100-103) — the cache consumed by
models/cache_loader.py + TwoViewPipeline(allow_no_extract=True).

CLI: ``python -m gluefactory_tpu.scripts.export_features --dataset image_folder
--method extractors.superpoint --output exports/sp.h5 [data.k=v model.k=v]``"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from .. import logger
from ..core.config import Config
from ..datasets import get_dataset
from ..models import build_model
from ..settings import DATA_PATH
from ..train import filter_batch
from ..utils.export_predictions import export_predictions
from ..utils.tensor import map_tensor


def get_kp_depth(pred: dict, batch: dict) -> dict:
    """Sample depth at the exported keypoints (reference export_megadepth.py:100-103)."""
    import jax.numpy as jnp

    from ..geometry.depth import sample_depth

    depth = batch.get("depth")
    if depth is None:
        return {}
    d, valid = sample_depth(jnp.asarray(pred["keypoints"]), jnp.asarray(depth))
    return {"depth_keypoints": np.asarray(d), "valid_depth_keypoints": np.asarray(valid)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--method", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--with_depth", action="store_true")
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_intermixed_args()
    cli = Config.from_cli(args.dotlist)
    dataset = get_dataset(args.dataset)(cli.get("data", {}))
    model = build_model(args.method, cli.get("model", {}))
    loader = dataset.get_data_loader(args.split, shuffle=False)
    jit_apply = jax.jit(lambda p, d: model.apply(p, d))
    state = {"params": None}

    def apply_fn(batch):
        data = filter_batch(batch)
        data = map_tensor(data, jax.numpy.asarray)
        if state["params"] is None:
            state["params"] = model.init(jax.random.key(0), data)
        return jit_apply(state["params"], data)

    out = Path(args.output)
    if not out.is_absolute():
        out = DATA_PATH / "exports" / out
    export_predictions(
        loader, apply_fn, out,
        keys=["keypoints", "keypoint_scores", "descriptors", "keypoint_valid",
              "scales", "oris"],
        callback_fn=get_kp_depth if args.with_depth else None,
    )
    logger.info("Exported features to %s", out)


if __name__ == "__main__":
    main()
