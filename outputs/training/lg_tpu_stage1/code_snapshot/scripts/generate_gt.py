"""Pseudo-GT generation via homography adaptation
(reference: gluefactory/ground_truth_generation/*.py — SuperPoint keypoint GT
from 100-homography adaptation and DeepLSD-style DF/AF fields, written as
multi-file HDF5 caches).

Aggregates a detector's dense heatmap (mean) and a DF/AF model's fields
(min/mean) over K random warps, on device as one (B*K) batch, and writes one
HDF5 group per image.

CLI: ``python -m gluefactory_tpu.scripts.generate_gt --dataset image_folder
--model extractors.superpoint --fields heatmap --num_H 32 --output gt.h5``"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..core.config import Config
from ..datasets import get_dataset
from ..geometry.homography_adaptation import (
    homography_adaptation,
    sample_homographies_np,
)
from ..models import build_model
from ..settings import DATA_PATH
from ..train import filter_batch
from ..utils.tensor import map_tensor


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--fields", nargs="+", default=["heatmap"])
    parser.add_argument("--aggregation", type=str, default="mean")
    parser.add_argument("--num_H", type=int, default=32)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_intermixed_args()
    cli = Config.from_cli(args.dotlist)
    dataset = get_dataset(args.dataset)(cli.get("data", {}))
    model_conf = Config({"dense_outputs": True}).merge(cli.get("model", {}))
    model = build_model(args.model, model_conf)
    loader = dataset.get_data_loader(args.split, shuffle=False)
    rng = np.random.default_rng(0)
    state = {"params": None, "jit": None}
    out_path = Path(args.output)
    if not out_path.is_absolute():
        out_path = DATA_PATH / "exports" / out_path
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(str(out_path), "w") as hfile:
        for batch in loader:
            data = map_tensor(filter_batch(batch), jnp.asarray)
            image = data["image"] if "image" in data else data["view0"]["image"]
            if state["params"] is None:
                state["params"] = model.init(jax.random.key(0), {"image": image})

                def fwd(images):
                    return model.apply(state["params"], {"image": images})

                def run(image, Hs):
                    return homography_adaptation(
                        image, Hs, fwd, field_keys=tuple(args.fields),
                        aggregation=args.aggregation,
                    )

                state["jit"] = jax.jit(run)
            h, w = image.shape[1:3]
            Hs = jnp.asarray(sample_homographies_np(args.num_H, (w, h), rng))
            agg = state["jit"](image, Hs)
            names = batch.get("name")
            for i in range(image.shape[0]):
                grp = hfile.create_group(str(names[i]) if names else str(len(hfile)))
                for k in args.fields:
                    grp.create_dataset(k, data=np.asarray(agg[k][i], np.float16))
    logger.info("Wrote pseudo-GT to %s", out_path)


if __name__ == "__main__":
    main()
