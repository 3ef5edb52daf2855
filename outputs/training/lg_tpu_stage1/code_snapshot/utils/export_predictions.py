"""Run a model over a loader and cache predictions to HDF5
(reference: gluefactory/utils/export_predictions.py:18-81).

Keypoints/lines are rescaled by 1/scales back to original image resolution
before caching, so downstream scoring is resolution-independent. One HDF5
group per sample ``name``; padded slots are dropped using the validity masks
so caches stay compact."""

from __future__ import annotations

from pathlib import Path

import h5py
import jax
import numpy as np

from .. import logger
from ..utils.tensor import batch_to_numpy


def export_predictions(
    loader,
    apply_fn,
    output_file: Path,
    as_half: bool = True,
    keys: list | str = "*",
    callback_fn=None,
    optional_keys: tuple = ("keypoint_valid0", "keypoint_valid1"),
):
    """apply_fn(batch) -> pred dict of batched arrays."""
    output_file = Path(output_file)
    output_file.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(str(output_file), "w") as hfile:
        for batch in loader:
            pred = apply_fn(batch)
            pred = batch_to_numpy(pred)
            if callback_fn is not None:
                pred = {**pred, **callback_fn(pred, batch)}
            if keys != "*":
                pred = {k: v for k, v in pred.items() if k in set(keys) | set(optional_keys)}
            names = batch.get("name")
            bsize = len(names) if isinstance(names, list) else next(
                v.shape[0] for v in pred.values() if hasattr(v, "shape")
            )
            for i in range(bsize):
                name = names[i] if names is not None else str(len(hfile))
                pred_i = {k: v[i] for k, v in pred.items() if hasattr(v, "shape")}
                # rescale to original resolution
                for vid in ("0", "1"):
                    scales = batch.get(f"view{vid}", {}).get("scales")
                    if scales is None:
                        continue
                    s = np.asarray(scales[i])
                    for key in (f"keypoints{vid}", f"lines{vid}"):
                        if key in pred_i:
                            pred_i[key] = pred_i[key] / s
                grp = hfile.create_group(str(name))
                for k, v in pred_i.items():
                    arr = np.asarray(v)
                    if as_half and arr.dtype == np.float32:
                        arr = arr.astype(np.float16)
                    grp.create_dataset(k, data=arr)
    logger.info("Cached predictions to %s", output_file)
    return output_file
