"""Hyperparameter sweep for the POLD2 line-extraction readout.

TPU-native analog of the reference's weak-filter tuning harness
(/root/reference/jpl_scripts/tune_weakfilter.py — sweeps POLD2's MLP
weak-filter thresholds against a line benchmark): extract keypoints +
distance/angle fields ONCE per image with a trained JPLDD checkpoint, then
sweep the (cheap, field-reading) POLD2Extractor configuration grid over the
cached fields, scoring each variant by warped line repeatability /
localization / count on rendered HPatches pairs. The expensive trunk runs
once; each grid point costs only the extraction readout — the same
cache-then-sweep structure as the reference harness.

Usage:
  GFTPU_PLATFORM=cpu python -m gluefactory_tpu.scripts.tune_line_extractor \
      --checkpoint weights/jpldd_tpu_structured.f16.msgpack \
      [--pairs 10] [--out outputs/results/line_tuning.json] [dotlist...]

The dotlist overrides the BASE extractor conf; the sweep grid is fixed in
GRID below (edit freely — each entry is a conf patch).
"""

from __future__ import annotations

import argparse
import itertools
import json
from pathlib import Path

import jax
import numpy as np

from .. import logger
from ..core.config import Config
from ..datasets import get_dataset
from ..eval.io import load_model, restore_params
from ..eval.metrics import line_repeatability
from ..models import build_model

# sweep axes (cartesian product); None = keep base value
GRID = {
    "selection_score": ["length", "inlier"],
    "collinear_nms": [True, False],
    "fine_inlier_ratio": [0.9, 0.95],
    "mean_df_th": [1.0, 1.5],
    "min_length": [8.0, 16.0],
}


def cache_fields(checkpoint: str, model_conf: dict, n_pairs: int):
    conf = Config({
        "name": "extractors.joint_point_line_extractor",
        "max_num_keypoints": 512, "extract_lines": False,
        "detection_threshold": 0.005, **model_conf})
    model, ckpt = load_model(conf, checkpoint)
    ds = get_dataset("hpatches")(Config({
        "test_batch_size": 1, "num_workers": 0,
        "preprocessing": {"resize": 480, "side": "long", "square_pad": True}}))
    loader = ds.get_data_loader("test")
    apply_fn = jax.jit(lambda p, d: model.apply(p, d))
    params, out = None, []
    for i, batch in enumerate(loader):
        if i % 5 != 2:  # one mid-difficulty pair (1-4) per sequence
            continue
        if len(out) >= n_pairs:
            break
        pred = {}
        for v in ("view0", "view1"):
            data = {"image": np.asarray(batch[v]["image"])}
            if params is None:
                params = restore_params(
                    model.init(jax.random.key(0), data), ckpt)
            p = apply_fn(params, data)
            sfx = "0" if v == "view0" else "1"
            for k in ("keypoints", "keypoint_valid", "distance_field",
                      "angle_field"):
                pred[k + sfx] = np.asarray(p[k])
        out.append((pred, np.asarray(batch["H_0to1"]),
                    np.asarray(batch["view1"]["image_size"])))
    return out


def score_variant(feats, over: dict, rep_th: float = 5.0) -> dict:
    ex = build_model("lines.pold2_extractor", over)
    ex_p = ex.init(jax.random.key(0), {
        "keypoints": np.zeros((1, 512, 2), np.float32),
        "keypoint_valid": np.ones((1, 512), bool),
        "distance_field": np.zeros((1, 480, 480), np.float32),
        "angle_field": np.zeros((1, 480, 480), np.float32)})
    exj = jax.jit(lambda pp, d: ex.apply(pp, d))
    reps, locs, counts = [], [], []
    for pred, H, size1 in feats:
        lp = {}
        for s in ("0", "1"):
            r = exj(ex_p, {
                "keypoints": pred["keypoints" + s],
                "keypoint_valid": pred["keypoint_valid" + s],
                "distance_field": pred["distance_field" + s],
                "angle_field": pred["angle_field" + s]})
            lp["lines" + s] = r["lines"]
            lp["valid_lines" + s] = r["valid_lines"]
        rep, loc = line_repeatability(
            lp["lines0"], lp["lines1"], lp["valid_lines0"],
            lp["valid_lines1"], H, size1, th=rep_th)
        reps.append(float(rep[0]))
        locs.append(float(loc[0]))
        counts.append(int(np.asarray(lp["valid_lines0"]).sum()))
    return {"rep": round(float(np.mean(reps)), 4),
            "loc": round(float(np.nanmean(locs)), 3),
            "num_lines": round(float(np.mean(counts)), 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--pairs", type=int, default=10)
    ap.add_argument("--out", type=Path,
                    default=Path("outputs/results/line_tuning.json"))
    ap.add_argument("dotlist", nargs="*")
    args = ap.parse_args()
    base = Config({}).merge_dotlist(args.dotlist).to_dict() \
        if args.dotlist else {}
    feats = cache_fields(args.checkpoint, base.pop("model", {}), args.pairs)
    logger.info("cached fields for %d pairs; sweeping %d variants",
                len(feats), int(np.prod([len(v) for v in GRID.values()])))
    rows = []
    keys = list(GRID)
    for combo in itertools.product(*(GRID[k] for k in keys)):
        over = {**base, **dict(zip(keys, combo))}
        rows.append({"conf": dict(zip(keys, combo)),
                     **score_variant(feats, over)})
        logger.info("%s -> %s", rows[-1]["conf"],
                    {k: rows[-1][k] for k in ("rep", "loc", "num_lines")})
    # rank: repeatability first, then localization
    rows.sort(key=lambda r: (-r["rep"], r["loc"]))
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(
        {"checkpoint": args.checkpoint, "n_pairs": len(feats),
         "best": rows[0], "rows": rows}, indent=2))
    print(json.dumps(rows[0], indent=2))


if __name__ == "__main__":
    main()
