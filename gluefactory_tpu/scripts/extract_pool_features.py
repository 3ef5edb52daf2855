"""Worker: extract pool features on the host CPU backend.

The axon TPU backend does not support host callbacks (pure_callback), so
extractors that call into cv2 (SIFT, LSD) cannot even be traced in a
TPU-pinned process. The cached-feature engine therefore shells out to this
script with GFTPU_PLATFORM=cpu: it loads the image pool from an npz, runs
the requested extractor batched on CPU, and writes the feature pool npz.

Usage: python -m gluefactory_tpu.scripts.extract_pool_features \
    --images pool.npz --out feats.npz --extractor extractors.sift \
    --conf '{"max_num_keypoints": 512}' [--batch 16] [--experiment exp]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--extractor", default="extractors.superpoint")
    ap.add_argument("--conf", default="{}")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--experiment", default=None)
    ap.add_argument("--weights", default=None,
                    help="committed f16 weight blob (scripts/export_weights)")
    ap.add_argument("--remap", default=None,
                    help="flat-key prefix rewrite OLD=NEW, e.g. "
                         "\"['extractor']=['point_extractor']\" to load a "
                         "pipeline-extractor blob into a wireframe submodel")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gluefactory_tpu.models import build_model

    blob = np.load(args.images)
    images = blob["images"].astype(np.float32) / 255.0
    n, h, w = images.shape[:3]
    extractor = build_model(args.extractor, json.loads(args.conf))
    size = jnp.asarray([[float(w), float(h)]], jnp.float32)
    data0 = {"image": jnp.asarray(images[:1]),
             "image_size": size}
    params = extractor.init(jax.random.key(0), data0)
    if args.experiment:
        from gluefactory_tpu.utils.experiments import (
            load_experiment, restore_from_flat_dict,
        )

        ckpt, _ = load_experiment(args.experiment, best=False)
        flat = {k.replace("['extractor']", ""): v
                for k, v in ckpt["state"]["params"].items()}
        params = restore_from_flat_dict(params, flat)
    if args.weights:
        from gluefactory_tpu.scripts.export_weights import load_weight_blob
        from gluefactory_tpu.utils.experiments import restore_from_flat_dict

        flat, _, _ = load_weight_blob(args.weights)
        if args.remap:
            old, new = args.remap.split("=", 1)
            flat = {k.replace(old, new): v for k, v in flat.items()
                    if k.startswith(old)}
        params = restore_from_flat_dict(params, flat)
    apply_fn = jax.jit(extractor.apply)
    # collect every batched array output (keypoints/descriptors/lines/
    # lines_junc_idx/... — whatever this extractor family emits)
    out: dict[str, list] = {}
    for i in range(0, n, args.batch):
        chunk = jnp.asarray(images[i: i + args.batch])
        pred = apply_fn(
            params,
            {"image": chunk,
             "image_size": jnp.broadcast_to(size, (chunk.shape[0], 2))},
        )
        for k, v in pred.items():
            if k.endswith("_dense") or not hasattr(v, "shape"):
                continue  # dense maps are huge and re-derivable
            if v.ndim == 0 or v.shape[0] != chunk.shape[0]:
                continue
            arr = np.asarray(v)
            if k == "descriptors":
                arr = arr.astype(np.float16)
            out.setdefault(k, []).append(arr)
    np.savez(args.out, **{k: np.concatenate(v) for k, v in out.items()})
    print(f"extracted {n} pool images ({sorted(out)}) -> {args.out}")


if __name__ == "__main__":
    main()
