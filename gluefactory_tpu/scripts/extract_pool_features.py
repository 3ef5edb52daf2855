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
    apply_fn = jax.jit(extractor.apply)
    kpts, descs, scores, valid = [], [], [], []
    for i in range(0, n, args.batch):
        chunk = jnp.asarray(images[i: i + args.batch])
        pred = apply_fn(
            params,
            {"image": chunk,
             "image_size": jnp.broadcast_to(size, (chunk.shape[0], 2))},
        )
        kpts.append(np.asarray(pred["keypoints"]))
        descs.append(np.asarray(pred["descriptors"], np.float16))
        scores.append(np.asarray(pred["keypoint_scores"]))
        valid.append(np.asarray(pred["keypoint_valid"]))
    np.savez(
        args.out,
        keypoints=np.concatenate(kpts),
        descriptors=np.concatenate(descs),
        keypoint_scores=np.concatenate(scores),
        keypoint_valid=np.concatenate(valid),
    )
    print(f"extracted {n} pool images -> {args.out}")


if __name__ == "__main__":
    main()
