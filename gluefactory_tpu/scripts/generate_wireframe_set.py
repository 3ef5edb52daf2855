"""Generate a synthetic Wireframe-format single-view benchmark set.

Zero-egress stand-in for the ShanghaiTech Wireframe release (reference
datasets/wireframe.py:47-160 expects ``<root>/{train,test}/*.npz`` with
``image``, ``junctions`` (J, 2), ``lines`` (L, 2) junction-index pairs):
renders STRUCTURED-family scenes (323aab1) whose drawn edges ARE the GT —
segment endpoints become the junction set, each segment an index pair — so
``gluefactory_tpu.eval.wireframe`` runs on it unchanged with exact GT.

Usage: python -m gluefactory_tpu.scripts.generate_wireframe_set
          [--out data/wireframe] [--num_images 30] [--width 512]
          [--height 512] [--seed 161803]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..datasets.homographies_ondevice import generate_structured_scene
from ..settings import DATA_PATH

WIREFRAME_SEED_SALT = 86_028_121  # disjoint from training + other eval sets


def generate(out: Path, num_images: int, size: tuple[int, int], seed: int):
    w, h = size
    test = out / "test"
    test.mkdir(parents=True, exist_ok=True)
    for i in range(num_images):
        rng = np.random.default_rng(seed + WIREFRAME_SEED_SALT + i)
        img, _pts, _valid, segs, seg_valid = generate_structured_scene(
            rng, (w, h), max_points=4, max_segments=64)
        segs = np.asarray(segs)[np.asarray(seg_valid)]
        # junctions = unique segment endpoints; lines = index pairs into them
        endpoints = segs.reshape(-1, 2)
        junctions, inverse = np.unique(
            np.round(endpoints * 4) / 4, axis=0, return_inverse=True)
        lines = inverse.reshape(-1, 2).astype(np.int32)
        # drop degenerate (self-loop) segments from endpoint quantization
        keep = lines[:, 0] != lines[:, 1]
        img8 = np.clip(np.asarray(img)[..., 0] * 255, 0, 255).astype(np.uint8)
        np.savez_compressed(
            test / f"img{i:04d}.npz",
            image=np.repeat(img8[..., None], 3, axis=-1),
            junctions=junctions.astype(np.float32),
            lines=lines[keep],
        )
    print(f"wrote {num_images} wireframe test images to {test}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=DATA_PATH / "wireframe")
    ap.add_argument("--num_images", type=int, default=30)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--seed", type=int, default=161803)
    args = ap.parse_args()
    generate(args.out, args.num_images, (args.width, args.height), args.seed)


if __name__ == "__main__":
    main()
