"""Generate a synthetic HPatches-format evaluation benchmark.

Zero-egress stand-in for the real hpatches-sequences-release download
(reference datasets/hpatches.py auto-downloads it): renders procedural
corner-rich scenes (same generator family as the training pool but a
DISJOINT seed stream) and five homography-warped views each, written as

    <out>/<seq>/{1..6}.ppm  +  <out>/<seq>/H_1_{2..6}

so gluefactory_tpu.eval.hpatches runs on it unchanged. View difficulty ramps
2 -> 6 like the real viewpoint sequences.

Usage: python -m gluefactory_tpu.scripts.generate_eval_set
          [--out data/hpatches-sequences-release] [--num_seqs 20]
          [--width 640] [--height 480] [--seed 0]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from ..datasets.homographies_ondevice import generate_structured_scene
from ..geometry.homography import sample_homography_corners
from ..settings import DATA_PATH

EVAL_SEED_SALT = 1_000_003  # disjoint from every training pool stream


def render_sequence(seq_dir: Path, rng: np.random.Generator, size: tuple[int, int]):
    w, h = size
    img, _pts, _valid = generate_structured_scene(rng, (w, h), max_points=4)
    img8 = np.clip(img[..., 0] * 255, 0, 255).astype(np.uint8)
    img8 = cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR)
    seq_dir.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(seq_dir / "1.ppm"), img8)
    for k in range(2, 7):
        difficulty = 0.15 + 0.1 * (k - 2)
        H, _ = sample_homography_corners(
            (w, h), (w, h),
            difficulty=difficulty, translation=0.15,
            max_angle=5.0 + 6.0 * (k - 2),
            rng=rng,
        )
        warped = cv2.warpPerspective(img8, H, (w, h), flags=cv2.INTER_LINEAR)
        cv2.imwrite(str(seq_dir / f"{k}.ppm"), warped)
        np.savetxt(seq_dir / f"H_1_{k}", H)


def generate(out: Path, num_seqs: int, size: tuple[int, int], seed: int):
    for s in range(num_seqs):
        rng = np.random.default_rng((EVAL_SEED_SALT + seed, s))
        render_sequence(out / f"v_synth{s:03d}", rng, size)
    print(f"wrote {num_seqs} sequences to {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(DATA_PATH / "hpatches-sequences-release"))
    ap.add_argument("--num_seqs", type=int, default=20)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(Path(args.out), args.num_seqs, (args.width, args.height), args.seed)


if __name__ == "__main__":
    main()
