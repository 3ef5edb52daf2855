"""Generate a synthetic HPatches-format evaluation benchmark.

Zero-egress stand-in for the real hpatches-sequences-release download
(reference datasets/hpatches.py auto-downloads it): renders procedural
scenes and five warped views each, written as

    <out>/<seq>/{1..6}.ppm  +  <out>/<seq>/H_1_{2..6}

so gluefactory_tpu.eval.hpatches runs on it unchanged. View difficulty ramps
2 -> 6 like the real viewpoint sequences.

Two scene families:
  - ``--family a``: corner-rich drawn scenes — the SAME generator family as
    every training pool (disjoint seed stream). In-distribution eval.
  - ``--family b``: textured scenes from ``datasets/scene_families`` — a
    structurally disjoint generator NO training pool ever draws from
    (dead-leaves/value-noise/Voronoi/gratings). Out-of-distribution eval;
    quality gates live here (round-2 verdict ask #2). Family b also renders
    ``i_*`` illumination-only sequences (identity H, photometric ramps —
    ≙ the reference HPatches i_ split, datasets/hpatches.py:37-56) alongside
    the ``v_*`` viewpoint sequences.

Usage: python -m gluefactory_tpu.scripts.generate_eval_set
          [--out data/hpatches-sequences-release] [--num_seqs 20]
          [--family a] [--illum_seqs 0]
          [--width 640] [--height 480] [--seed 0]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from ..datasets.homographies_ondevice import generate_structured_scene
from ..datasets.scene_families import generate_textured_scene, photometric_view
from ..geometry.homography import sample_homography_corners
from ..settings import DATA_PATH

EVAL_SEED_SALT = 1_000_003  # disjoint from every training pool stream
FAMILY_B_SALT = 7_368_787  # family-b streams disjoint from family-a's


def _render_scene(rng, size, family: str) -> np.ndarray:
    """Base scene as uint8 BGR."""
    w, h = size
    if family == "a":
        img, _pts, _valid = generate_structured_scene(rng, (w, h), max_points=4)
        img = img[..., 0]
    else:
        img = generate_textured_scene(rng, (w, h))
    img8 = np.clip(img * 255, 0, 255).astype(np.uint8)
    return cv2.cvtColor(img8, cv2.COLOR_GRAY2BGR)


def render_sequence(
    seq_dir: Path, rng: np.random.Generator, size: tuple[int, int],
    family: str = "a",
):
    """Viewpoint sequence: 1.ppm + five H-warped views of ramping difficulty."""
    w, h = size
    img8 = _render_scene(rng, size, family)
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


def render_illumination_sequence(
    seq_dir: Path, rng: np.random.Generator, size: tuple[int, int],
    family: str = "b",
):
    """Illumination sequence: fixed viewpoint (H = identity), five
    photometric variants of the base scene (≙ HPatches i_ semantics)."""
    w, h = size
    img8 = _render_scene(rng, size, family)
    base = img8[..., 0].astype(np.float32) / 255.0
    seq_dir.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(seq_dir / "1.ppm"), img8)
    for k in range(2, 7):
        view = photometric_view(rng, base)
        v8 = cv2.cvtColor(
            np.clip(view * 255, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR
        )
        cv2.imwrite(str(seq_dir / f"{k}.ppm"), v8)
        np.savetxt(seq_dir / f"H_1_{k}", np.eye(3))


def generate(
    out: Path, num_seqs: int, size: tuple[int, int], seed: int,
    family: str = "a", illum_seqs: int = 0,
):
    salt = EVAL_SEED_SALT + (FAMILY_B_SALT if family == "b" else 0)
    tag = "synth" if family == "a" else "tex"
    for s in range(num_seqs):
        rng = np.random.default_rng((salt + seed, s))
        render_sequence(out / f"v_{tag}{s:03d}", rng, size, family)
    for s in range(illum_seqs):
        rng = np.random.default_rng((salt + seed, 500_000 + s))
        render_illumination_sequence(out / f"i_{tag}{s:03d}", rng, size, family)
    print(f"wrote {num_seqs} v_ + {illum_seqs} i_ sequences to {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(DATA_PATH / "hpatches-sequences-release"))
    ap.add_argument("--num_seqs", type=int, default=20)
    ap.add_argument("--illum_seqs", type=int, default=0)
    ap.add_argument("--family", choices=["a", "b"], default="a")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(
        Path(args.out), args.num_seqs, (args.width, args.height), args.seed,
        family=args.family, illum_seqs=args.illum_seqs,
    )


if __name__ == "__main__":
    main()
