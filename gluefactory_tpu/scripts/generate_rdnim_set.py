"""Generate a synthetic RDNIM-format day/night rotated evaluation set.

Zero-egress stand-in for the Rotated Day-Night Image Matching release
(reference datasets/rdnim.py expects ``<root>/<reference>/`` dirs of
``H_<stem>``, ``<stem>_ref.jpg``, ``<stem>_query.jpg`` triples), so
``gluefactory_tpu.eval.rdnim_lines`` runs on it unchanged.

Per scene (STRUCTURED family — segment-rich, the line benchmark needs
lines):
  - a daytime base render,
  - a night restyle (strong darkening + gamma + blue-shifted gain +
    vignette + sensor noise — the photometric gap RDNIM probes),
  - a rotation-dominant homography (RDNIM's queries are rotated up to
    180 deg; we ramp |angle| across scenes) applied to the OTHER time of
    day:
      day/:   ref = day image,   query = warped night image
      night/: ref = night image, query = warped day image

Usage: python -m gluefactory_tpu.scripts.generate_rdnim_set
          [--out data/RDNIM] [--num_pairs 20] [--width 640] [--height 480]
          [--seed 314159]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from ..datasets.homographies_ondevice import generate_structured_scene
from ..geometry.homography import sample_homography_corners
from ..settings import DATA_PATH

RDNIM_SEED_SALT = 27_644_437  # disjoint from training pools + other eval sets


def night_view(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Night restyle of a [0,1] grayscale scene: heavy gamma + low gain,
    vignette (streetlight-like falloff), additive readout noise."""
    h, w = img.shape
    out = np.clip(img.astype(np.float32) ** rng.uniform(1.6, 2.4)
                  * rng.uniform(0.25, 0.45), 0.0, 1.0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = rng.uniform(0.3, 0.7) * w, rng.uniform(0.3, 0.7) * h
    r2 = ((xx - cx) / w) ** 2 + ((yy - cy) / h) ** 2
    out = out * (0.4 + 0.6 * np.exp(-r2 * rng.uniform(2.0, 5.0)))
    out = out + rng.normal(0.0, rng.uniform(0.01, 0.03), (h, w))
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def _write_pair(out_dir: Path, stem: str, ref8, query8, H):
    out_dir.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(out_dir / f"{stem}_ref.jpg"), ref8)
    cv2.imwrite(str(out_dir / f"{stem}_query.jpg"), query8)
    np.savetxt(out_dir / f"H_{stem}", H)


def generate(out: Path, num_pairs: int, size: tuple[int, int], seed: int):
    w, h = size
    for i in range(num_pairs):
        rng = np.random.default_rng(seed + RDNIM_SEED_SALT + i)
        img, _pts, _valid = generate_structured_scene(rng, (w, h), max_points=4)
        day = img[..., 0].astype(np.float32)
        night = night_view(rng, day)
        # rotation-dominant warp, |angle| ramping 15 -> 165 deg across pairs
        angle = (15.0 + 150.0 * i / max(num_pairs - 1, 1)) * (
            -1.0 if rng.uniform() < 0.5 else 1.0)
        R = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
        H_rot = np.vstack([R, [0, 0, 1]]).astype(np.float64)
        H_persp, _ = sample_homography_corners(
            (w, h), (w, h), difficulty=0.1, translation=0.1, max_angle=0.0,
            rng=rng)
        H = H_persp @ H_rot  # ref -> query
        to8 = lambda x: cv2.cvtColor(  # noqa: E731
            np.clip(x * 255, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR)
        stem = f"scene{i:03d}"
        warp = lambda x: cv2.warpPerspective(  # noqa: E731
            x, H.astype(np.float32), (w, h), flags=cv2.INTER_LINEAR)
        _write_pair(out / "day" / stem, stem, to8(day), to8(warp(night)), H)
        _write_pair(out / "night" / stem, stem, to8(night), to8(warp(day)), H)
    print(f"wrote {num_pairs} day + {num_pairs} night RDNIM pairs to {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=DATA_PATH / "RDNIM")
    ap.add_argument("--num_pairs", type=int, default=20)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--seed", type=int, default=314159)
    args = ap.parse_args()
    generate(args.out, args.num_pairs, (args.width, args.height), args.seed)


if __name__ == "__main__":
    main()
