"""Render a zero-egress relative-pose benchmark in the megadepth-1500
calibrated-pairs format (datasets/image_pairs.py: ``im0 im1 K0(9) K1(9)
T_0to1(16)``).

Each scene is a piecewise-planar 3-D world — vertical strips of a textured
image assigned to slanted planes at different depths — so the second view
renders *exactly* by per-plane homographies (H_i = K (R^T - t' n_i^T / d_i)
K^-1 composited far-to-near), while the multi-depth layout gives genuine
parallax: the pair is NOT explained by any single homography, which is
what makes essential-matrix estimation well-posed (a single plane would be
degenerate). Ground truth K, R, t are exact by construction; the
homography-from-plane convention is verified numerically per scene by
projecting on-plane 3-D points into both views.

Camera convention matches geometry/wrappers.Pose: T_0to1 maps cam-0
coordinates to cam-1, X1 = R X0 + t.

CLI: python -m gluefactory_tpu.scripts.generate_pose_eval_set
       [--out data/pose-eval] [--num_scenes 10] [--pairs_per_scene 2]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from ..settings import DATA_PATH
from ..datasets.homographies import generate_structured_image


def _rotation(rng: np.random.Generator, max_deg: float) -> np.ndarray:
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = np.deg2rad(rng.uniform(0.3 * max_deg, max_deg))
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


def _plane_homography(Kmat, R, t, n, d):
    """H mapping view-0 pixels on plane {n^T X = d, cam-0 coords} to view-1
    pixels, with X1 = R X0 + t."""
    return Kmat @ (R + np.outer(t, n) / d) @ np.linalg.inv(Kmat)


def _check_convention(Kmat, R, t, n, d, rng):
    """Numeric guard: project on-plane points into both views, compare with
    the homography warp."""
    H = _plane_homography(Kmat, R, t, n, d)
    px = rng.uniform([100, 100], [500, 380], (16, 2))
    rays = np.linalg.inv(Kmat) @ np.c_[px, np.ones(len(px))].T  # (3, N)
    depth = d / (n @ rays)
    X0 = rays * depth
    X1 = R @ X0 + t[:, None]
    proj1 = (Kmat @ X1)
    proj1 = (proj1[:2] / proj1[2]).T
    warped = cv2.perspectiveTransform(px[None].astype(np.float64), H)[0]
    err = np.abs(warped - proj1).max()
    assert err < 1e-6, f"homography/pose convention broke: {err}"
    return H, float(depth.min())


def make_planar_world(rng: np.random.Generator, size, n_planes: int):
    """Strip edges + slanted planes at staggered depths + K for a scene."""
    w, h = size
    f = 0.9 * w
    Kmat = np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]])
    edges = np.linspace(0, w, n_planes + 1).astype(int)
    depths = rng.permutation(np.linspace(4.0, 9.0, n_planes))
    planes = []
    for i in range(n_planes):
        tilt = rng.uniform(-0.25, 0.25, size=2)
        n = np.array([tilt[0], tilt[1], 1.0])
        planes.append((n / np.linalg.norm(n), float(depths[i])))
    return Kmat, edges, planes


def composite_view(img0_u8: np.ndarray, Kmat: np.ndarray, planes, edges,
                   R: np.ndarray, t: np.ndarray, rng: np.random.Generator,
                   gain_range=(0.9, 1.1), bias_range=(-8, 8)):
    """Render the view at (R, t) by per-plane homographies composited
    far-to-near (painter's algorithm) + mild photometric perturbation."""
    h, w = img0_u8.shape[:2]
    order = np.argsort([-d for _, d in planes])
    img1 = np.zeros_like(img0_u8)
    filled = np.zeros((h, w), bool)
    for pi in order:
        n, d = planes[pi]
        H, _ = _check_convention(Kmat, R, t, n, d, rng)
        strip = np.zeros((h, w), np.uint8)
        strip[:, edges[pi]:edges[pi + 1]] = 255
        warped = cv2.warpPerspective(img0_u8, H.astype(np.float64), (w, h))
        mask = cv2.warpPerspective(strip, H.astype(np.float64), (w, h)) > 127
        img1[mask] = warped[mask]
        filled |= mask
    gain = rng.uniform(*gain_range)
    img1 = np.clip(img1.astype(np.float32) * gain
                   + rng.uniform(*bias_range), 0, 255)
    img1 = (img1 + rng.normal(0, 2.0, img1.shape)).clip(0, 255)
    img1 = img1.astype(np.uint8)
    img1[~filled] = 0
    return img1


def render_pose_scene(out_dir: Path, rng: np.random.Generator,
                      size=(640, 480), n_planes: int = 4,
                      max_rot_deg: float = 10.0, t_scale: float = 0.35,
                      n_pairs: int = 2):
    """Render 1 reference + n_pairs target views; returns the pair lines."""
    w, h = size
    out_dir.mkdir(parents=True, exist_ok=True)
    img0 = generate_structured_image(rng, (w, h))
    img0_u8 = (img0 * 255).astype(np.uint8) if img0.dtype != np.uint8 \
        else img0
    cv2.imwrite(str(out_dir / "0.png"), img0_u8[..., ::-1])

    Kmat, edges, planes = make_planar_world(rng, (w, h), n_planes)

    lines = []
    for k in range(n_pairs):
        R = _rotation(rng, max_rot_deg)
        t = rng.normal(size=3)
        t = t / np.linalg.norm(t) * t_scale * (1.0 + 0.5 * k)
        img1 = composite_view(img0_u8, Kmat, planes, edges, R, t, rng)
        cv2.imwrite(str(out_dir / f"{k + 1}.png"), img1[..., ::-1])

        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        kflat = " ".join(f"{x:.8g}" for x in Kmat.ravel())
        tflat = " ".join(f"{x:.8g}" for x in T.ravel())
        lines.append(
            f"{out_dir.name}/0.png {out_dir.name}/{k + 1}.png "
            f"{kflat} {kflat} {tflat}"
        )
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(DATA_PATH / "pose-eval"))
    ap.add_argument("--num_scenes", type=int, default=10)
    ap.add_argument("--pairs_per_scene", type=int, default=2)
    ap.add_argument("--seed", type=int, default=31415)
    args = ap.parse_args()

    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    lines = []
    for s in range(args.num_scenes):
        rng = np.random.default_rng((args.seed, s))
        lines += render_pose_scene(
            out / "images" / f"scene{s:03d}", rng,
            n_pairs=args.pairs_per_scene)
    (out / "pairs_calibrated.txt").write_text("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} calibrated pairs under {out}")


if __name__ == "__main__":
    main()
