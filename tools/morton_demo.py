#!/usr/bin/env python3
"""Morton tile-traversal demonstration animation.

Port of the reference's teaching artifact ``morton_demonstration()``
(/root/reference/main.cpp:144-261): 16x16 tiles of 32px light up in Morton
order (one tile every 2 frames) and fade over 50 frames, with a tile grid
and center axes composited on top; frames are written as
``morton_frames/morton_NNNN.pfm``.

This is a host-side teaching tool, vectorized in numpy over whole frames
(the per-pixel loops of the reference collapse into array ops); the Morton
decode comes from the same core/morton.py the renderer's coherence sort
uses.

Usage: python tools/morton_demo.py [--out morton_frames] [--frames N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-side tool

from simplepath_tpu.core.morton import morton_decode32  # noqa: E402
from simplepath_tpu.io.pfm import write_pfm  # noqa: E402

TILE = 32
TILES_1D = 16
NUM_TILES = TILES_1D * TILES_1D
PIXELS_1D = TILE * TILES_1D
FRAMES_TO_ACTIVATE = 2
FRAMES_TO_FADE = 50
MIN_SATURATION = 0.0
HUE = 240.0 / 360.0  # base/hit hue (Degrees{240}, main.cpp:155-156)


def hsv_to_rgb_np(h, s, v):
    """Vectorized HSV->RGB matching core/color.hsv_to_rgb (HSV.h:100-170)."""
    h6 = (h % 1.0) * 6.0
    i = np.floor(h6).astype(np.int64) % 6
    f = h6 - np.floor(h6)
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    rgb = np.select(
        [(i == k)[..., None] for k in range(6)],
        [np.stack([v, t, p], -1), np.stack([q, v, p], -1),
         np.stack([p, v, t], -1), np.stack([p, q, v], -1),
         np.stack([t, p, v], -1), np.stack([v, p, q], -1)])
    return rgb


def add_grid(img: np.ndarray) -> np.ndarray:
    """Tile grid + center axes, alpha-composited by grid luminance
    (main.cpp:186-226)."""
    h, w, _ = img.shape
    grid = np.zeros_like(img)
    for i in range(0, w + 1, TILE):
        left, right = max(0, i - 1), min(w - 1, i)
        grid[:, left] = np.maximum(grid[:, left], 0.3)
        grid[:, right] = np.maximum(grid[:, right], 0.3)
    for i in range(0, h + 1, TILE):
        top, bottom = max(0, i - 1), min(h - 1, i)
        grid[top, :] = np.maximum(grid[top, :], 0.7 * 0 + 0.3)
        grid[bottom, :] = np.maximum(grid[bottom, :], 0.3)
    cx, cy = w // 2, h // 2
    grid[cy - 1:cy + 1, :] = np.maximum(grid[cy - 1:cy + 1, :], 0.7)
    grid[:, cx - 1:cx + 1] = np.maximum(grid[:, cx - 1:cx + 1], 0.7)
    alpha = (0.2126 * grid[..., 0] + 0.7152 * grid[..., 1]
             + 0.0722 * grid[..., 2])[..., None]
    return grid * alpha + img * (1.0 - alpha)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="morton_frames")
    ap.add_argument("--frames", type=int,
                    default=FRAMES_TO_ACTIVATE * NUM_TILES + FRAMES_TO_FADE)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    tiles = np.arange(NUM_TILES, dtype=np.uint32)
    tx, ty = (np.asarray(v, np.int64) for v in morton_decode32(tiles))
    activation = FRAMES_TO_ACTIVATE * tiles

    sat_tiles = np.full(NUM_TILES, MIN_SATURATION, np.float32)
    for frame in range(args.frames):
        age = frame - activation
        active = age >= 0
        fading = active & (age <= FRAMES_TO_FADE)
        sat = np.where(age == 0, 1.0,
                       np.where(fading, MIN_SATURATION + (1.0 - age / FRAMES_TO_FADE),
                                MIN_SATURATION)).astype(np.float32)
        sat_tiles = np.where(active, sat, sat_tiles)

        # expand per-tile saturation to pixels; HSV(240deg, s, 1) -> RGB
        sat_grid = np.zeros((TILES_1D, TILES_1D), np.float32)
        sat_grid[ty, tx] = sat_tiles
        sat_px = np.kron(sat_grid, np.ones((TILE, TILE), np.float32))
        img = hsv_to_rgb_np(np.full_like(sat_px, HUE), sat_px,
                            np.ones_like(sat_px)).astype(np.float32)
        img = add_grid(img)
        write_pfm(os.path.join(args.out, f"morton_{frame:04d}.pfm"), img)
    print(f"wrote {args.frames} frames to {args.out}/")


if __name__ == "__main__":
    main()
