#!/usr/bin/env python
"""Deterministic structured synthetic corpus generator (round-5 hardware
evidence runs).

Round-4's quality-curve corpus was unstructured soft blobs; the judge asked
for "textured/compositional synthetics" (VERDICT r4 next #2) because the SWD
metric scores PATCH statistics across a Laplacian pyramid — a corpus with
correlated multi-scale structure (smooth shading + oriented texture + sharp
object boundaries) makes the metric's convergence-to-floor meaningful at
every level, the way natural data does.

Each image composes, with parameters drawn from continuous distributions so
the corpus is a learnable manifold rather than a lookup table:

  1. a smooth background: oriented linear gradient + two low-frequency
     cosine fields (global structure; dominates the coarse pyramid levels),
  2. an oriented sinusoidal stripe texture gated by a smooth mask (mid-level
     statistics; random orientation/frequency/phase),
  3. 1-3 soft-edged discs, one with a bright ring (sharp local structure;
     dominates the fine levels),
  4. a mild vignette.

Output: n RGB PNGs (a hue rotation maps the grayscale composition to three
correlated channels — RGB matches bench.py's model shapes so the flagship
run reuses the persistent-cache'd step programs).

Usage:
    python scripts/make_corpus.py --out /tmp/flagship_imgs --n 96 --res 1024
    python scripts/make_corpus.py --out /tmp/tex128 --n 512 --res 128
"""

import argparse
import os

import numpy as np


def _grid(res):
    y, x = np.mgrid[0:res, 0:res].astype(np.float32) / res
    return x, y


def make_image(rng: np.random.RandomState, res: int) -> np.ndarray:
    x, y = _grid(res)

    # 1. smooth background
    th = rng.uniform(0, 2 * np.pi)
    img = 0.5 * (np.cos(th) * x + np.sin(th) * y)
    for _ in range(2):
        fx, fy = rng.uniform(1.0, 3.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 2)
        img = img + rng.uniform(0.1, 0.25) * (
            np.cos(2 * np.pi * fx * x + ph[0])
            * np.cos(2 * np.pi * fy * y + ph[1]))

    # 2. oriented stripe texture under a smooth gate
    th_t = rng.uniform(0, np.pi)
    freq = rng.uniform(8.0, 24.0)
    phase = rng.uniform(0, 2 * np.pi)
    stripes = np.sin(2 * np.pi * freq
                     * (np.cos(th_t) * x + np.sin(th_t) * y) + phase)
    gcx, gcy = rng.uniform(0.2, 0.8, 2)
    gr = rng.uniform(0.2, 0.45)
    gate = np.exp(-((x - gcx) ** 2 + (y - gcy) ** 2) / (2 * gr ** 2))
    img = img + rng.uniform(0.15, 0.35) * stripes * gate

    # 3. soft discs; the first gets a bright ring
    for k in range(rng.randint(1, 4)):
        cx, cy = rng.uniform(0.15, 0.85, 2)
        r = rng.uniform(0.06, 0.2)
        d = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
        edge = 0.01 + 0.02 * rng.rand()
        disc = 1.0 / (1.0 + np.exp((d - r) / edge))
        img = img + rng.uniform(-0.6, 0.6) * disc
        if k == 0:
            ring = np.exp(-((d - r) ** 2) / (2 * (edge * 2) ** 2))
            img = img + rng.uniform(0.3, 0.7) * ring

    # 4. vignette
    img = img * (1.0 - 0.3 * ((x - 0.5) ** 2 + (y - 0.5) ** 2) * 4)

    # normalize per-image to [0, 1]
    img = (img - img.min()) / (img.max() - img.min() + 1e-8)

    # grayscale -> 3 correlated channels (hue rotation)
    base = rng.uniform(0.0, 2 * np.pi)
    chans = [0.75 * img + 0.25 * (0.5 + 0.5 * np.cos(2 * np.pi * img
                                                     + base + off))
             for off in (0.0, 2.1, 4.2)]
    rgb = np.stack(chans, axis=-1)
    return np.uint8(np.clip(np.round(rgb * 255.0), 0, 255))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from PIL import Image
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for i in range(args.n):
        Image.fromarray(make_image(rng, args.res), "RGB").save(
            os.path.join(args.out, f"tex_{i:04}.png"))
    print(f"wrote {args.n} {args.res}x{args.res} RGB images to {args.out}")


if __name__ == "__main__":
    main()
