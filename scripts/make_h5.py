#!/usr/bin/env python
"""Streaming Karras-format HDF5 pyramid writer (round-5, VERDICT r4 next #3).

Produces the file layout CelebA-HQ actually ships in — one NCHW uint8
``data{r}x{r}`` array per resolution from 4x4 up to ``--res`` (reference
dataset.py:73-116 reads exactly this) — at multi-GB scale, so the windowed
streaming mode (``--OldH5Dataset.preload False``, ``_H5Window``) can be
hardware-proven against a corpus that could NOT be loaded the reference's
way without >RAM cost.

Written streaming: images are generated (scripts/make_corpus.py textures)
and downsampled chunk-wise, so peak writer memory is one chunk's pyramid
(~130 MB at the default chunk), never the corpus. Row-sized h5 chunks at the
big levels match the per-batch read pattern of the streaming trainer.

Usage:
    python scripts/make_h5.py --out /tmp/tex1024.h5 --n 1024 --res 1024
    # -> ~4.1 GB file: data4x4 ... data1024x1024
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_corpus import make_image  # noqa: E402

from pggan_tpu.data.datasets import box_downsample  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()

    import h5py
    levels = list(range(2, int(math.log2(args.res)) + 1))  # 4x4 .. res
    rng = np.random.RandomState(args.seed)
    with h5py.File(args.out, "w") as f:
        dsets = {}
        for d in levels:
            r = 2 ** d
            # row-sized chunks at big levels (the streaming reader fetches
            # per-batch rows); small levels pack many rows per chunk
            rows_per_chunk = 1 if r >= 256 else max(1, 2 ** 18 // (3 * r * r))
            dsets[d] = f.create_dataset(
                f"data{r}x{r}", shape=(args.n, 3, r, r), dtype=np.uint8,
                chunks=(min(rows_per_chunk, args.n), 3, r, r))
        for lo in range(0, args.n, args.chunk):
            hi = min(lo + args.chunk, args.n)
            block = np.stack([make_image(rng, args.res)
                              for _ in range(hi - lo)])  # (B, H, W, C) uint8
            for d in reversed(levels):
                dsets[d][lo:hi] = block.transpose(0, 3, 1, 2)  # NCHW on disk
                if d > levels[0]:
                    block = np.stack([np.uint8(np.clip(np.round(
                        box_downsample(img, 2)), 0, 255)) for img in block])
            print(f"  {hi}/{args.n}", flush=True)
    size = os.path.getsize(args.out) / 2 ** 30
    print(f"wrote {args.out}: {args.n} images, levels "
          f"{[4 * 2 ** (d - 2) for d in levels]}, {size:.2f} GiB")


if __name__ == "__main__":
    main()
