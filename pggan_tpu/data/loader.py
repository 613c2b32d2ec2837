"""Host input pipeline: infinite random sampling + threaded batch prefetch.

The reference wraps datasets in a torch DataLoader with 16 forked worker
processes and an epoch-less ``InfiniteRandomSampler`` (train.py:51-57,
140-142). For a TPU host pipeline, threads beat forked processes here: numpy
decode/downsample work releases the GIL, there is no per-depth 16-process
respawn cost at stage transitions (the reference pays it at every depth
change, plugins.py:68-69), and live ``dataset.alpha`` updates are visible to
workers (fixing the reference's frozen-alpha fork quirk — see datasets.py).

``DataIterator`` yields ready (B, H, W, C) float32 numpy batches from a
bounded prefetch queue. For multi-host data parallelism each host constructs
its iterator over its own file shard (``shard_index``/``num_shards``).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class _ShardedSampler:
    """Thread-safe infinite random sampler over an explicit index array
    (per-host file shards), reshuffling each pass."""

    def __init__(self, indices: np.ndarray, seed: int | None):
        self.indices = np.asarray(indices)
        self.rng = np.random.RandomState(seed)
        self._perm = []
        self._pos = 0
        self._lock = threading.Lock()

    def __iter__(self):
        return self

    def __next__(self) -> int:
        return self.take_batch(1)[0]

    def take_batch(self, n: int) -> list[int]:
        out = []
        with self._lock:
            while len(out) < n:
                if self._pos >= len(self._perm):
                    self._perm = self.rng.permutation(self.indices)
                    self._pos = 0
                out.append(int(self._perm[self._pos]))
                self._pos += 1
        return out


class InfiniteRandomSampler(_ShardedSampler):
    """Yields uniformly random indices in [0, length) forever, reshuffling
    each pass (reference train.py:51-57)."""

    def __init__(self, length: int, seed: int | None = None):
        super().__init__(np.arange(length), seed)
        self.length = length


class DataIterator:
    """Threaded prefetching batch iterator over a DepthDataset.

    Each worker thread assembles complete batches (sampling indices from the
    shared sampler) and pushes them to a bounded queue; ``__next__`` pops a
    ready batch. ``drop_last`` semantics are implicit: batches are always
    exactly ``batch_size`` (the sampler is infinite).
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 seed: int | None = None, prefetch: int = 4,
                 shard_index: int = 0, num_shards: int = 1,
                 raw: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.raw = raw  # yield uint8 raw batches; prep happens on device
        self.num_workers = max(1, num_workers)
        self._indices = self._make_index_space(shard_index, num_shards)
        self.sampler = _ShardedSampler(self._indices, seed)
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True,
                             name=f"pggan-data-{i}")
            for i in range(self.num_workers)
        ]
        for t in self._threads:
            t.start()

    def _make_index_space(self, shard_index: int, num_shards: int):
        n = len(self.dataset)
        if num_shards <= 1:
            return np.arange(n)
        return np.arange(shard_index, n, num_shards)

    def _worker(self):
        from pggan_tpu.data import native
        while not self._stop.is_set():
            idxs = self.sampler.take_batch(self.batch_size)
            try:
                raw = (self.dataset.raw_batch(idxs)
                       if hasattr(self.dataset, "raw_batch") else None)
                if raw is not None and self.raw:
                    # device-side prep mode: ship uint8 pixels as-is
                    batch = raw
                elif raw is not None:
                    # fused fade + dynamic-range remap (C++ when built,
                    # identical numpy fallback otherwise)
                    batch = native.prep_batch_f32(
                        raw, self.dataset.alpha,
                        self.dataset.range_in, self.dataset.range_out)
                else:
                    batch = np.stack([self.dataset[i] for i in idxs], axis=0)
            except Exception as e:  # surface worker errors to the consumer
                self._put((None, e))
                return
            self._put((batch, None))

    def _put(self, item):
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._stop.is_set():
            raise StopIteration
        batch, err = self._queue.get()
        if err is not None:
            self.close()
            raise err
        return batch

    def close(self):
        self._stop.set()
        # drain so blocked workers can exit
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass

    def __del__(self):
        self._stop.set()


