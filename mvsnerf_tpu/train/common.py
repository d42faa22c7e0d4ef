"""Shared training utilities: batch iteration, prefetching, image
unpreprocessing."""

from __future__ import annotations

import queue
import threading

import numpy as np

import jax.numpy as jnp

from ..data.common import IMAGENET_MEAN, IMAGENET_STD


def unpreprocess_images(imgs):
    """Undo ImageNet normalization (reference train_*.py `unpreprocess`);
    imgs: (..., 3) channel-last."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return imgs * std + mean


class RayBatchIterator:
    """Shuffled fixed-size batches from flat numpy ray buffers — the
    replacement for the reference's torch DataLoader(batch_size=1024) over
    the per-scene datasets. Infinite iterator; reshuffles each epoch."""

    def __init__(self, arrays: dict, batch_size: int, seed: int = 0):
        self.arrays = arrays
        self.n = len(next(iter(arrays.values())))
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self._perm = None
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._perm is None or self._pos + self.batch_size > self.n:
            self._perm = self.rng.permutation(self.n)
            self._pos = 0
        idx = self._perm[self._pos: self._pos + self.batch_size]
        self._pos += self.batch_size
        keys = list(self.arrays)
        if set(keys) == {"rays", "rgbs"}:
            # hot path: multi-threaded native gather
            from .. import native
            if native.available():
                rays, rgbs = native.ray_gather(self.arrays["rays"],
                                               self.arrays["rgbs"], idx)
                return {"rays": rays, "rgbs": rgbs}
        return {k: v[idx] for k, v in self.arrays.items()}


class Prefetcher:
    """Background-thread batch prefetch: overlaps host-side batch assembly
    (shuffle + gather, released-GIL native copies) with the device step —
    the role of the reference's DataLoader worker pool
    (train_mvs_nerf_finetuning_pl.py:126-131, num_workers=8)."""

    def __init__(self, iterator, depth: int = 2):
        self._it = iterator
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _fill(self):
        while not self._stop.is_set():
            batch = next(self._it)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
