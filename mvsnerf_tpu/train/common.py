"""Shared training utilities: batch iteration, image unpreprocessing."""

from __future__ import annotations

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
