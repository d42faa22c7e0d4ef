"""Per-scene train/val/test view splits.

The reference distributes these as a torch-pickled dict `configs/pairs.th`
(57 entries `{scene}_{train,val,test}`; generation recipe renderer.ipynb
cell 20). This framework ships the same tables as JSON and can also
regenerate them from camera poses.
"""

from __future__ import annotations

import json
import os

import numpy as np

_PAIRS_PATH = os.path.join(os.path.dirname(__file__), "..", "configs",
                           "pairs.json")
_cache = None


def load_pairs(path: str | None = None) -> dict:
    """{name: np.ndarray of view indices} for `{scene}_{split}` keys."""
    global _cache
    if path is None and _cache is not None:
        return _cache
    with open(path or _PAIRS_PATH) as f:
        data = {k: np.asarray(v) for k, v in json.load(f).items()}
    if path is None:
        _cache = data
    return data


def get_split(scene: str, split: str, path: str | None = None):
    pairs = load_pairs(path)
    key = f"{scene}_{split}"
    if key not in pairs:
        raise KeyError(f"no pair split '{key}'; known scenes: "
                       f"{sorted({k.rsplit('_', 1)[0] for k in pairs})}")
    return pairs[key]


def generate_pairs(c2ws, n_train: int = 16, test_every: int = 6):
    """Regenerate a scene's splits from camera poses, following the
    reference recipe (renderer.ipynb cell 20): views ranked by distance to
    the camera-center centroid; every `test_every`-th held out for test/val,
    the nearest `n_train` of the rest for train."""
    centers = np.asarray(c2ws)[:, :3, 3]
    dists = np.linalg.norm(centers - centers.mean(0, keepdims=True), axis=-1)
    order = np.argsort(dists)
    test = order[::test_every][:4]
    remaining = np.array([i for i in order if i not in set(test.tolist())])
    train = remaining[:n_train]
    return {"train": train, "val": test.copy(), "test": test}
