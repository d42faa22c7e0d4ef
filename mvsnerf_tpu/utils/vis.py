"""Visualization helpers (reference utils.py:24-65)."""

from __future__ import annotations

import numpy as np


def to8b(x):
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def visualize_depth(depth, minmax=None, cmap="jet"):
    """Depth map -> (H, W, 3) uint8-scale float colormap image, plus the
    (min, max) used (reference utils.py:30-46: min = smallest positive)."""
    import matplotlib.cm

    depth = np.nan_to_num(np.asarray(depth, np.float32))
    if minmax is None:
        mi = np.min(depth[depth > 0]) if np.any(depth > 0) else 0.0
        ma = np.max(depth)
    else:
        mi, ma = minmax
    x = (depth - mi) / (ma - mi + 1e-8)
    x = np.clip(x, 0, 1)
    cm = matplotlib.cm.get_cmap(cmap)
    rgb = cm(x)[..., :3].astype(np.float32)
    return rgb, (mi, ma)


def panel(images, axis=1):
    """Concatenate same-height images into a [a | b | c] strip."""
    return np.concatenate([np.asarray(im) for im in images], axis=axis)
