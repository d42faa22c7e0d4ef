"""Native checkpointing: atomic msgpack pytree snapshots with resume.

Improves on the reference's plain torch.save dict (SURVEY.md §5.4): includes
optimizer state, writes atomically (tmp file + rename so a crash never
corrupts the latest snapshot), and supports resume-by-default via
`latest_checkpoint`.
"""

from __future__ import annotations

import os
import re

import jax
from flax import serialization


def save_checkpoint(ckpt_dir: str, state, step: int, prefix: str = "ckpt_",
                    keep: int = 3) -> str:
    """Atomically write `state` (any pytree) at `step`. Returns the path."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state = jax.device_get(state)
    path = os.path.join(ckpt_dir, f"{prefix}{step:09d}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)
    # prune old snapshots
    snaps = sorted(_list_snapshots(ckpt_dir, prefix))
    for _, old in snaps[:-keep]:
        try:
            os.remove(old)
        except OSError:
            pass
    return path


def _list_snapshots(ckpt_dir: str, prefix: str):
    pat = re.compile(re.escape(prefix) + r"(\d+)\.msgpack$")
    out = []
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(ckpt_dir, name)))
    return out


def latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt_"):
    """(step, path) of the newest snapshot, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    snaps = sorted(_list_snapshots(ckpt_dir, prefix))
    return snaps[-1] if snaps else None


def load_checkpoint(path: str, target):
    """Restore a pytree with the same structure as `target`."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())
