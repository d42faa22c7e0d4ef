"""Device-mesh construction.

The workload's scale axis is rays x samples (SURVEY.md §2.8): no tensor or
pipeline parallelism is needed (the whole model is < 2 MB), so the mesh is
1-D over rays for rendering and over the ray batch for training. Multi-host
deployments extend the same mesh over DCN (data axis outermost so gradient
psum rides ICI within a slice).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


RAY_AXIS = "rays"


def make_mesh(devices=None, axis_name: str = RAY_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def local_mesh(n: int | None = None, axis_name: str = RAY_AXIS) -> Mesh:
    """Mesh over the first n local devices (defaults to all)."""
    devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.asarray(devices), (axis_name,))
