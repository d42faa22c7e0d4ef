"""Device-mesh construction and multi-host initialization.

The workload's scale axis is rays x samples (SURVEY.md §2.8): no tensor or
pipeline parallelism is needed (the whole model is < 2 MB), so meshes are
1-D over rays for single-host work and 2-D (data x rays) for multi-host
deployments — the `data` axis is outermost so per-slice gradient psum rides
ICI and only the cross-slice reduction crosses DCN. The reference's only
distributed hook is the dead PL-DDP branch (train_mvs_nerf_pl.py:313);
gradient-allreduce data parallelism is its semantic requirement.

Multi-host launch recipe (one process per host):

    JAX_COORDINATOR_ADDRESS=host0:8476 JAX_NUM_PROCESSES=4 \
    JAX_PROCESS_ID=$i python train_mvs_nerf.py ... --num_devices all

    # in code:
    from mvsnerf_tpu.parallel import init_distributed, make_mesh_2d
    init_distributed()            # no-op when single-process
    mesh = make_mesh_2d()         # data = n_processes, rays = local chips

Each process feeds its own shard of the ray batch (process_index() selects
it); `data_parallel_step(..., axis_name=mesh.axis_names)` pmean-s gradients
over both axes.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


RAY_AXIS = "rays"
DATA_AXIS = "data"

_distributed_initialized = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed for multi-host (DCN) deployments.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are omitted. A no-op (returns False) when neither arguments
    nor env vars request a multi-process setup, so single-host entry points
    can call it unconditionally. Safe to call twice.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    coordinator_address = coordinator_address or \
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _distributed_initialized = True
    return True


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


def make_mesh_2d(n_data: int | None = None, devices=None,
                 axis_names: tuple[str, str] = (DATA_AXIS, RAY_AXIS)) -> Mesh:
    """2-D (data x rays) mesh: `data` outermost (crosses DCN between
    processes), `rays` innermost (ICI within a host/slice).

    n_data defaults to jax.process_count(), so in a multi-host launch each
    process's local chips form one rays-group and gradient psum within a
    group stays on ICI. On a single host pass n_data explicitly (tests use
    2 x 4 over the virtual 8-CPU mesh).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = max(jax.process_count(), 1)
    if n % n_data:
        raise ValueError(f"{n} devices not divisible by data axis {n_data}")
    grid = np.asarray(devices).reshape(n_data, n // n_data)
    return Mesh(grid, axis_names)
