"""Sharding strategies: ray-parallel rendering and data-parallel training.

The TPU-native replacement for the reference's (dead) PL-DDP hook
(train_mvs_nerf_pl.py:313; SURVEY.md §5.8): parameters and the encoding
volume are replicated (total < 2 MB + ~50 MB volume), the ray axis is sharded
across chips via shard_map with zero cross-chip communication during
rendering, and gradients are psum-ed over the mesh for training.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from .mesh import RAY_AXIS


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_rays_render(render_fn, mesh: Mesh, n_ray_args: int,
                      axis_name: str = RAY_AXIS):
    """Wrap a per-ray render function so the leading ray axis of its first
    `n_ray_args` arguments is sharded across the mesh; remaining args
    (params, volume, images, cameras) are replicated.

    Rendering is embarrassingly parallel over rays — no collectives are
    needed; the final image gather happens when the caller devices_get the
    output. Ray count must be divisible by mesh size (pad upstream).
    """
    def wrapped(*args):
        ray_args = args[:n_ray_args]
        rest = args[n_ray_args:]
        in_specs = tuple([P(axis_name)] * n_ray_args + [P()] * len(rest))
        out_specs = P(axis_name)

        fn = lambda *a: render_fn(*a)
        sharded = shard_map(fn, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)
        return sharded(*ray_args, *rest)

    return jax.jit(wrapped)


def data_parallel_step(loss_fn, optimizer, mesh: Mesh,
                      axis_name=RAY_AXIS):
    """Build a jitted DP train step: the ray batch is sharded over the mesh,
    per-shard grads are psum-averaged (ICI within a rays-group, DCN across
    the data axis on a 2-D multi-host mesh), params/opt-state replicated.

    Args:
        loss_fn: fn(params, batch, key) -> scalar loss (per-shard mean).
        optimizer: an optax GradientTransformation.
        axis_name: one mesh axis name, or a tuple of axis names (e.g.
            ("data", "rays") for a make_mesh_2d multi-host mesh) — the
            batch's leading axis is sharded over all of them.

    Returns:
        step(params, opt_state, batch, key) -> (params, opt_state, loss)
    """
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    batch_spec = P(axes if len(axes) > 1 else axes[0])

    def sharded_grads(params, batch, key):
        # distinct jitter per shard; rays are already disjoint. Flat shard
        # index over all sharded axes (static mesh sizes).
        idx = 0
        for ax in axes:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        key = jax.random.fold_in(key, idx)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        loss = jax.lax.pmean(loss, axes)
        grads = jax.lax.pmean(grads, axes)
        return loss, grads

    def step(params, opt_state, batch, key):
        fn = shard_map(
            sharded_grads, mesh=mesh,
            in_specs=(P(), jax.tree.map(lambda _: batch_spec, batch), P()),
            out_specs=(P(), P()), check_vma=False,
        )
        loss, grads = fn(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)
