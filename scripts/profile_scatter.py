"""Compare volume-gradient scatter formulations on the TPU.

The fine-tuning step's cost is dominated by the backward of the trilinear
volume gather (8 corner scatter-adds into a 37M-voxel grid). This script
measures: (a) autodiff through grid_sample_3d, (b) a single flattened
scatter-add over 8N rows, (c) sort-by-index before the scatter.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

D, HP, WP, C = 128, 176, 208, 8
N = 1024 * 128  # samples per step

rng = np.random.default_rng(0)
volume = jnp.asarray(rng.standard_normal((D, HP, WP, C)).astype(np.float32))
ndc = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
cot = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms")
    return out


from mvsnerf_tpu.ops.interp import grid_sample_3d


def autodiff_grad(vol):
    f = lambda v: jnp.sum(grid_sample_3d(v, ndc * 2 - 1) * cot)
    return jax.grad(f)(vol)


g_ref = timeit("autodiff through grid_sample_3d", jax.jit(autodiff_grad),
               volume)


def corners_and_weights():
    x = (ndc[:, 0]) * (WP - 1)
    y = (ndc[:, 1]) * (HP - 1)
    z = (ndc[:, 2]) * (D - 1)
    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    fx, fy, fz = x - x0, y - y0, z - z0
    x0i, y0i, z0i = x0.astype(jnp.int32), y0.astype(jnp.int32), \
        z0.astype(jnp.int32)
    idxs, ws = [], []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = jnp.clip(x0i + dx, 0, WP - 1)
                yi = jnp.clip(y0i + dy, 0, HP - 1)
                zi = jnp.clip(z0i + dz, 0, D - 1)
                w = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                     * (fz if dz else 1 - fz))
                idxs.append((zi * HP + yi) * WP + xi)
                ws.append(w)
    return jnp.concatenate(idxs), jnp.concatenate(ws)


def flat_scatter(vol):
    lin, w = corners_and_weights()
    vals = jnp.tile(cot, (8, 1)) * w[:, None]
    flat = jnp.zeros((D * HP * WP, C), jnp.float32)
    return flat.at[lin].add(vals)


timeit("single flattened scatter (8N rows)", jax.jit(flat_scatter), volume)


def sorted_scatter(vol):
    lin, w = corners_and_weights()
    vals = jnp.tile(cot, (8, 1)) * w[:, None]
    order = jnp.argsort(lin)
    lin_s = lin[order]
    vals_s = vals[order]
    flat = jnp.zeros((D * HP * WP, C), jnp.float32)
    return flat.at[lin_s].add(vals_s, indices_are_sorted=True)


timeit("sorted scatter", jax.jit(sorted_scatter), volume)


def seg_sum(vol):
    lin, w = corners_and_weights()
    vals = jnp.tile(cot, (8, 1)) * w[:, None]
    return jax.ops.segment_sum(vals, lin, num_segments=D * HP * WP)


timeit("segment_sum", jax.jit(seg_sum), volume)
