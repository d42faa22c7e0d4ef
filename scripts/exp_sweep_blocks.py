"""Experiment: fused-sweep kernel time vs (row_block, band) at DTU scale
with synthetic near-identity geometry (band contract always satisfied), to
separate per-block overhead from matmul/VPU cost.

rb=8/band=16 is the production configuration; if time drops sharply with
bigger rb at FIXED band, per-block overhead dominates and fatter blocks
(multi-plane grouping) are the lever."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from mvsnerf_tpu.ops.pallas_sweep import (cost_volume_fused_pallas, _Static)

D, HP, WP = 128, 176, 208
h, w = 128, 160
C, CI = 32, 3
CP = 40                       # (C + CI) padded to 8
CC = 48                       # (CI*3 + C) padded to 8
N = D * HP * WP

rng = np.random.default_rng(0)
srcs_cw = jnp.asarray(
    rng.standard_normal((2, h, CP, w)).astype(np.float32))

# near-identity coords: y wanders < 3 rows inside any block
yy, xx = np.mgrid[0:HP, 0:WP].astype(np.float32)
base_x = (xx - 24) + rng.uniform(-1, 1)
base_y = (yy - 24) + rng.uniform(-1, 1)
xs_all, ys_all = [], []
for v in range(2):
    per_plane_shift = np.linspace(0, 20, D).astype(np.float32)  # disparity
    xs = (base_x[None] + per_plane_shift[:, None, None]).reshape(1, -1)
    ys = np.broadcast_to(base_y[None], (D, HP, WP)).reshape(1, -1)
    xs_all.append(xs)
    ys_all.append(ys)
xs = jnp.asarray(np.stack(xs_all))
ys = jnp.asarray(np.stack(ys_all))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))   # force real completion
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)


for rb, band in [(8, 16), (16, 16), (44, 16)]:
    if HP % rb or (rb * WP) % 128:
        print(f"rb={rb} illegal")
        continue
    m = rb * WP
    bpp = HP // rb
    refb = jnp.asarray(
        rng.standard_normal((bpp, CP, m)).astype(np.float32))
    static = _Static(band=band, m=m, bpp=bpp, c_feat=C, c_img=CI, cc=CC)

    def fwd(srcs_cw, refb, xs, ys, static=static):
        return cost_volume_fused_pallas(srcs_cw, refb, xs, ys, static)

    def loss(srcs_cw, refb, xs, ys, static=static):
        return jnp.sum(fwd(srcs_cw, refb, xs, ys, static) ** 2)

    try:
        timeit(f"fwd      rb={rb:3d} band={band}", jax.jit(fwd),
               srcs_cw, refb, xs, ys)
        timeit(f"fwd+bwd  rb={rb:3d} band={band}",
               jax.jit(jax.grad(loss, argnums=(0, 1))),
               srcs_cw, refb, xs, ys)
    except Exception as e:
        print(f"rb={rb} band={band} failed: {type(e).__name__} "
              f"{str(e)[:200]}")
