"""Decompose the 230 ms cost-volume forward: warp alone, grid+mask alone,
variance assembly alone."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.ops.homography import plane_sweep_grid, in_bounds_mask
from mvsnerf_tpu.ops.warp_fast import bilinear_warp_banded

H, W, PAD, D = 512, 640, 24, 128
h, w = H // 4, W // 4
hp, wp = h + 2 * PAD, w + 2 * PAD

rng = np.random.default_rng(0)
feat = jnp.asarray(rng.standard_normal((h, w, 35)).astype(np.float32))
intr_s4 = np.array([[180.0, 0, w / 2], [0, 180.0, h / 2], [0, 0, 1]],
                   np.float32)
a = 0.04
R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
              [-np.sin(a), 0, np.cos(a)]], np.float32)
w2c = np.eye(4, dtype=np.float32)
w2c[:3, :3] = R
ref4 = np.eye(4, dtype=np.float32)
ref4[:3] = intr_s4 @ np.eye(4)[:3]
p4 = np.eye(4, dtype=np.float32)
p4[:3] = intr_s4 @ w2c[:3]
proj = jnp.asarray((p4 @ np.linalg.inv(ref4))[:3])
depths = jnp.linspace(2.125, 4.525, D)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / iters * 1e3:9.2f} ms",
          flush=True)


grid = jax.jit(lambda pm: plane_sweep_grid(pm, depths, h, w, PAD))(proj)
jax.block_until_ready(grid)

timeit("grid build (1 view, 128 planes)",
       jax.jit(lambda pm: plane_sweep_grid(pm, depths, h, w, PAD)), proj)
timeit("in_bounds_mask", jax.jit(in_bounds_mask), grid)
timeit("banded warp (1 view, 128 planes)",
       jax.jit(lambda f, g: bilinear_warp_banded(f, g, 32, 16)), feat, grid)

wfeat = jax.jit(lambda f, g: bilinear_warp_banded(f, g, 32, 16))(feat, grid)
jax.block_until_ready(wfeat)
ref_feat = jnp.asarray(rng.standard_normal((hp, wp, 35)).astype(np.float32))


def variance(a_, b_, m_):
    s = ref_feat[None] + a_ + b_
    sq = (ref_feat ** 2)[None] + a_ ** 2 + b_ ** 2
    count = 1.0 / (1.0 + m_ + m_)[..., None]
    return sq * count - (s * count) ** 2


timeit("variance assembly (f32 full size)",
       jax.jit(variance), wfeat, wfeat, jax.jit(in_bounds_mask)(grid))
