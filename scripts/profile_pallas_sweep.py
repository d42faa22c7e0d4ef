"""Compare plane-sweep warp implementations on the real TPU at DTU shapes:
packed gather (current default), banded matmul, and the fused Pallas kernel
— forward and forward+backward, plus the full cost volume in each mode."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.ops.homography import build_cost_volume, plane_sweep_grid
from mvsnerf_tpu.ops.pallas_sweep import (bilinear_warp_pallas,
                                          sweep_fits_band, _pick_row_block)
from mvsnerf_tpu.ops.warp_fast import bilinear_warp_banded

H, W, PAD, D, V = 512, 640, 24, 128, 3
h, w = H // 4, W // 4
hp, wp = h + 2 * PAD, w + 2 * PAD

rng = np.random.default_rng(0)
feat = jnp.asarray(rng.standard_normal((h, w, 35)).astype(np.float32))
feats = jnp.asarray(rng.standard_normal((V, h, w, 32)).astype(np.float32))
imgs = jnp.asarray(rng.uniform(-1, 1, (V, H, W, 3)).astype(np.float32))

intr_s4 = np.array([[180.0, 0, w / 2], [0, 180.0, h / 2], [0, 0, 1]],
                   np.float32)
ref4 = np.eye(4, dtype=np.float32)
ref4[:3] = intr_s4 @ np.eye(4)[:3]
ref_inv = np.linalg.inv(ref4)
projs = []
for i in range(V):
    a = 0.04 * (i - 1)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = [0.3 * (i - 1), 0.01, 0]
    p4 = np.eye(4, dtype=np.float32)
    p4[:3] = intr_s4 @ w2c[:3]
    projs.append((p4 @ ref_inv)[:3])
projs = jnp.asarray(np.stack(projs))
depths = jnp.linspace(2.125, 4.525, D)
grid = jax.jit(lambda p: plane_sweep_grid(p, depths, h, w, PAD))(projs[2])
jax.block_until_ready(grid)
rb = _pick_row_block(hp)
print(f"row_block={rb} hp={hp} fits="
      f"{bool(sweep_fits_band(grid, h, rb, 32))}", flush=True)


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter() - t0) / iters * 1e3:9.2f} ms",
          flush=True)
    return out


# ---- single-view warp: fwd
f_pal = jax.jit(lambda f, g: bilinear_warp_pallas(f, g, rb, 32))
f_pak = jax.jit(lambda f, g: bilinear_warp_banded(f, g, 16, 32,
                                                  jnp.float32, False,
                                                  "packed"))
out_pal = timeit("pallas warp fwd (1 view, 128 planes)", f_pal, feat, grid)
out_pak = timeit("packed warp fwd", f_pak, feat, grid)
err = float(jnp.max(jnp.abs(out_pal - out_pak)))
print(f"  fwd max |pallas - packed| = {err:.2e}", flush=True)

# ---- single-view warp: fwd+bwd
g_ct = jnp.asarray(rng.standard_normal(out_pal.shape).astype(np.float32))


def vjp_of(warp):
    def run(f, g, ct):
        out, vjp = jax.vjp(lambda ff: warp(ff, g), f)
        return vjp(ct)[0]
    return jax.jit(run)


gv_pal = timeit("pallas warp fwd+bwd", vjp_of(lambda f, g:
                bilinear_warp_pallas(f, g, rb, 32)), feat, grid, g_ct)
gv_pak = timeit("packed/banded warp fwd+bwd", vjp_of(lambda f, g:
                bilinear_warp_banded(f, g, 16, 32, jnp.float32, False,
                                     "packed")), feat, grid, g_ct)
err = float(jnp.max(jnp.abs(gv_pal - gv_pak)))
rel = err / float(jnp.max(jnp.abs(gv_pak)))
print(f"  bwd grad max err = {err:.2e} (rel {rel:.2e})", flush=True)

# ---- full cost volume: fwd and fwd+bwd per mode
for mode in ("packed", "pallas"):
    cv = jax.jit(lambda fs: build_cost_volume(
        imgs, fs, projs, depths, pad=PAD, warp_fwd_mode=mode)[0])
    timeit(f"cost volume fwd [{mode}]", cv, feats)

    cvb = jax.jit(lambda fs: jax.grad(
        lambda f: jnp.sum(build_cost_volume(
            imgs, f, projs, depths, pad=PAD,
            warp_fwd_mode=mode)[0] ** 2))(fs))
    timeit(f"cost volume fwd+bwd [{mode}]", cvb, feats)
