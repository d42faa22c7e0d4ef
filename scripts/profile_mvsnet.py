"""Component profile of the MVSNet volume build at DTU scale, with warp
tuning variants."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.models import (cost_reg_apply, feature_net_apply,
                                init_mvsnet)
from mvsnerf_tpu.ops.homography import build_cost_volume

H, W, PAD, D = 512, 640, 24, 128
h, w = H // 4, W // 4

rng = np.random.default_rng(0)
mvs = init_mvsnet(jax.random.PRNGKey(0))
imgs = jnp.asarray(rng.uniform(-1, 1, (3, H, W, 3)).astype(np.float32))
feats = jnp.asarray(rng.standard_normal((3, h, w, 32)).astype(np.float32))
intr_s4 = np.array([[180.0, 0, w / 2], [0, 180.0, h / 2], [0, 0, 1]],
                   np.float32)
projs = []
ref4 = np.eye(4, dtype=np.float32)
ref4[:3] = intr_s4 @ np.eye(4)[:3]
ref_inv = np.linalg.inv(ref4)
for i in range(3):
    a = 0.04 * (i - 1)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    p = np.eye(4, dtype=np.float32)
    p[:3] = intr_s4 @ w2c[:3]
    projs.append((p @ ref_inv)[:3])
projs = jnp.asarray(np.stack(projs))
depths = jnp.linspace(2.125, 4.525, D)
cost_in = jnp.asarray(
    rng.standard_normal((1, D, h + 2 * PAD, w + 2 * PAD, 41))
    .astype(np.float32))


def timeit(name, fn, *args, iters=10):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:44s} FAIL {type(e).__name__}: {str(e)[:80]}",
              flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / iters * 1e3:9.2f} ms",
          flush=True)


timeit("featurenet fwd (3 views)",
       jax.jit(lambda p, im: feature_net_apply(p, im)), mvs["feature"], imgs)
timeit("cost volume fwd (fast warp)",
       jax.jit(lambda im, f, pm: build_cost_volume(im, f, pm, depths,
                                                   pad=PAD)[0]),
       imgs, feats, projs)
timeit("cost volume fwd (gather warp)",
       jax.jit(lambda im, f, pm: build_cost_volume(im, f, pm, depths,
                                                   pad=PAD,
                                                   fast_warp=False)[0]),
       imgs, feats, projs)
timeit("costreg fwd",
       jax.jit(lambda p, c: cost_reg_apply(p, c)), mvs["cost_reg_2"],
       cost_in)

# tuning sweep
for rb, band, dt in [(32, 16, jnp.float32), (32, 16, jnp.bfloat16),
                     (64, 16, jnp.bfloat16), (32, 32, jnp.bfloat16)]:
    timeit(f"cost volume fast rb={rb} band={band} "
           f"{jnp.dtype(dt).name}",
           jax.jit(lambda im, f, pm, rb=rb, band=band, dt=dt:
                   build_cost_volume(im, f, pm, depths, pad=PAD,
                                     warp_row_block=rb, warp_band=band,
                                     warp_dtype=dt)[0]),
           imgs, feats, projs)

for pb in [32, 64, 128]:
    timeit(f"cost volume fast plane_block={pb}",
           jax.jit(lambda im, f, pm, pb=pb:
                   build_cost_volume(im, f, pm, depths, pad=PAD,
                                     plane_block=pb, warp_row_block=32,
                                     warp_band=16)[0]),
           imgs, feats, projs)

timeit("cost volume fast (packed fwd)",
       jax.jit(lambda im, f, pm: build_cost_volume(
           im, f, pm, depths, pad=PAD, warp_fwd_mode="packed")[0]),
       imgs, feats, projs)
