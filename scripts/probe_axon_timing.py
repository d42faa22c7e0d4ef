"""Probe axon dispatch/transfer overhead + the dband window-DMA lane rule.

1) per-call overhead of a tiny jitted op (Python loop)
2) per-call time of a 37MB-in/37MB-out identity (transfer cost?)
3) device-looped timing: lax.fori_loop repeating an op N times inside ONE
   executable -> wall/N is the true device time, immune to dispatch cost
4) window-DMA from HBM with W=208 (not 128-mult) vs W=256: which compiles?
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()
print(jax.devices(), flush=True)


def wall(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]))
    return (time.perf_counter() - t0) / iters


# 1) tiny op
x1 = jnp.ones((8, 128))
t = wall(jax.jit(lambda x: x + 1.0), x1, iters=20)
print(f"tiny op per call:          {t*1e3:9.2f} ms", flush=True)

# 2) big identity (37 MB)
xb = jnp.ones((128, 176, 208, 5), jnp.float32)
t = wall(jax.jit(lambda x: x * 1.000001), xb, iters=5)
print(f"37MB elementwise per call: {t*1e3:9.2f} ms", flush=True)

# 3) device-looped matmul: 1024x1024x1024 f32, 50 reps in one executable
a = jnp.ones((1024, 1024), jnp.float32)


def body(i, acc):
    return jnp.tanh(acc @ a)


@jax.jit
def loop(acc):
    return jax.lax.fori_loop(0, 50, body, acc)


t0 = time.perf_counter()
r = loop(a)
_ = float(r[0, 0])
print(f"matmul x50 compile+run:    {time.perf_counter()-t0:9.2f} s",
      flush=True)
t0 = time.perf_counter()
r = loop(a)
_ = float(r[0, 0])
dt = time.perf_counter() - t0
print(f"matmul device-loop:        {dt/50*1e3:9.3f} ms/iter "
      f"({2*1024**3*50/dt/1e12:.2f} TF/s)", flush=True)

# same matmul via Python loop for per-call overhead comparison
f = jax.jit(lambda x: jnp.tanh(x @ a))
t = wall(f, a, iters=10)
print(f"matmul python-loop:        {t*1e3:9.3f} ms/iter", flush=True)

# 4) window DMA lane rule
def probe_window(W):
    Cin, D2 = 8, 16
    H2 = 24

    def kern(hbm, out, buf, sem):
        dma = pltpu.make_async_copy(
            hbm.at[:, pl.ds(0, 4), pl.ds(8, 16), :], buf, sem)
        dma.start()
        dma.wait()
        out[:] = buf[:, :, :8, :]

    xx = jnp.ones((Cin, D2, H2, W), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Cin, 4, 8, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Cin, 4, 16, W), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(xx)


for W in (208, 256, 64, 128):
    try:
        out = probe_window(W)
        _ = float(jnp.sum(out))
        print(f"window DMA W={W:4d}:          OK", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:140]
        print(f"window DMA W={W:4d}:          FAIL {msg}", flush=True)
