"""Measure FeatureNet fwd and fwd+bwd, f32 vs bf16 activations (TPU).

The 8/16/32-channel activations are lane-padded up to 16x by XLA, so the
net is HBM-bound; bf16 should roughly halve that traffic.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from mvsnerf_tpu.models.mvsnet import feature_net_apply, init_feature_net

H, W, V = 512, 640, 3
rng = np.random.default_rng(0)
params = init_feature_net(jax.random.PRNGKey(0))
imgs = jnp.asarray(rng.uniform(-1, 1, (V, H, W, 3)).astype(np.float32))


def force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)


for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
    fwd = jax.jit(lambda p, im, d=dtype: feature_net_apply(p, im, dtype=d))
    timeit(f"featurenet fwd {tag}", fwd, params, imgs)

    bwd = jax.jit(jax.grad(
        lambda p, im, d=dtype: jnp.sum(feature_net_apply(p, im, dtype=d) ** 2)))
    timeit(f"featurenet fwd+bwd {tag}", bwd, params, imgs)

# numeric delta
a = jax.jit(lambda p, im: feature_net_apply(p, im))(params, imgs)
b = jax.jit(lambda p, im: feature_net_apply(p, im, dtype=jnp.bfloat16))(
    params, imgs)
err = jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-8)
print(f"rel max err bf16 vs f32: {float(err):.4e}", flush=True)
