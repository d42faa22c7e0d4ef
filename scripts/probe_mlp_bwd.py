"""Probe the fine-tune MLP's backward cost (5.4 ms of the 21 ms step,
precision-independent => not MXU-pass-bound): is it the f32 activation
HBM traffic? A/B on device:

  * f32 XLA autodiff (production)            — baseline
  * bf16 activations between layers          — halves activation traffic
  * jax.checkpoint (recompute in bwd)        — trades reads for FLOPs
  * bf16 x_in input                          — halves the 100 MB input read

Run: python scripts/probe_mlp_bwd.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from mvsnerf_tpu.models import init_mlp, mlp_apply  # noqa: E402
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

N, S = 1024, 128
IN_PTS, IN_VIEWS, IN_FEAT = 63, 3, 20

rng = np.random.default_rng(0)
mlp = init_mlp(jax.random.PRNGKey(0), "v0")
x_in = jnp.asarray(rng.standard_normal(
    (N, S, IN_PTS + IN_FEAT + IN_VIEWS)).astype(np.float32))
jax.block_until_ready(x_in)


def t_ms(name, fn, *args):
    try:
        sec = device_time(jax.jit(fn), *args, iters=10, base_iters=2)
        print(f"{name:34s} {sec*1e3:8.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED: {e!r}"[:300], flush=True)


import mvsnerf_tpu.models.nerf_mlp as nm  # noqa: E402
import mvsnerf_tpu.ops.precision as pr  # noqa: E402

nm._MLP_PRECISION = pr._LEVELS["default"]


def loss(p, x):
    return 0.5 * jnp.sum(mlp_apply(p, x, "v0", IN_PTS, IN_VIEWS) ** 2)


t_ms("f32 autodiff (params)", lambda p: jax.grad(loss)(p, x_in), mlp)
t_ms("f32 autodiff (params+feats)",
     lambda p, x: jax.grad(loss, argnums=(0, 1))(p, x), mlp, x_in)

mlp_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), mlp)


def loss_bf16(p, x):
    out = mlp_apply(p, x.astype(jnp.bfloat16), "v0", IN_PTS, IN_VIEWS)
    return 0.5 * jnp.sum(out.astype(jnp.float32) ** 2)


t_ms("bf16 params+acts autodiff",
     lambda p: jax.grad(loss_bf16)(p, x_in), mlp_bf16)

t_ms("f32 remat autodiff",
     lambda p: jax.grad(lambda q: 0.5 * jnp.sum(jax.checkpoint(
         lambda r: mlp_apply(r, x_in, "v0", IN_PTS, IN_VIEWS))(q) ** 2))(p),
     mlp)

# how much of the backward is the dW contractions vs the dx chain:
# grads wrt x only (params closed over — dW never computed)
t_ms("f32 autodiff (x only)",
     lambda x: jax.grad(lambda y: loss(mlp, y))(x), x_in)
