"""Per-layer fwd/bwd cost of the packed U-Net at DTU scale."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from mvsnerf_tpu.models import init_mvsnet
from mvsnerf_tpu.models.costreg_packed import (_layers, _pack_kernel,
                                               _conv_packed, _abn_packed)

D, HP, WP = 128, 176, 208
rng = np.random.default_rng(0)
mvs = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]


def _force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)


p0 = 16
# simpler: track packed dims directly
dims = (1, D // p0, HP, WP, p0 * 41)
cin = 41
for name, kind, cout, p_in, p_out in _layers(p0):
    x = jnp.asarray(rng.standard_normal(dims).astype(np.float32))
    params = mvs[name]
    kernel = params["conv"]["kernel"] if "conv" in params \
        else params["deconv"]["kernel"]

    def fwd(k, x, kind=kind, p_in=p_in, p_out=p_out, params=params):
        kp = _pack_kernel(k, kind, p_in, p_out)
        y = _conv_packed(kp, x, kind)
        return _abn_packed(params["bn"], y, p_out, False, None)

    def loss(k, x, fwd=fwd):
        return jnp.sum(fwd(k, x) ** 2)

    y = jax.jit(fwd)(kernel, x)
    timeit(f"{name} {kind} {dims} fwd", jax.jit(fwd), kernel, x)
    timeit(f"{name} {kind} fwd+dgrad+wgrad",
           jax.jit(jax.grad(loss, argnums=(0, 1))), kernel, x)
    dims = y.shape
    cin = cout
