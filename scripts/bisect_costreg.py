"""Isolate the CostRegNet backward failure at DTU scale, trying smaller
sizes and remat."""

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.models import cost_reg_apply, init_mvsnet

rng = np.random.default_rng(0)
params = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]


def attempt(name, d, hp, wp, remat=False):
    cost = jnp.asarray(
        rng.standard_normal((1, d, hp, wp, 41)).astype(np.float32))
    fn = cost_reg_apply
    if remat:
        fn = jax.checkpoint(cost_reg_apply)
    try:
        g = jax.jit(jax.grad(
            lambda p: jnp.sum(fn(p, cost) ** 2)))(params)
        jax.block_until_ready(g)
        print(f"{name:40s} OK", flush=True)
        return True
    except Exception as e:
        print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return False


attempt("costreg bwd 64x88x104", 64, 88, 104)
attempt("costreg bwd 128x176x208", 128, 176, 208)
attempt("costreg bwd 128x176x208 remat", 128, 176, 208, remat=True)
