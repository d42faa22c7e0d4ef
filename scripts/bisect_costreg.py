"""Isolate the CostRegNet backward at DTU scale. All tensors passed as
arguments (closure constants embed multi-100MB literals in the HLO and the
remote compile service rejects the request body)."""

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.models import cost_reg_apply, init_mvsnet

rng = np.random.default_rng(0)
params = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]


def attempt(name, d, hp, wp):
    cost = jnp.asarray(
        rng.standard_normal((1, d, hp, wp, 41)).astype(np.float32))
    try:
        g = jax.jit(jax.grad(
            lambda p, c: jnp.sum(cost_reg_apply(p, c) ** 2)))(params, cost)
        jax.block_until_ready(g)
        print(f"{name:40s} OK", flush=True)
        return True
    except Exception as e:
        print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:90]}",
              flush=True)
        return False


attempt("costreg bwd 128x176x208 (cost as arg)", 128, 176, 208)
