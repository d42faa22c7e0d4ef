"""Experiment: CostRegNet fwd / fwd+bwd in f32 vs bf16 at DTU scale
(scan-chained timing; see scripts/ubench.py for why)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from mvsnerf_tpu.models import init_mvsnet
from mvsnerf_tpu.models.mvsnet import cost_reg_apply
from ubench import report

D, HP, WP = 128, 176, 208

rng = np.random.default_rng(0)
mvs = init_mvsnet(jax.random.PRNGKey(0))
p = mvs["cost_reg_2"]
x = jnp.asarray(rng.standard_normal((1, D, HP, WP, 41)).astype(np.float32))


def apply_dtype(p_, x_, dtype):
    if dtype is not None:
        p_ = jax.tree.map(lambda a: a.astype(dtype), p_)
        x_ = x_.astype(dtype)
    return cost_reg_apply(p_, x_).astype(jnp.float32)


def grad_fn(dtype):
    return jax.grad(
        lambda p_, x_: jnp.sum(apply_dtype(p_, x_, dtype) ** 2),
        argnums=(0, 1))


which = sys.argv[1:] or ["f32", "bf16"]
for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
    if name not in which:
        continue
    report(f"costreg fwd {name}",
           lambda p_, x_, d=dt: apply_dtype(p_, x_, d), (p, x),
           perturb_idx=0, iters=10)
    report(f"costreg fwd+bwd {name}", grad_fn(dt), (p, x),
           perturb_idx=0, iters=10)
