"""On-device validation + timing of the fused v0 MLP train kernel
(ops/pallas_mlp.py) at the fine-tune shape (1024 x 128 samples, 86ch):

  * forward + param-grad + feats-grad numerics vs XLA autodiff at
    'highest' (the production XLA setting) for both kernel precisions
  * device-looped timing: fwd and fwd+bwd(params+feats) vs the XLA MLP
    at each MVSNERF_TPU_MLP_PRECISION level

Run: python scripts/validate_mlp_tpu.py
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
from mvsnerf_tpu.ops.pallas_mlp import (IN_CH, IN_FEAT, IN_PTS,  # noqa: E402
                                        mlp_v0_train)
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

import mvsnerf_tpu.models.nerf_mlp as nm  # noqa: E402
import mvsnerf_tpu.ops.precision as pr  # noqa: E402

N, S = 1024, 128
print(jax.devices(), flush=True)

rng = np.random.default_rng(0)
params = init_mlp(jax.random.PRNGKey(0), "v0")
x = jnp.asarray(rng.standard_normal((N, S, IN_CH)).astype(np.float32))
cot = jnp.asarray(rng.standard_normal((N, S, 4)).astype(np.float32))
jax.block_until_ready((x, cot))

FS = slice(IN_PTS, IN_PTS + IN_FEAT)


def ref_apply(p, xx):
    return mlp_apply(p, xx, "v0", IN_PTS, 3)


nm._MLP_PRECISION = pr._LEVELS["highest"]
ref = jax.jit(ref_apply)(params, x)
ref_gp, ref_gx = jax.jit(jax.grad(
    lambda p, xx: jnp.sum(ref_apply(p, xx) * cot), argnums=(0, 1)))(params, x)
jax.block_until_ready(ref)
out_scale = float(jnp.max(jnp.abs(ref)))
gx_scale = float(jnp.max(jnp.abs(ref_gx[..., FS])))

print("== numerics vs XLA highest ==", flush=True)
for prec in ("default", "high"):
    out = jax.jit(lambda p, xx, pr=prec: mlp_v0_train(p, xx, pr))(params, x)
    gp, gx = jax.jit(jax.grad(
        lambda p, xx, pr=prec: jnp.sum(mlp_v0_train(p, xx, pr) * cot),
        argnums=(0, 1)))(params, x)
    gmax = max(
        float(jnp.max(jnp.abs(a - b)))
        / max(float(jnp.max(jnp.abs(b))), 1e-6)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(ref_gp)))
    print(f"{prec:8s} fwd max|err| {float(jnp.max(jnp.abs(out - ref))):.3e}"
          f" (scale {out_scale:.2f})  param-grad max rel {gmax:.3e}  "
          f"feats-grad max|err| "
          f"{float(jnp.max(jnp.abs(gx[..., FS] - ref_gx[..., FS]))):.3e}"
          f" (scale {gx_scale:.2f})", flush=True)

print("== device-looped timing ==", flush=True)


def t(name, fn, *args):
    sec = device_time(jax.jit(fn), *args, iters=10, base_iters=2)
    print(f"{name:28s} {sec*1e3:8.3f} ms", flush=True)


for prec in ("default", "high"):
    t(f"kernel fwd [{prec}]",
      lambda p, xx, pr=prec: mlp_v0_train(p, xx, pr), params, x)
    t(f"kernel f+b [{prec}]",
      lambda p, xx, pr=prec: jax.grad(
          lambda q, yy: 0.5 * jnp.sum(mlp_v0_train(q, yy, pr) ** 2),
          argnums=(0, 1))(p, xx), params, x)

for lvl in ("highest", "default"):
    nm._MLP_PRECISION = pr._LEVELS[lvl]
    t(f"xla fwd [{lvl}]", lambda p, xx: ref_apply(p, xx), params, x)
    t(f"xla f+b [{lvl}]",
      lambda p, xx: jax.grad(
          lambda q, yy: 0.5 * jnp.sum(ref_apply(q, yy) ** 2),
          argnums=(0, 1))(p, xx), params, x)
