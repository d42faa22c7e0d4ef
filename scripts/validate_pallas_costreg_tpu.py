"""On-device (real TPU) validation + timing of the depth-band U-Net
kernels (ops/pallas_costreg.py) at generalizable-training shape
(cost volume 41 x 128 x 176 x 208 — DTU 640x512, pad 24):

  * numerics of the full dband U-Net (fwd and grads) vs the packed path
  * per-layer conv0 fwd / dgrad / wgrad timing vs the packed-conv cost
  * full U-Net fwd and fwd+bwd timing: dband (f32 / bf16) vs packed

Usage:
  python scripts/validate_pallas_costreg_tpu.py            # all
  python scripts/validate_pallas_costreg_tpu.py --quick    # skip per-layer
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.models import init_mvsnet
from mvsnerf_tpu.models.costreg_packed import cost_reg_packed_apply
from mvsnerf_tpu.ops import pallas_costreg as pc
from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

ap = argparse.ArgumentParser()
ap.add_argument("--quick", action="store_true")
ap.add_argument("--cpu", action="store_true",
                help="force the CPU backend (interpret-mode smoke; the "
                     "JAX_PLATFORMS env var is pinned by sitecustomize "
                     "and cannot override)")
ap.add_argument("--d", type=int, default=128)
ap.add_argument("--h", type=int, default=176)
ap.add_argument("--w", type=int, default=208)
a = ap.parse_args()

if a.cpu:
    jax.config.update("jax_platforms", "cpu")
print(jax.devices(), flush=True)
D, H, W, CIN = a.d, a.h, a.w, 41

rng = np.random.default_rng(0)
params = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]
x_cl = jnp.asarray(rng.standard_normal((1, D, H, W, CIN)).astype(np.float32))
x_cm = jnp.transpose(x_cl[0], (3, 0, 1, 2))
jax.block_until_ready(x_cm)


def timeit(name, fn, *args, iters=5):
    from mvsnerf_tpu.utils.devtime import device_time
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} compile+run {time.perf_counter()-t0:6.1f} s",
          flush=True)
    # device-looped: per-dispatch overhead through the axon tunnel is
    # 100 ms - 9 s (probe_axon_timing.py), so Python-loop timing here
    # measured the tunnel, not the chip
    dt = device_time(fn, *args, iters=iters)
    print(f"{name:42s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


# ---- full U-Net forward ---------------------------------------------------
ref, t_packed = timeit(
    "packed U-Net fwd",
    jax.jit(lambda p, x: cost_reg_packed_apply(p, x)[0]), params, x_cl)

out, t_db = timeit(
    "dband U-Net fwd (f32)",
    jax.jit(lambda p, x: pc.cost_reg_dband_apply(p, x)), params, x_cm)
err = float(jnp.max(jnp.abs(out - ref)))
print(f"dband vs packed fwd max|err|: {err:.2e}", flush=True)

# dband bf16 is a hard NotImplementedError (validated dead end: Mosaic
# VMEM slice rules reject the bf16 window DMAs; f32 already lost the A/B)
try:
    _ = timeit(
        "dband U-Net fwd (bf16)",
        jax.jit(lambda p, x: pc.cost_reg_dband_apply(p, x,
                                                     dtype=jnp.bfloat16)),
        params, x_cm)
except NotImplementedError as e:
    print(f"dband U-Net fwd (bf16): hard-errored as documented: {e}",
          flush=True)

# ---- full U-Net fwd+bwd ---------------------------------------------------


def loss_packed(p, x):
    y = cost_reg_packed_apply(p, x)
    return jnp.sum(y ** 2)


def loss_db(p, x, dtype=None):
    y = pc.cost_reg_dband_apply(p, x, dtype=dtype)
    return jnp.sum(y ** 2)


g_ref, _ = timeit("packed U-Net fwd+bwd",
                  jax.jit(jax.grad(loss_packed, argnums=(0, 1))),
                  params, x_cl)
g_db, _ = timeit("dband U-Net fwd+bwd (f32)",
                 jax.jit(jax.grad(loss_db, argnums=(0, 1))), params, x_cm)
try:
    _ = timeit("dband U-Net fwd+bwd (bf16)",
               jax.jit(jax.grad(lambda p, x: loss_db(p, x, jnp.bfloat16),
                                argnums=(0, 1))), params, x_cm)
except NotImplementedError as e:
    print(f"dband U-Net fwd+bwd (bf16): hard-errored as documented: {e}",
          flush=True)

for u, v in zip(jax.tree.leaves(g_ref[0]), jax.tree.leaves(g_db[0])):
    s = max(1e-6, float(jnp.max(jnp.abs(u))))
    e = float(jnp.max(jnp.abs(u / s - v / s)))
    if e > 5e-3:
        print(f"param-grad rel err {e:.2e} on leaf {u.shape}", flush=True)
print("param grads checked", flush=True)

if a.quick:
    sys.exit(0)

# ---- per-layer conv0 ------------------------------------------------------
k0 = params["conv0"]["conv"]["kernel"]

_ = timeit("conv0 dband fwd (s1 41->8, full res)",
           jax.jit(lambda x, k: pc.conv3d_s1(x, k)), x_cm, k0)
_ = timeit("conv0 dband fwd+bwd",
           jax.jit(jax.grad(
               lambda x, k: jnp.sum(pc.conv3d_s1(x, k) ** 2),
               argnums=(0, 1))), x_cm, k0)

# packed conv0 alone for comparison (pack + one packed conv + unpack)
from mvsnerf_tpu.models.costreg_packed import (_conv_packed, _pack_kernel,
                                               pack_volume, unpack_volume)


def packed_conv0(x, k):
    kp = _pack_kernel(k, "s1", 16, 16)
    return unpack_volume(_conv_packed(kp, pack_volume(x, 16), "s1"), 16)


_ = timeit("conv0 packed fwd",
           jax.jit(lambda x, k: packed_conv0(x, k)), x_cl, k0)
_ = timeit("conv0 packed fwd+bwd",
           jax.jit(jax.grad(
               lambda x, k: jnp.sum(packed_conv0(x, k) ** 2),
               argnums=(0, 1))), x_cl, k0)
