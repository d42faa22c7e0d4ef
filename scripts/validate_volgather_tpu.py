"""On-device (real TPU) validation + timing of the fused volume
gather/splat kernel (ops/pallas_volgather.py) at fine-tune-training shape
(volume 128 x 176 x 208 x 8 — DTU 640x512 pad 24; batch 1024 x 128):

  * numerics of fwd / grad-volume / grad-ndc vs the XLA banded path
    (ops/volume_grad.sample_volume_train) and vs grid_sample_3d autodiff
  * device-looped timing: fwd-only and fwd+bwd for
      - XLA banded (the production default, sample_volume_train)
      - pallas f32
      - pallas bf16 (MXU operands quantized; the one-hot factorization is
        compute-bound so the 4x MXU rate difference dominates)

Usage:
  python scripts/validate_volgather_tpu.py            # all
  python scripts/validate_volgather_tpu.py --quick    # timing only
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.ops.interp import grid_sample_3d
from mvsnerf_tpu.ops.pallas_volgather import sample_volume_pallas
from mvsnerf_tpu.ops.pallas_volgather2 import (sample_volume_sorted,
                                               sort_rays_by_y,
                                               volgather2_fits)
from mvsnerf_tpu.ops.volume_grad import sample_volume_train
from mvsnerf_tpu.utils.devtime import device_time
from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

ap = argparse.ArgumentParser()
ap.add_argument("--quick", action="store_true")
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--d", type=int, default=128)
ap.add_argument("--h", type=int, default=176)
ap.add_argument("--w", type=int, default=208)
ap.add_argument("--n", type=int, default=1024)
ap.add_argument("--s", type=int, default=128)
ap.add_argument("--band_k", type=int, default=4)
a = ap.parse_args()

if a.cpu:
    jax.config.update("jax_platforms", "cpu")
print(jax.devices(), flush=True)
D, H, W, C = a.d, a.h, a.w, 8
N, S, BK = a.n, a.s, a.band_k

rng = np.random.default_rng(0)
vol = jnp.asarray(rng.standard_normal((D, H, W, C)).astype(np.float32))

# training-structured ndc: per-ray stratified z, arbitrary xy (incl. OOB)
t = np.linspace(0, 1, S)
z = np.broadcast_to(t, (N, S)).copy()
mids = 0.5 * (z[:, 1:] + z[:, :-1])
upper = np.concatenate([mids, z[:, -1:]], -1)
lower = np.concatenate([z[:, :1], mids], -1)
z = lower + (upper - lower) * rng.uniform(size=z.shape)
xy = rng.uniform(-0.05, 1.05, (N, S, 2))
ndc = jnp.asarray(np.concatenate([xy, z[..., None]], -1).astype(np.float32))
cot = jnp.asarray(rng.standard_normal((N, S, C)).astype(np.float32))
jax.block_until_ready((vol, ndc, cot))

order, _ = sort_rays_by_y(ndc)
fits = bool(jax.jit(volgather2_fits, static_argnums=(1, 2, 3, 4))(
    jnp.take(ndc, order, axis=0), (D, H, W, C), BK, 48, 128))
print(f"v2 (z, y)-band contract fits at hb=48/nb=128: {fits}", flush=True)


def maxerr(x, y):
    return float(jnp.max(jnp.abs(x - y)))


VARIANTS = {
    "banded_f32": lambda v, n: sample_volume_train(v, n, BK),
    "pallas_f32": lambda v, n: sample_volume_pallas(v, n, BK, None,
                                                    jnp.float32),
    "pallas_bf16": lambda v, n: sample_volume_pallas(v, n, BK, None,
                                                     jnp.bfloat16),
    "v2_sorted": lambda v, n: sample_volume_sorted(v, n, BK, hb=48,
                                                   nb=128),
}

if not a.quick:
    # reference: gather forward + the BANDED backward (golden-tested vs
    # torch autodiff at small shape in tests/test_volume_grad.py) — the
    # XLA scatter autodiff reference stalls compilation at this shape.
    print("== numerics (vs gather fwd / banded bwd) ==", flush=True)
    ref_fwd = jax.jit(lambda v, n: grid_sample_3d(v, n * 2 - 1))(vol, ndc)
    ref_gv = jax.jit(jax.grad(
        lambda v: jnp.sum(sample_volume_train(v, ndc, BK) * cot)))(vol)
    ref_gn = jax.jit(jax.grad(
        lambda n: jnp.sum(sample_volume_train(vol, n, BK) * cot)))(ndc)
    scale_fwd = float(jnp.max(jnp.abs(ref_fwd)))
    scale_gv = float(jnp.max(jnp.abs(ref_gv)))
    for name, fn in VARIANTS.items():
        out = jax.jit(fn)(vol, ndc)
        gv = jax.jit(jax.grad(lambda v: jnp.sum(fn(v, ndc) * cot)))(vol)
        gn = jax.jit(jax.grad(lambda n: jnp.sum(fn(vol, n) * cot)))(ndc)
        print(f"{name:12s} fwd max|err| {maxerr(out, ref_fwd):.3e} "
              f"(scale {scale_fwd:.2f})  gvol {maxerr(gv, ref_gv):.3e} "
              f"(scale {scale_gv:.2f})  gndc {maxerr(gn, ref_gn):.3e}",
              flush=True)

print("== device-looped timing ==", flush=True)
for name, fn in VARIANTS.items():
    t0 = time.perf_counter()
    fwd_ms = device_time(jax.jit(fn), vol, ndc, iters=20, base_iters=2) * 1e3

    def fwdbwd(v, n):
        # loss = sum(out^2): the cotangent (= out) depends on the volume,
        # so the splat backward cannot be hoisted out of the timing loop
        # (with a CONSTANT cotangent, grad = splat(cot) is loop-invariant
        # and XLA hoists it — measured fwd+bwd == fwd).
        val, gv = jax.value_and_grad(
            lambda vv: 0.5 * jnp.sum(fn(vv, n) ** 2))(v)
        return val, gv

    fb_ms = device_time(jax.jit(fwdbwd), vol, ndc,
                        iters=20, base_iters=2) * 1e3
    print(f"{name:12s} fwd {fwd_ms:7.3f} ms   fwd+bwd(vol) {fb_ms:7.3f} ms"
          f"   (wall {time.perf_counter() - t0:.0f}s)", flush=True)
