"""On-device (real TPU) validation of the fused Pallas render kernel:
compile via Mosaic, compare numerics vs the XLA path, and time both at the
production shape (1024 rays x 128 samples)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

CKPT = "/root/reference/ckpts/mvsnerf-v0.tar"

from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
from mvsnerf_tpu.models import init_mlp
from mvsnerf_tpu.ops.pallas_kernels import fused_render_v0, pack_v0_weights
from mvsnerf_tpu.render.renderer import run_network
from mvsnerf_tpu.ops.compositing import raw2outputs

print(jax.devices(), flush=True)

if os.path.exists(CKPT):
    mlp = load_reference_checkpoint(CKPT)["mlp"]
else:
    mlp = init_mlp(jax.random.PRNGKey(0), "v0")

rng = np.random.default_rng(21)
N, S = 1024, 128
xyz = jnp.asarray(rng.uniform(0, 1, (N, S, 3)).astype(np.float32))
feats = jnp.asarray(rng.standard_normal((N, S, 20)).astype(np.float32))
dirs = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
z_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (N, S))
packed = pack_v0_weights(mlp)


@jax.jit
def xla_path(mlp, xyz, dirs, feats, z_vals):
    raw = run_network(mlp, xyz, dirs, feats, net_type="v0")
    return raw2outputs(raw, z_vals)


def fused(packed, xyz, feats, dirs, z_vals, tile):
    return fused_render_v0(packed, xyz, feats, dirs, z_vals,
                           rays_per_tile=tile)


ref = xla_path(mlp, xyz, dirs, feats, z_vals)
jax.block_until_ready(ref)
print("XLA path OK", flush=True)

for tile in (64,):
    f = jax.jit(lambda *a: fused(*a, tile))
    t0 = time.perf_counter()
    out = f(packed, xyz, feats, dirs, z_vals)
    jax.block_until_ready(out)
    print(f"tile={tile}: compiled in {time.perf_counter()-t0:.1f}s",
          flush=True)
    for k, atol in (("rgb", 2e-4), ("depth", 2e-3), ("acc", 2e-4),
                    ("weights", 2e-4)):
        err = float(np.max(np.abs(np.asarray(out[k]) - np.asarray(ref[k]))))
        print(f"  {k:8s} max|err| = {err:.2e} (atol {atol})", flush=True)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(packed, xyz, feats, dirs, z_vals)
    jax.block_until_ready(out)
    print(f"  fused time: {(time.perf_counter()-t0)/iters*1e3:.3f} ms",
          flush=True)

iters = 50
t0 = time.perf_counter()
for _ in range(iters):
    ref = xla_path(mlp, xyz, dirs, feats, z_vals)
jax.block_until_ready(ref)
print(f"XLA path time: {(time.perf_counter()-t0)/iters*1e3:.3f} ms",
      flush=True)
