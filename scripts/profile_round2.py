"""Round-2 perf decomposition: fused sweep fwd/bwd and packed U-Net
fwd/dgrad/wgrad at DTU scale on the real TPU."""

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
from mvsnerf_tpu.models.mvsnet import depth_plane_values
from mvsnerf_tpu.models.costreg_packed import cost_reg_packed_apply, \
    pack_volume
from mvsnerf_tpu.ops.homography import build_cost_volume

H, W, PAD, D = 512, 640, 24, 128
h, w = H // 4, W // 4
HP, WP = h + 2 * PAD, w + 2 * PAD

rng = np.random.default_rng(0)
mvs = init_mvsnet(jax.random.PRNGKey(0))
imgs = jnp.asarray(rng.uniform(-1, 1, (3, H, W, 3)).astype(np.float32))
feats = jnp.asarray(rng.standard_normal((3, h, w, 32)).astype(np.float32))
intr_s4 = np.array([[180.0, 0, w / 2], [0, 180.0, h / 2], [0, 0, 1]],
                   np.float32)
projs = []
ref4 = np.eye(4, dtype=np.float32)
ref4[:3] = intr_s4 @ np.eye(4)[:3]
ref_inv = np.linalg.inv(ref4)
for i in range(3):
    a = 0.04 * (i - 1)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    p = np.eye(4, dtype=np.float32)
    p[:3] = intr_s4 @ w2c[:3]
    projs.append((p @ ref_inv)[:3])
projs = jnp.asarray(np.stack(projs))
depth_values = depth_plane_values(2.125, 4.525, D)


def _force(out):
    # axon block_until_ready can return before execution completes;
    # summing one leaf forces a real device round-trip.
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt * 1e3:9.2f} ms", flush=True)
    return out


# ---- fused sweep ----------------------------------------------------------

def sweep_fwd(feats):
    cost, _, _ = build_cost_volume(imgs, feats, projs, depth_values,
                                   pad=PAD, warp_fwd_mode="pallas",
                                   cost_layout="packed16")
    return cost


def sweep_loss(feats):
    return jnp.sum(sweep_fwd(feats) ** 2)


timeit("sweep fwd (packed16 out)", jax.jit(sweep_fwd), feats)
timeit("sweep fwd+bwd", jax.jit(jax.grad(sweep_loss)), feats)

# ---- packed U-Net ---------------------------------------------------------

cost_p = jnp.asarray(
    rng.standard_normal((1, D // 16, HP, WP, 16 * 41)).astype(np.float32))


def unet_fwd(p, x):
    return cost_reg_packed_apply(p, x, packed_input=True)


def unet_loss(p, x):
    return jnp.sum(unet_fwd(p, x) ** 2)


timeit("packed U-Net fwd", jax.jit(unet_fwd), mvs["cost_reg_2"], cost_p)
timeit("packed U-Net fwd+dgrad+wgrad",
       jax.jit(jax.grad(unet_loss, argnums=(0, 1))), mvs["cost_reg_2"],
       cost_p)
timeit("packed U-Net fwd+dgrad only",
       jax.jit(jax.grad(unet_loss, argnums=1)), mvs["cost_reg_2"], cost_p)
