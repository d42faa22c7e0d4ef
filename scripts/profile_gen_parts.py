"""Decompose the current generalizable training step (pallas warp mode) at
DTU scale: fwd and fwd+bwd per stage, on the real TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from mvsnerf_tpu.models import init_mvsnet, init_mlp
from mvsnerf_tpu.models.mvsnet import (cost_reg_apply, feature_net_apply,
                                       depth_plane_values)
from mvsnerf_tpu.ops.homography import build_cost_volume
from mvsnerf_tpu.render.renderer import render_rays

H, W, PAD, D = 512, 640, 24, 128
h, w = H // 4, W // 4
HP, WP = h + 2 * PAD, w + 2 * PAD
N_RAYS, N_SAMPLES = 1024, 128

rng = np.random.default_rng(0)
mvs = init_mvsnet(jax.random.PRNGKey(0))
mlp = init_mlp(jax.random.PRNGKey(1), "v0")
imgs = jnp.asarray(rng.uniform(-1, 1, (3, H, W, 3)).astype(np.float32))
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


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt * 1e3:9.2f} ms", flush=True)
    return out


MODE = sys.argv[1] if len(sys.argv) > 1 else "pallas"

# ---- featurenet ----------------------------------------------------------
timeit("featurenet fwd", jax.jit(
    lambda p, im: feature_net_apply(p, im)), mvs["feature"], imgs)


def fn_loss(p, im):
    return jnp.sum(feature_net_apply(p, im) ** 2)


timeit("featurenet fwd+bwd", jax.jit(jax.grad(fn_loss)), mvs["feature"], imgs)

# ---- cost volume ---------------------------------------------------------
feats = feature_net_apply(mvs["feature"], imgs)
feats = jax.block_until_ready(feats)


def cv(feats_, imgs_):
    cost, _, _ = build_cost_volume(imgs_, feats_, projs, depth_values,
                                   pad=PAD, warp_fwd_mode=MODE)
    return cost


timeit(f"cost volume fwd ({MODE})", jax.jit(cv), feats, imgs)


def cv_loss(feats_, imgs_):
    return jnp.sum(cv(feats_, imgs_) ** 2)


timeit(f"cost volume fwd+bwd ({MODE})",
       jax.jit(jax.grad(cv_loss, argnums=(0, 1))), feats, imgs)

# ---- costreg -------------------------------------------------------------
cost = jax.jit(cv)(feats, imgs)
cost = jax.block_until_ready(cost)

timeit("costreg fwd", jax.jit(
    lambda p, c: cost_reg_apply(p, c[None])), mvs["cost_reg_2"], cost)


def cr_loss(p, c):
    return jnp.sum(cost_reg_apply(p, c[None]) ** 2)


timeit("costreg fwd+bwd (wrt params+cost)",
       jax.jit(jax.grad(cr_loss, argnums=(0, 1))), mvs["cost_reg_2"], cost)

# ---- render path ---------------------------------------------------------
volume = jnp.asarray(rng.standard_normal((D, HP, WP, 8)).astype(np.float32))
w2cs = jnp.broadcast_to(jnp.eye(4), (3, 4, 4))
intr = jnp.asarray([[722.0, 0, W / 2], [0, 722.0, H / 2], [0, 0, 1]])
intrs = jnp.broadcast_to(intr, (3, 3, 3))
pts_world = jnp.asarray(
    rng.standard_normal((N_RAYS, N_SAMPLES, 3)).astype(np.float32))
pts_ndc = jnp.asarray(
    rng.uniform(0, 1, (N_RAYS, N_SAMPLES, 3)).astype(np.float32))
z_vals = jnp.broadcast_to(jnp.linspace(2.125, 4.525, N_SAMPLES),
                          (N_RAYS, N_SAMPLES))
rays_d = jnp.asarray(rng.standard_normal((N_RAYS, 3)).astype(np.float32))
imgs01 = jnp.asarray(rng.uniform(0, 1, (3, H, W, 3)).astype(np.float32))


def render_loss(mlp_, volume_):
    out = render_rays(mlp_, volume_, pts_world, pts_ndc, z_vals, rays_d,
                      w2c_ref=w2cs[0], w2cs=w2cs, intrinsics=intrs,
                      imgs=imgs01, fast_volume_grad=True, volume_band_k=4)
    return jnp.mean(out["rgb"] ** 2)


timeit("render fwd", jax.jit(render_loss), mlp, volume)
timeit("render fwd+bwd (wrt mlp+volume)",
       jax.jit(jax.grad(render_loss, argnums=(0, 1))), mlp, volume)
