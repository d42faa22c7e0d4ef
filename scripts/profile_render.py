"""Consolidated render-path profiling on the real TPU: gather components,
XLA MLP, fused Pallas kernel, banded-matmul volume sampling, full step."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
from mvsnerf_tpu.ops.geometry import get_ndc_coordinate, rays_from_pixels
from mvsnerf_tpu.ops.interp import index_point_feature
from mvsnerf_tpu.ops.volume_grad import sample_volume_banded
from mvsnerf_tpu.render.renderer import (build_color_volume, render_rays,
                                         run_network)
from mvsnerf_tpu.ops.compositing import raw2outputs

H, W, PAD, N_RAYS, N_SAMPLES = 512, 640, 24, 1024, 128
D, HP, WP = 128, H // 4 + 2 * PAD, W // 4 + 2 * PAD

rng = np.random.default_rng(0)
mlp = load_reference_checkpoint("/root/reference/ckpts/mvsnerf-v0.tar")["mlp"]
volume = jnp.asarray(rng.standard_normal((D, HP, WP, 8)).astype(np.float32))
imgs = jnp.asarray(rng.uniform(0, 1, (3, H, W, 3)).astype(np.float32))
intr = jnp.asarray([[722.0, 0, W / 2], [0, 722.0, H / 2], [0, 0, 1]])
w2cs = jnp.broadcast_to(jnp.eye(4), (3, 4, 4))
intrs = jnp.broadcast_to(intr, (3, 3, 3))
near_far = (2.125, 4.525)

xs = jnp.asarray(rng.uniform(0, W - 1, N_RAYS).astype(np.float32))
ys = jnp.asarray(rng.uniform(0, H - 1, N_RAYS).astype(np.float32))
rays_o, rays_d = rays_from_pixels(xs, ys, intr, jnp.eye(4))
t = jnp.linspace(0.0, 1.0, N_SAMPLES)
z_vals = jnp.asarray(np.broadcast_to(
    np.asarray(near_far[0] * (1 - t) + near_far[1] * t),
    (N_RAYS, N_SAMPLES)).copy())
pts = rays_o[None, None] + z_vals[..., None] * rays_d[:, None]
inv_scale = jnp.asarray([W - 1.0, H - 1.0])
pts_ndc = get_ndc_coordinate(jnp.eye(4), intr, pts, inv_scale,
                             near=near_far[0], far=near_far[1], pad=PAD)
dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def timeit(name, fn, *args, iters=30):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:100]}")
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1e3:8.2f} ms   {N_RAYS / dt:10.0f} rays/s",
          flush=True)


timeit("trilinear gather", jax.jit(
    lambda v: index_point_feature(v, pts_ndc)), volume)
timeit("trilinear banded bf16", jax.jit(
    lambda v: sample_volume_banded(v, pts_ndc)), volume)
timeit("trilinear banded f32", jax.jit(
    lambda v: sample_volume_banded(v, pts_ndc,
                                   compute_dtype=jnp.float32)), volume)
timeit("color volume (3x bilinear)", jax.jit(
    lambda im: build_color_volume(pts, w2cs, intrs, im)), imgs)

feats = jax.jit(lambda v, im: jnp.concatenate(
    [index_point_feature(v, pts_ndc),
     build_color_volume(pts, w2cs, intrs, im)], -1))(volume, imgs)

timeit("xla PE+MLP", jax.jit(
    lambda m: run_network(m, pts_ndc, dirs, feats, net_type="v0")), mlp)
timeit("xla PE+MLP+composite", jax.jit(
    lambda m: raw2outputs(run_network(m, pts_ndc, dirs, feats,
                                      net_type="v0"), z_vals)), mlp)

from mvsnerf_tpu.ops.pallas_kernels import fused_render_v0, pack_v0_weights
wl = pack_v0_weights(mlp)
timeit("fused pallas PE+MLP+composite", jax.jit(
    lambda f: fused_render_v0(wl, pts_ndc, f, dirs, z_vals,
                              rays_per_tile=128)["rgb"]), feats)

timeit("full render fwd", jax.jit(
    lambda v: render_rays(mlp, v, pts, pts_ndc, z_vals, rays_d,
                          w2c_ref=jnp.eye(4), w2cs=w2cs, intrinsics=intrs,
                          imgs=imgs)["rgb"]), volume)
