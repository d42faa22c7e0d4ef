"""Ablate the fine-tune train step (bench.py configuration, band_k=4):
full step vs step with the color gather / trilinear volume fetch / MLP
stubbed, to locate the remaining cost."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
from mvsnerf_tpu.ops.geometry import get_ndc_coordinate, rays_from_pixels
from mvsnerf_tpu.render import renderer as R

H, W, PAD, N_RAYS, N_SAMPLES = 512, 640, 24, 1024, 128
D, HP, WP = 128, H // 4 + 2 * PAD, W // 4 + 2 * PAD

rng = np.random.default_rng(0)
ck = load_reference_checkpoint("/root/reference/ckpts/mvsnerf-v0.tar")
mlp = ck["mlp"]
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
z_vals = jnp.broadcast_to(near_far[0] * (1 - t) + near_far[1] * t,
                          (N_RAYS, N_SAMPLES))
pts = rays_o[None, None] + z_vals[..., None] * rays_d[:, None]
inv_scale = jnp.asarray([W - 1.0, H - 1.0])
pts_ndc = get_ndc_coordinate(jnp.eye(4), intr, pts, inv_scale,
                             near=near_far[0], far=near_far[1], pad=PAD)
target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))


def force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1e3:8.2f} ms  {N_RAYS / dt:9.0f} rays/s",
          flush=True)


opt = optax.adam(5e-4)


from mvsnerf_tpu.ops.volume_grad import sample_volume_train
from mvsnerf_tpu.ops.compositing import raw2outputs
from mvsnerf_tpu.render.renderer import (build_color_volume,
                                         gen_dir_feature, run_network)


def make_step(mode):
    def render(params):
        cos = jnp.linalg.norm(rays_d, axis=-1)
        angle = gen_dir_feature(jnp.eye(4), rays_d / cos[..., None])
        n, s = pts_ndc.shape[:2]
        if mode in (None, "no_color"):
            vol_feats = sample_volume_train(params["vol"], pts_ndc, 4)
        else:
            vol_feats = jnp.zeros((n, s, 8)) + jnp.mean(params["vol"])
        if mode in (None, "no_volume"):
            colors = build_color_volume(pts, w2cs, intrs, imgs,
                                        with_mask=True)
        else:
            colors = jnp.zeros((n, s, 12))
        feats = jnp.concatenate([vol_feats, colors], axis=-1)
        raw = run_network(params["mlp"], pts_ndc, angle, feats)
        return raw2outputs(raw, z_vals)["rgb"]

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state):
        g = jax.grad(lambda p: jnp.mean((render(p) - target) ** 2))(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state

    params = {"mlp": jax.tree.map(jnp.copy, mlp), "vol": jnp.copy(volume)}
    opt_state = opt.init(params)
    state = [params, opt_state]

    def one(_):
        state[0], state[1] = step(state[0], state[1])
        return state[0]["vol"]

    return one


for mode in (None, "no_color", "no_volume", "mlp_only"):
    try:
        timeit(f"step ablate={mode}", make_step(mode), 0)
    except Exception as e:
        print(f"{mode}: {type(e).__name__} {str(e)[:150]}", flush=True)
