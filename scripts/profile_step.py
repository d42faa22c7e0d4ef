"""Profile the fine-tuning step components on the real TPU, with the
production fast_volume_grad banded path (pass --naive for the XLA
gather/scatter baseline).

Times: render fwd | fwd+bwd wrt mlp only | fwd+bwd wrt mlp+volume |
full Adam step | fused-pallas render fwd.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
from mvsnerf_tpu.ops.geometry import get_ndc_coordinate, rays_from_pixels
from mvsnerf_tpu.render.renderer import render_rays

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


from mvsnerf_tpu.ops.volume_grad import volume_band_width

FAST = "--naive" not in sys.argv


def render(mlp_p, vol):
    return render_rays(mlp_p, vol, pts, pts_ndc, z_vals, rays_d,
                       w2c_ref=jnp.eye(4), w2cs=w2cs, intrinsics=intrs,
                       imgs=imgs, fast_volume_grad=FAST,
                       volume_band_k=volume_band_width(D, N_SAMPLES))["rgb"]


def _force(out):
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.2f} ms   "
          f"{N_RAYS / dt:10.0f} rays/s")
    return dt


fwd = jax.jit(render)
timeit("render fwd", fwd, mlp, volume)

loss_mlp = jax.jit(jax.grad(
    lambda m: jnp.mean((render(m, volume) - target) ** 2)))
timeit("grad wrt mlp only", loss_mlp, mlp)

loss_both = jax.jit(jax.grad(
    lambda p: jnp.mean((render(p["mlp"], p["vol"]) - target) ** 2)))
timeit("grad wrt mlp+volume", loss_both, {"mlp": mlp, "vol": volume})

opt = optax.adam(5e-4)
params = {"mlp": mlp, "vol": volume}
opt_state = opt.init(params)


@jax.jit
def step(params, opt_state):
    g = jax.grad(lambda p: jnp.mean(
        (render(p["mlp"], p["vol"]) - target) ** 2))(params)
    upd, opt_state = opt.update(g, opt_state, params)
    return optax.apply_updates(params, upd), opt_state


def run_step(p, o):
    return step(p, o)

timeit("full adam step", run_step, params, opt_state)

# fused pallas render (feature fetch via XLA, MLP+compositing in pallas)
from mvsnerf_tpu.ops.pallas_kernels import fused_render_v0, pack_v0_weights
from mvsnerf_tpu.render.renderer import gen_pts_feats, gen_dir_feature

wl = pack_v0_weights(mlp)


def fused(vol):
    feats = gen_pts_feats(vol, pts_ndc, pts, w2cs, intrs, imgs)
    dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return fused_render_v0(wl, pts_ndc, feats, dirs, z_vals,
                           rays_per_tile=64)["rgb"]

timeit("fused pallas render fwd", jax.jit(fused), volume)

# component: feature gather only
def gather_only(vol):
    return gen_pts_feats(vol, pts_ndc, pts, w2cs, intrs, imgs)

timeit("feature gather only", jax.jit(gather_only), volume)

# component: MLP only via XLA
from mvsnerf_tpu.render.renderer import run_network
feats_const = jax.jit(gather_only)(volume)
dirs_const = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def mlp_only(m):
    return run_network(m, pts_ndc, dirs_const, feats_const, net_type="v0")

timeit("xla mlp fwd only", jax.jit(mlp_only), mlp)

# banded-splat train step
def render_fast(mlp_p, vol):
    return render_rays(mlp_p, vol, pts, pts_ndc, z_vals, rays_d,
                       w2c_ref=jnp.eye(4), w2cs=w2cs, intrinsics=intrs,
                       imgs=imgs, fast_volume_grad=True)["rgb"]

loss_both_fast = jax.jit(jax.grad(
    lambda p: jnp.mean((render_fast(p["mlp"], p["vol"]) - target) ** 2)))
timeit("grad mlp+volume (banded splat)", loss_both_fast,
       {"mlp": mlp, "vol": volume})
