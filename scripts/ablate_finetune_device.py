"""Device-looped ablation of the fine-tune training step.

The step has sat at ~24 ms (≈43k rays/s) for three rounds; the round-1
"colors ≈ 12 ms" decomposition was dispatch-polluted (the isolated pallas
color reprojection is 0.44 ms device-looped). This script finds the real
cost structure by swapping one component at a time and differencing full
step times (every variant is a complete update incl. Adam, timed with
bench._scan_rate two-length differencing).

Variants:
  full           — the bench step verbatim (reference point)
  fwd_only       — loss forward, no grad/optimizer (step - fwd ≈ bwd+adam)
  sgd            — plain SGD apply instead of Adam (isolates Adam's HBM
                   passes over the 37.5M-param volume)
  frozen_volume  — stop_gradient(volume): kills the banded splat backward
                   AND Adam on the volume leaf
  no_colors      — zeros in place of per-sample source colors
  no_pe          — identity in place of the 63-ch positional encoding
  band_k8        — volume_band_k 8 instead of 4
  dumb_vgrad     — fast_volume_grad=False (XLA gather+scatter VJP)

Run: python scripts/ablate_finetune_device.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import (H, W, N_RAYS, N_SAMPLES, PAD, _scan_rate,  # noqa: E402
                   make_scene)
from mvsnerf_tpu.models import init_mlp, init_mvsnet, mvsnet_apply  # noqa: E402
from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels  # noqa: E402
from mvsnerf_tpu.render import render_rays  # noqa: E402

rng = np.random.default_rng(0)
mlp = init_mlp(jax.random.PRNGKey(0), "v0")
mvs = init_mvsnet(jax.random.PRNGKey(1))
imgs, intr, w2cs, projs, near_far = make_scene(rng)
intrs = jnp.broadcast_to(intr, (3, 3, 3))
volume = jax.jit(lambda p, im: mvsnet_apply(p, im, projs, near_far,
                                            pad=PAD)[0])(mvs, imgs)
jax.block_until_ready(volume)
params = {"mlp": mlp, "volume": volume}
c2w_t = jnp.linalg.inv(w2cs[0])
inv_scale = jnp.asarray([W - 1.0, H - 1.0])

xs = jnp.asarray(rng.uniform(0, W - 1, N_RAYS).astype(np.float32))
ys = jnp.asarray(rng.uniform(0, H - 1, N_RAYS).astype(np.float32))
target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
key = jax.random.PRNGKey(0)


def make_loss(variant):
    def loss_fn(p, k):
        t = jnp.linspace(0.0, 1.0, N_SAMPLES)
        z = near_far[0] * (1 - t) + near_far[1] * t
        z_vals = jnp.broadcast_to(z, (N_RAYS, N_SAMPLES))
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], -1)
        lower = jnp.concatenate([z_vals[:, :1], mids], -1)
        z_vals = lower + (upper - lower) * jax.random.uniform(k, z_vals.shape)
        rays_o, rays_d = rays_from_pixels(xs, ys, intr, c2w_t)
        rays_o = jnp.broadcast_to(rays_o, (N_RAYS, 3))
        pts_world = rays_o[:, None] + z_vals[..., None] * rays_d[:, None]
        pts_ndc = get_ndc_coordinate(w2cs[0], intr, pts_world, inv_scale,
                                     near=near_far[0], far=near_far[1],
                                     pad=PAD)
        vol = p["volume"]
        if variant == "frozen_volume":
            vol = jax.lax.stop_gradient(vol)
        kw = dict(w2c_ref=w2cs[0], w2cs=w2cs, intrinsics=intrs, imgs=imgs,
                  fast_volume_grad=variant != "dumb_vgrad",
                  volume_band_k=8 if variant == "band_k8" else 4)
        if variant == "no_colors":
            # bake zeros colors: 20-ch volume path skips reprojection
            import mvsnerf_tpu.render.renderer as rmod
            orig = rmod.build_color_volume
            rmod.build_color_volume = lambda *a, **k2: jnp.zeros(
                (*pts_world.shape[:2], 12), jnp.float32)
            try:
                out = render_rays(p["mlp"], vol, pts_world, pts_ndc,
                                  z_vals, rays_d, **kw)
            finally:
                rmod.build_color_volume = orig
        elif variant == "no_pe":
            import mvsnerf_tpu.render.renderer as rmod
            import mvsnerf_tpu.ops.encoding as emod
            orig = emod.positional_encoding

            def fake_pe(x, multires):
                return jnp.tile(x, (1,) * (x.ndim - 1) + (21,))
            rmod.positional_encoding = fake_pe
            try:
                out = render_rays(p["mlp"], vol, pts_world, pts_ndc,
                                  z_vals, rays_d, **kw)
            finally:
                rmod.positional_encoding = orig
        else:
            out = render_rays(p["mlp"], vol, pts_world, pts_ndc, z_vals,
                              rays_d, **kw)
        return jnp.mean((out["rgb"] - target) ** 2)
    return loss_fn


def run(variant):
    loss_fn = make_loss(variant)
    if variant == "fwd_only":
        def update(state, i):
            p, acc = state
            v = loss_fn(p, jax.random.fold_in(key, i))
            return (p, acc + v), None

        def stepper(state, i):
            return update(state, i)[0]
        sec, _ = _scan_rate(stepper, (params, jnp.zeros(())), 5, 45)
    else:
        opt = optax.sgd(5e-4) if variant == "sgd" else optax.adam(5e-4)
        opt_state = opt.init(params)

        def stepper(state, i):
            p, o = state
            grads = jax.grad(loss_fn)(p, jax.random.fold_in(key, i))
            updates, o = opt.update(grads, o, p)
            return optax.apply_updates(p, updates), o
        sec, _ = _scan_rate(stepper, (params, opt_state), 5, 45)
    print(f"{variant:14s} {sec*1e3:8.3f} ms = {N_RAYS/sec/1e3:6.1f}k rays/s",
          flush=True)


for v in ("full", "fwd_only", "sgd", "frozen_volume", "no_colors",
          "no_pe", "band_k8", "dumb_vgrad"):
    try:
        run(v)
    except Exception as e:  # noqa: BLE001
        print(f"{v:14s} FAILED: {e!r}", flush=True)
