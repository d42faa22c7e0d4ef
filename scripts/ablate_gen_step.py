"""Ablation profile of the generalizable train step (the only reliable way
to attribute time on the axon backend: full donation-chained steps, with
components swapped for cheap stand-ins).

Variants:
  full         the production step
  no_costreg   U-Net replaced by a channel slice
  no_sweep     cost volume replaced by tiled ref features (FeatureNet and
               U-Net kept)
  no_render    loss = mean(volume^2) (no ray render; mvsnet fwd+bwd + adam)
  no_mvsnet    volume is a constant input (render fwd+bwd + adam only)
"""

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

from mvsnerf_tpu.models import init_mlp, init_mvsnet
from mvsnerf_tpu.models.mvsnet import (cost_reg_apply, depth_plane_values,
                                       feature_net_apply)
from mvsnerf_tpu.ops.homography import build_cost_volume
from mvsnerf_tpu.ops.geometry import (get_ndc_coordinate, rays_from_pixels,
                                      sample_random_pixels)
from mvsnerf_tpu.ops.volume_grad import volume_band_width
from mvsnerf_tpu.render.renderer import render_rays

H, W, PAD, D = 512, 640, 24, 128
h, w = H // 4, W // 4
HP, WP = h + 2 * PAD, w + 2 * PAD
N_RAYS, N_SAMPLES = 1024, 128
BAND_K = volume_band_width(D, N_SAMPLES)

rng = np.random.default_rng(0)
intr = np.array([[722.0, 0, W / 2], [0, 722.0, H / 2], [0, 0, 1]],
                np.float32)
intr_s4 = intr.copy()
intr_s4[:2] /= 4
w2cs_l, projs, c2ws_l = [], [], []
ref4 = np.eye(4, dtype=np.float32)
ref4[:3] = intr_s4 @ np.eye(4)[:3]
ref_inv = np.linalg.inv(ref4)
for i in range(4):
    a = 0.04 * (i - 1.5)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = [0.3 * (i - 1.5), 0, 0]
    w2cs_l.append(w2c)
    c2ws_l.append(np.linalg.inv(w2c).astype(np.float32))
    p4 = np.eye(4, dtype=np.float32)
    p4[:3] = intr_s4 @ w2c[:3]
    projs.append((p4 @ ref_inv)[:3])

batch = {
    "images": jnp.asarray(rng.uniform(-1, 1, (4, H, W, 3)).astype(np.float32)),
    "proj_mats": jnp.asarray(np.stack(projs)),
    "near_fars": jnp.asarray(np.tile([2.125, 4.525], (4, 1)).astype(np.float32)),
    "w2cs": jnp.asarray(np.stack(w2cs_l)),
    "c2ws": jnp.asarray(np.stack(c2ws_l)),
    "intrinsics": jnp.asarray(np.stack([intr] * 4)),
    "const_volume": jnp.asarray(
        rng.standard_normal((D, HP, WP, 8)).astype(np.float32)),
}

key0 = jax.random.PRNGKey(0)
inv_scale = jnp.asarray([W - 1.0, H - 1.0])
depths = depth_plane_values(2.125, 4.525, D)


def make_loss(variant):
    def loss_fn(params, batch, key):
        imgs_norm = batch["images"]
        if variant == "no_mvsnet":
            volume = batch["const_volume"]
        else:
            feats = feature_net_apply(params["mvsnet"]["feature"],
                                      imgs_norm[:3])
            layout = "packed16" if (variant.startswith("full_packed")
                                    or variant == "no_costreg_p") else "dense"
            if variant == "no_sweep":
                ref_feat = jnp.pad(feats[0],
                                   ((PAD, PAD), (PAD, PAD), (0, 0)))
                cost = jnp.broadcast_to(
                    jnp.pad(ref_feat, ((0, 0), (0, 0), (0, 9)))[None],
                    (D, HP, WP, 41))
            else:
                band = int(os.environ.get("ABL_WARP_BAND", "32"))
                cost, _, _ = build_cost_volume(
                    imgs_norm[:3], feats, batch["proj_mats"][:3], depths,
                    pad=PAD, warp_fwd_mode="pallas", cost_layout=layout,
                    warp_band=band)
            if variant == "no_costreg_p":
                from mvsnerf_tpu.models.costreg_packed import unpack_volume
                volume = unpack_volume(cost, 16)[0][..., :8]
            elif variant == "no_costreg":
                volume = cost[..., :8]
            elif variant == "full_packed_nowgrad":
                from mvsnerf_tpu.models.costreg_packed import \
                    cost_reg_packed_apply
                volume = cost_reg_packed_apply(
                    jax.lax.stop_gradient(params["mvsnet"]["cost_reg_2"]),
                    cost, packed_input=True)[0]
            elif variant == "full_packed_detcost":
                from mvsnerf_tpu.models.costreg_packed import \
                    cost_reg_packed_apply
                volume = cost_reg_packed_apply(
                    params["mvsnet"]["cost_reg_2"],
                    jax.lax.stop_gradient(cost), packed_input=True)[0]
            elif variant == "full_packed_fwdonly":
                from mvsnerf_tpu.models.costreg_packed import \
                    cost_reg_packed_apply
                volume = jax.lax.stop_gradient(cost_reg_packed_apply(
                    jax.lax.stop_gradient(params["mvsnet"]["cost_reg_2"]),
                    cost, packed_input=True))[0] + 0.0 * cost[
                        0, 0, 0, 0, :8] + 0.0 * jnp.sum(
                        params["mvsnet"]["cost_reg_2"]["conv0"]["conv"][
                            "kernel"])
            elif variant == "full_packed8":
                from mvsnerf_tpu.models.costreg_packed import \
                    cost_reg_packed_apply, unpack_volume
                volume = cost_reg_packed_apply(
                    params["mvsnet"]["cost_reg_2"],
                    unpack_volume(cost, 16), p0=8)[0]
            elif variant.startswith("full_packed"):
                from mvsnerf_tpu.models.costreg_packed import \
                    cost_reg_packed_apply
                dt = jnp.bfloat16 if variant.endswith("bf16") else None
                volume = cost_reg_packed_apply(
                    params["mvsnet"]["cost_reg_2"], cost, dtype=dt,
                    packed_input=True)[0]
            else:
                dt = jnp.bfloat16 if variant == "full_bf16" else None
                volume = cost_reg_apply(params["mvsnet"]["cost_reg_2"],
                                        cost[None], dtype=dt)[0]
        if variant == "no_render":
            return jnp.mean(volume ** 2), {}

        imgs = imgs_norm * 0.5 + 0.5
        k_pix, k_z = jax.random.split(key)
        xs, ys = sample_random_pixels(k_pix, H, W, N_RAYS)
        rays_o, rays_d = rays_from_pixels(xs, ys, batch["intrinsics"][3],
                                          batch["c2ws"][3])
        xi, yi = xs.astype(jnp.int32), ys.astype(jnp.int32)
        target_rgb = imgs[3, yi, xi]
        t = jnp.linspace(0.0, 1.0, N_SAMPLES)
        z = 2.125 * (1 - t) + 4.525 * t
        z_vals = jnp.broadcast_to(z, (N_RAYS, N_SAMPLES))
        z_vals = z_vals + jax.random.uniform(k_z, z_vals.shape) * 0.018
        rays_o_b = jnp.broadcast_to(rays_o, (N_RAYS, 3))
        pts = rays_o_b[:, None] + z_vals[..., None] * rays_d[:, None]
        pts_ndc = get_ndc_coordinate(batch["w2cs"][0],
                                     batch["intrinsics"][0], pts, inv_scale,
                                     near=2.125, far=4.525, pad=PAD)
        out = render_rays(params["mlp"], volume, pts, pts_ndc, z_vals,
                          rays_d, w2c_ref=batch["w2cs"][0],
                          w2cs=batch["w2cs"][:3],
                          intrinsics=batch["intrinsics"][:3], imgs=imgs[:3],
                          fast_volume_grad=True, volume_band_k=BAND_K)
        return jnp.mean((out["rgb"] - target_rgb) ** 2), {}
    return loss_fn


def run_variant(variant, iters=10):
    params = {"mlp": init_mlp(key0, "v0"),
              "mvsnet": init_mvsnet(jax.random.fold_in(key0, 1))}
    loss_fn = make_loss(variant)
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p, o = params, opt_state
    for i in range(2):
        p, o, loss = step(p, o, batch, jax.random.fold_in(key0, i))
    float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, loss = step(p, o, batch, jax.random.fold_in(key0, 10 + i))
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"{variant:14s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


variants = sys.argv[1:] or ["full", "no_costreg", "no_sweep", "no_render",
                            "no_mvsnet"]
for v in variants:
    run_variant(v)
