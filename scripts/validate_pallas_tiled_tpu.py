"""On-device (real TPU) validation + config sweep of the tiled fused
full-image render kernel (ops/pallas_render_tiled.py): compile via Mosaic,
compare numerics vs the XLA baked-volume path, and time each config at the
production shape (640x512 image, N_samples=128, pad-24 DTU volume —
BASELINE configs 1-2).

Usage:
  python scripts/validate_pallas_tiled_tpu.py          # default config list
  python scripts/validate_pallas_tiled_tpu.py --configs 32,64,32,32,4,highest
  (config = th,tw,yb,xb,kb,mlp_precision[,interp_dtype])
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

CKPT = "/root/reference/ckpts/mvsnerf-v0.tar"

from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
from mvsnerf_tpu.models import init_mlp, init_mvsnet, mvsnet_apply
from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels
from mvsnerf_tpu.render.renderer import (build_color_volume, gen_dir_feature,
                                         render_rays)
from mvsnerf_tpu.train.finetune import frustum_point_volume
from mvsnerf_tpu.ops import pallas_render_tiled as prt

import bench  # repo-root bench.py: make_scene, H, W, PAD, N_SAMPLES

H, W, PAD, S = bench.H, bench.W, bench.PAD, bench.N_SAMPLES

DEFAULT_CONFIGS = [
    "32,64,32,32,4,highest",
    "32,32,32,16,4,highest",
    "64,64,32,32,4,highest",
    "32,64,32,32,4,default",   # bf16 MLP: timing only (numerics degrade)
]

p = argparse.ArgumentParser()
p.add_argument("--configs", default=";".join(DEFAULT_CONFIGS))
p.add_argument("--xla_timing", action="store_true",
               help="also time the XLA chunked path (slow, ~12 s/image)")
a = p.parse_args()

print(jax.devices(), flush=True)

rng = np.random.default_rng(0)
if os.path.exists(CKPT):
    ck = load_reference_checkpoint(CKPT)
    mlp, mvs = ck["mlp"], ck["mvsnet"]
else:
    mlp = init_mlp(jax.random.PRNGKey(0), "v0")
    mvs = init_mvsnet(jax.random.PRNGKey(1))

imgs, intr, w2cs, projs, near_far = bench.make_scene(rng)
v = imgs.shape[0]
intrs = jnp.broadcast_to(intr, (v, 3, 3))

volume8 = jax.jit(lambda p_, im: mvsnet_apply(
    p_, im, projs, near_far, pad=PAD)[0])(mvs, imgs)
jax.block_until_ready(volume8)
d, hp, wp, _ = volume8.shape
print("volume:", volume8.shape, flush=True)

intrinsic_s4 = intr / jnp.asarray([[4.0], [4.0], [1.0]])
c2w_ref = jnp.linalg.inv(w2cs[0])
vox_pts = frustum_point_volume(hp - 2 * PAD, wp - 2 * PAD, d, PAD,
                               near_far, intrinsic_s4, c2w_ref)
color = build_color_volume(vox_pts.reshape(d, -1, 3), w2cs, intrs, imgs,
                           with_mask=True).reshape(d, hp, wp, -1)
volume20 = jnp.concatenate([volume8, color], -1)
jax.block_until_ready(volume20)
print("baked volume:", volume20.shape, flush=True)

# full-image rays from the reference view
inv_scale = jnp.asarray([W - 1.0, H - 1.0])
gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
xs_all = jnp.asarray(gx.reshape(-1))
ys_all = jnp.asarray(gy.reshape(-1))
t = jnp.linspace(0.0, 1.0, S)
z_row = near_far[0] * (1 - t) + near_far[1] * t


@jax.jit
def ray_data(xs, ys):
    rays_o, rays_d = rays_from_pixels(xs, ys, intr, c2w_ref)
    n = xs.shape[0]
    rays_o = jnp.broadcast_to(rays_o, (n, 3))
    z_vals = jnp.broadcast_to(z_row, (n, S))
    pts_world = rays_o[:, None] + z_vals[..., None] * rays_d[:, None]
    pts_ndc = get_ndc_coordinate(w2cs[0], intr, pts_world, inv_scale,
                                 near=near_far[0], far=near_far[1], pad=PAD)
    cos = jnp.linalg.norm(rays_d, axis=-1)
    angle = gen_dir_feature(w2cs[0], rays_d / cos[:, None])
    return pts_ndc, angle, z_vals


# ---- XLA baked-volume chunked path (parity reference) -------------------
# NB: the volume must be an ARGUMENT, not a closure constant — the axon
# remote-compile service hangs on HLO with >100 MB constants.
@jax.jit
def xla_chunk(vol, xs, ys):
    pts_ndc, angle, z_vals = ray_data(xs, ys)
    out = render_rays(mlp, vol, None, pts_ndc, z_vals, angle,
                      use_color_volume=True)
    return {"rgb": out["rgb"], "depth": out["depth"], "acc": out["acc"]}


CHUNK = 16384
n_chunks = H * W // CHUNK


def xla_image():
    outs = [xla_chunk(volume20, xs_all[ci * CHUNK:(ci + 1) * CHUNK],
                      ys_all[ci * CHUNK:(ci + 1) * CHUNK])
            for ci in range(n_chunks)]
    return {k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]}


t0 = time.perf_counter()
ref = xla_image()
jax.block_until_ready(ref)
print(f"XLA path compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
xla_ms = None
if a.xla_timing:
    t0 = time.perf_counter()
    ref = xla_image()
    val = float(jnp.sum(ref["rgb"]))
    xla_ms = (time.perf_counter() - t0) * 1e3
    print(f"XLA baked-volume image: {xla_ms:.1f} ms "
          f"({H*W/xla_ms*1e3:.0f} rays/s) [checksum {val:.3f}]", flush=True)

# ---- tiled kernel sweep -------------------------------------------------
pts_ndc_all, angle_all, zv_all = ray_data(xs_all, ys_all)
jax.block_until_ready(pts_ndc_all)
vol3 = prt.prepare_volume(volume20)
weights_list = prt.pack_v0_weights_padded(mlp)
dims = (d, hp, wp)

for spec in a.configs.split(";"):
    parts = spec.split(",")
    th, tw, yb, xb, kb = (int(s) for s in parts[:5])
    prec = parts[5] if len(parts) > 5 else "highest"
    idt = parts[6] if len(parts) > 6 else "bfloat16"
    unroll = int(parts[7]) if len(parts) > 7 else 1
    cfg = dict(tile_hw=(th, tw), yb=yb, xb=xb, kb=kb,
               mlp_precision=prec, interp_dtype=idt, unroll=unroll)
    print(f"--- config {spec}", flush=True)

    def tiled_image():
        return prt.render_image_tiled(
            mlp, vol3, pts_ndc_all, angle_all, zv_all,
            image_hw=(H, W), dims=dims, weights_list=weights_list, **cfg)

    try:
        t0 = time.perf_counter()
        out = tiled_image()
        if out["rgb"] is None:
            print("    FALLBACK: tile locality rejected", flush=True)
            continue
        jax.block_until_ready(out["rgb"])
        print(f"    compiled+ran in {time.perf_counter()-t0:.1f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001 — sweep survives bad configs
        print(f"    FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        continue

    errs = " ".join(
        f"{k}={float(jnp.max(jnp.abs(out[k] - ref[k]))):.2e}"
        for k in ("rgb", "depth", "acc"))
    print(f"    max|err| vs XLA: {errs}", flush=True)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = tiled_image()
    val = float(jnp.sum(out["rgb"]))
    ms = (time.perf_counter() - t0) / iters * 1e3
    line = (f"    {ms:.1f} ms/image  ({H*W/ms*1e3:.0f} rays/s) "
            f"[checksum {val:.3f}]")
    if xla_ms:
        line += f"  speedup vs XLA: {xla_ms/ms:.2f}x"
    print(line, flush=True)
