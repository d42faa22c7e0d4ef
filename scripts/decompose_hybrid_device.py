"""Device-looped decomposition of the hybrid (exact-color) tiled render
at production shape (640x512, S=128, DTU-like 3-view scene).

Full-image per-sample colors are 2 GB f32 (HW x S x 12) — the hybrid
path computes them per row-slab (H/4 rows at a time) and packs each slab
straight to the kernel's bf16 streamed layout, so only the 2.7 GB packed
tensor persists.

Stages:
  1. exact per-sample color reprojection (build_color_volume) per slab:
     gather vs banded-MXU pallas (row_block sweep)
  2. pack_color_tiles (layout shuffle to the kernel's streamed format)
  3. fused tiled kernel with streamed colors (vs baked-color kernel)
  4. end-to-end hybrid image (colors + pack per slab, then kernel)

Run: python scripts/decompose_hybrid_device.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import make_scene, H, W, N_SAMPLES  # noqa: E402
from mvsnerf_tpu.models import init_mlp  # noqa: E402
from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels  # noqa: E402
from mvsnerf_tpu.ops import pallas_render_tiled as prt  # noqa: E402
from mvsnerf_tpu.render.renderer import (  # noqa: E402
    build_color_volume, gen_dir_feature)
from mvsnerf_tpu.render.tiled import bake_color_volume  # noqa: E402
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

rng = np.random.default_rng(0)
mlp = init_mlp(jax.random.PRNGKey(0), "v0")
imgs, intr, w2cs, projs, near_far = make_scene(rng)
intrs = jnp.broadcast_to(intr, (3, 3, 3))
pose_source = {"w2cs": w2cs, "intrinsics": intrs}

D, HP, WP = 128, 128 + 2 * 6, 160 + 2 * 6  # pad 24 at 4x downscale = 6
vol8 = jnp.asarray(rng.uniform(-1, 1, (D, HP, WP, 8)).astype(np.float32))
w2c_ref = w2cs[0]
c2w_ref = jnp.linalg.inv(w2c_ref)
inv_scale = jnp.asarray([W - 1.0, H - 1.0])

N_SLAB = 4
SH = H // N_SLAB                     # slab rows
tile_hw = (32, 64)

gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
xs_all = jnp.asarray(gx.reshape(-1))
ys_all = jnp.asarray(gy.reshape(-1))


@jax.jit
def ray_data(xs, ys):
    rays_o, rays_d = rays_from_pixels(xs, ys, intr, c2w_ref)
    t = jnp.linspace(0.0, 1.0, N_SAMPLES)
    z_row = near_far[0] * (1 - t) + near_far[1] * t
    z_vals = jnp.broadcast_to(z_row, (xs.shape[0], N_SAMPLES))
    pts = rays_o[None, None] + rays_d[:, None] * z_vals[..., None]
    pts_ndc = get_ndc_coordinate(w2c_ref, intr, pts, inv_scale,
                                 near=near_far[0], far=near_far[1], pad=24)
    cos = jnp.linalg.norm(rays_d, axis=-1)
    angle = gen_dir_feature(w2c_ref, rays_d / cos[..., None])
    return pts, pts_ndc, angle, z_vals


pts, pts_ndc, angle, z_vals = ray_data(xs_all, ys_all)
jax.block_until_ready(pts)
pts_slab = pts[: SH * W]
print(f"scene: {H}x{W}, S={N_SAMPLES}; slab {SH}x{W}", flush=True)

# ---- stage 1: color reprojection (one slab; x N_SLAB for full) --------
def colors_gather(p):
    return build_color_volume(p, w2cs, intrs, imgs, mode="gather")


sec = device_time(colors_gather, pts_slab, iters=3, base_iters=1)
print(f"colors gather /slab      {sec*1e3:9.2f} ms  "
      f"(x{N_SLAB} = {sec*N_SLAB*1e3:.1f} ms/img)", flush=True)
ref_slab = colors_gather(pts_slab)

for rb in (8, 16, 32):
    def colors_pallas(p, rb=rb):
        return build_color_volume(p, w2cs, intrs, imgs, mode="pallas",
                                  row_block=rb)
    try:
        out = colors_pallas(pts_slab)
        err = float(jnp.max(jnp.abs(out - ref_slab)))
        sec = device_time(colors_pallas, pts_slab, iters=3, base_iters=1)
        print(f"colors pallas rb={rb:<3}/slab {sec*1e3:9.2f} ms  "
              f"(x{N_SLAB} = {sec*N_SLAB*1e3:.1f} ms/img)  "
              f"max|err| {err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"colors pallas rb={rb:<3}     FAILED: {e!r}", flush=True)

# ---- stage 2: pack (slab -> kernel layout, bf16) ----------------------
def pack_slab(c):
    return prt.pack_color_tiles(c, image_hw=(SH, W), tile_hw=tile_hw)


sec = device_time(pack_slab, ref_slab, iters=3, base_iters=1)
print(f"pack_color_tiles /slab   {sec*1e3:9.2f} ms  "
      f"(x{N_SLAB} = {sec*N_SLAB*1e3:.1f} ms/img)", flush=True)

# ---- stage 3: kernel (streamed colors vs baked) -----------------------
xyz_t, coords, dirs_t = prt.pack_tiles(pts_ndc, angle, z_vals,
                                       image_hw=(H, W), tile_hw=tile_hw)
T, R, S = xyz_t.shape[:3]
oy, oxc, _, ok = prt.plan_tiles(xyz_t, dims=(D, HP, WP),
                                tile_shape=(T, R, S), yb=32, kb=4, xb=32)
assert bool(ok), "tile plan rejected"
wlist = prt.pack_v0_weights_padded(mlp)
del xyz_t, pts, pts_ndc, ref_slab, pts_slab


@jax.jit
def slab_packed(xs, ys):
    p = ray_data(xs, ys)[0]
    c = build_color_volume(p, w2cs, intrs, imgs, mode="pallas",
                           row_block=8)
    return prt.pack_color_tiles(c, image_hw=(SH, W), tile_hw=tile_hw)


colors_t = jnp.concatenate(
    [slab_packed(xs_all[k * SH * W:(k + 1) * SH * W],
                 ys_all[k * SH * W:(k + 1) * SH * W])
     for k in range(N_SLAB)], axis=0)
jax.block_until_ready(colors_t)
vol3_8 = prt.prepare_volume(vol8)

vol20 = bake_color_volume(vol8, imgs, pose_source, near_far, 24)
vol3_20 = prt.prepare_volume(vol20)


def kernel_hybrid(coords, dirs_t, vol3, colors_t):
    out = prt.tiled_render_v0(wlist, vol3, coords, dirs_t, oy, oxc,
                              dims=(D, HP, WP), tile_shape=(T, R, S),
                              yb=32, xb=32, kb=4, mlp_precision="high",
                              colors=colors_t)
    return prt.untile_image(out, (H, W), tile_hw)


def kernel_baked(coords, dirs_t, vol3):
    out = prt.tiled_render_v0(wlist, vol3, coords, dirs_t, oy, oxc,
                              dims=(D, HP, WP), tile_shape=(T, R, S),
                              yb=32, xb=32, kb=4, mlp_precision="high")
    return prt.untile_image(out, (H, W), tile_hw)


sec = device_time(kernel_baked, coords, dirs_t, vol3_20, iters=4,
                  base_iters=1)
print(f"kernel baked (20ch)      {sec*1e3:9.2f} ms  "
      f"({H*W/sec/1e3:.0f}k rays/s)", flush=True)
sec = device_time(kernel_hybrid, coords, dirs_t, vol3_8, colors_t,
                  iters=4, base_iters=1)
print(f"kernel hybrid (8ch+strm) {sec*1e3:9.2f} ms  "
      f"({H*W/sec/1e3:.0f}k rays/s)", flush=True)

# ---- stage 4: end-to-end hybrid (slab-chunked colors) -----------------
def colors_packed_slab(xs, ys, mode, rb):
    p = ray_data(xs, ys)[0]
    c = build_color_volume(p, w2cs, intrs, imgs, mode=mode, row_block=rb)
    return prt.pack_color_tiles(c, image_hw=(SH, W), tile_hw=tile_hw)


def e2e(xs, ys, vol3, mode="gather", rb=8):
    xs4 = xs.reshape(N_SLAB, SH * W)
    ys4 = ys.reshape(N_SLAB, SH * W)
    ct = jax.lax.map(
        lambda a: colors_packed_slab(a[0], a[1], mode, rb), (xs4, ys4))
    ct = ct.reshape(-1, *ct.shape[2:])
    p, pn, ang, zv = ray_data(xs, ys)
    _, coords, dirs_t = prt.pack_tiles(pn, ang, zv, image_hw=(H, W),
                                       tile_hw=tile_hw)
    out = prt.tiled_render_v0(wlist, vol3, coords, dirs_t, oy, oxc,
                              dims=(D, HP, WP), tile_shape=(T, R, S),
                              yb=32, xb=32, kb=4, mlp_precision="high",
                              colors=ct)
    return prt.untile_image(out, (H, W), tile_hw)


for mode, rb in (("gather", 8), ("pallas", 8), ("pallas", 32)):
    try:
        def run(xs, ys, vol3, mode=mode, rb=rb):
            return e2e(xs, ys, vol3, mode, rb)
        sec = device_time(run, xs_all, ys_all, vol3_8, iters=3,
                          base_iters=1)
        print(f"e2e hybrid ({mode:>6},rb={rb:<2}) {sec*1e3:9.2f} ms  "
              f"({H*W/sec/1e3:.0f}k rays/s = {H*W/sec/34133:.1f}x anchor)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"e2e hybrid ({mode},rb={rb})      FAILED: {e!r}",
              flush=True)

# ---- stage 5: the overhead pieces (ray_data / pack_tiles alone) --------
sec = device_time(lambda a, b: ray_data(a, b)[1], xs_all, ys_all,
                  iters=3, base_iters=1)
print(f"ray_data full img        {sec*1e3:9.2f} ms", flush=True)


def pack_only(xs, ys):
    _, pn, ang, zv = ray_data(xs, ys)
    return prt.pack_tiles(pn, ang, zv, image_hw=(H, W),
                          tile_hw=tile_hw)[1]


sec = device_time(pack_only, xs_all, ys_all, iters=3, base_iters=1)
print(f"ray_data + pack_tiles    {sec*1e3:9.2f} ms", flush=True)


# ---- stage 6: fully slab-wise pipeline (tiles don't cross slabs when
# slab rows divide by tile rows: build coords/dirs/colors per slab and
# concat — no full-image pts/ndc tensors ever materialize) --------------
def e2e_slabwise(xs, ys, vol3, rb=32):
    xs4 = xs.reshape(N_SLAB, SH * W)
    ys4 = ys.reshape(N_SLAB, SH * W)

    def one_slab(a):
        p, pn, ang, zv = ray_data(a[0], a[1])
        c = build_color_volume(p, w2cs, intrs, imgs, mode="pallas",
                               row_block=rb)
        ct1 = prt.pack_color_tiles(c, image_hw=(SH, W), tile_hw=tile_hw)
        _, co1, dt1 = prt.pack_tiles(pn, ang, zv, image_hw=(SH, W),
                                     tile_hw=tile_hw)
        return ct1, co1, dt1

    ct, co, dt = jax.lax.map(one_slab, (xs4, ys4))
    ct = ct.reshape(-1, *ct.shape[2:])
    co = co.reshape(-1, *co.shape[2:])
    dt = dt.reshape(-1, *dt.shape[2:])
    out = prt.tiled_render_v0(wlist, vol3, co, dt, oy, oxc,
                              dims=(D, HP, WP), tile_shape=(T, R, S),
                              yb=32, xb=32, kb=4, mlp_precision="high",
                              colors=ct)
    return prt.untile_image(out, (H, W), tile_hw)


try:
    sec = device_time(e2e_slabwise, xs_all, ys_all, vol3_8, iters=3,
                      base_iters=1)
    print(f"e2e hybrid slabwise      {sec*1e3:9.2f} ms  "
          f"({H*W/sec/1e3:.0f}k rays/s = {H*W/sec/34133:.1f}x anchor)",
          flush=True)
except Exception as e:  # noqa: BLE001
    print(f"e2e hybrid slabwise      FAILED: {e!r}", flush=True)


# ---- stage 7: slab-loop structure: lax.map (serial) vs unrolled (XLA
# may overlap independent slab programs), and the slab-count sweep ------
def e2e_unrolled(xs, ys, vol3, rb=32, n_slab=N_SLAB):
    sh = H // n_slab
    cts = []
    for k in range(n_slab):
        sl = slice(k * sh * W, (k + 1) * sh * W)
        p = ray_data(xs[sl], ys[sl])[0]
        c = build_color_volume(p, w2cs, intrs, imgs, mode="pallas",
                               row_block=rb)
        cts.append(prt.pack_color_tiles(c, image_hw=(sh, W),
                                        tile_hw=tile_hw))
    ct = jnp.concatenate(cts, axis=0)
    out = prt.tiled_render_v0(wlist, vol3, coords, dirs_t, oy, oxc,
                              dims=(D, HP, WP), tile_shape=(T, R, S),
                              yb=32, xb=32, kb=4, mlp_precision="high",
                              colors=ct)
    return prt.untile_image(out, (H, W), tile_hw)


for ns in (4, 2):
    try:
        def run(xs, ys, vol3, ns=ns):
            return e2e_unrolled(xs, ys, vol3, rb=32, n_slab=ns)
        sec = device_time(run, xs_all, ys_all, vol3_8, iters=3,
                          base_iters=1)
        print(f"e2e unrolled ns={ns}       {sec*1e3:9.2f} ms  "
              f"({H*W/sec/1e3:.0f}k rays/s = {H*W/sec/34133:.1f}x anchor)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"e2e unrolled ns={ns}       FAILED: {e!r}", flush=True)


# colors+pack of all slabs WITHOUT the kernel: is the residual in the
# producer or in the map staging?
def colors_all(xs, ys):
    xs4 = xs.reshape(N_SLAB, SH * W)
    ys4 = ys.reshape(N_SLAB, SH * W)
    ct = jax.lax.map(
        lambda a: colors_packed_slab(a[0], a[1], "pallas", 32), (xs4, ys4))
    return ct.reshape(-1, *ct.shape[2:])


sec = device_time(colors_all, xs_all, ys_all, iters=3, base_iters=1)
print(f"colors+pack all slabs    {sec*1e3:9.2f} ms", flush=True)
