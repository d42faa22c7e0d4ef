"""Locate the ~195 ms of the hybrid e2e render not accounted for by its
measured stages (kernel 618 + colors 99 + pack 40 + ray_data ~20 vs
e2e slabwise 969): time (a) the color-producer pipeline alone (lax.map
over slabs), (b) the kernel fed a PRE-STAGED packed color tensor, and
(c) the slabwise e2e at n_slab in {4, 2} — if (a) + (b) << (c), the
composition (layout handoff of the ~1 GB streamed tensor between the
producer map and the kernel) is the residual.

Run: python scripts/probe_hybrid_residual.py
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
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

rng = np.random.default_rng(0)
mlp = init_mlp(jax.random.PRNGKey(0), "v0")
imgs, intr, w2cs, projs, near_far = make_scene(rng)
intrs = jnp.broadcast_to(intr, (3, 3, 3))
D, HP, WP = 128, 140, 172
vol8 = jnp.asarray(rng.uniform(-1, 1, (D, HP, WP, 8)).astype(np.float32))
w2c_ref = w2cs[0]
c2w_ref = jnp.linalg.inv(w2c_ref)
inv_scale = jnp.asarray([W - 1.0, H - 1.0])
tile_hw = (32, 64)
RB = 32

gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
xs_all = jnp.asarray(gx.reshape(-1))
ys_all = jnp.asarray(gy.reshape(-1))


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


pts, pts_ndc, angle, z_vals = jax.jit(ray_data)(xs_all, ys_all)
xyz_t, coords, dirs_t = prt.pack_tiles(pts_ndc, angle, z_vals,
                                       image_hw=(H, W), tile_hw=tile_hw)
T, R, S = xyz_t.shape[:3]
oy, oxc, _, ok = prt.plan_tiles(xyz_t, dims=(D, HP, WP),
                                tile_shape=(T, R, S), yb=32, kb=4, xb=32)
assert bool(ok)
wlist = prt.pack_v0_weights_padded(mlp)
del xyz_t, pts, pts_ndc
jax.block_until_ready((coords, dirs_t))


def slab_pipeline(xs, ys, n_slab):
    sh = H // n_slab
    xs4 = xs.reshape(n_slab, sh * W)
    ys4 = ys.reshape(n_slab, sh * W)

    def one(a):
        p, pn, ang, zv = ray_data(a[0], a[1])
        c = build_color_volume(p, w2cs, intrs, imgs, mode="pallas",
                               row_block=RB)
        ct1 = prt.pack_color_tiles(c, image_hw=(sh, W), tile_hw=tile_hw)
        _, co1, dt1 = prt.pack_tiles(pn, ang, zv, image_hw=(sh, W),
                                     tile_hw=tile_hw)
        return ct1, co1, dt1

    ct, co, dt = jax.lax.map(one, (xs4, ys4))
    return (ct.reshape(-1, *ct.shape[2:]), co.reshape(-1, *co.shape[2:]),
            dt.reshape(-1, *dt.shape[2:]))


def kernel(co, dt, vol3, ct):
    out = prt.tiled_render_v0(wlist, vol3, co, dt, oy, oxc,
                              dims=(D, HP, WP), tile_shape=(T, R, S),
                              yb=32, xb=32, kb=4, mlp_precision="high",
                              colors=ct)
    return prt.untile_image(out, (H, W), tile_hw)


vol3_8 = prt.prepare_volume(vol8)

# (a) producer alone
for ns in (4, 2):
    sec = device_time(lambda a, b, ns=ns: slab_pipeline(a, b, ns)[0],
                      xs_all, ys_all, iters=3, base_iters=1)
    print(f"producer (colors+pack+coords) ns={ns}  {sec*1e3:8.2f} ms",
          flush=True)

# (b) kernel on pre-staged colors
ct0, co0, dt0 = jax.jit(lambda a, b: slab_pipeline(a, b, 4))(xs_all, ys_all)
jax.block_until_ready(ct0)
sec = device_time(kernel, co0, dt0, vol3_8, ct0, iters=3, base_iters=1)
print(f"kernel (pre-staged colors)          {sec*1e3:8.2f} ms", flush=True)

# (c) composed e2e at both slab counts
for ns in (4, 2):
    def e2e(xs, ys, vol3, ns=ns):
        ct, co, dt = slab_pipeline(xs, ys, ns)
        return kernel(co, dt, vol3, ct)
    sec = device_time(e2e, xs_all, ys_all, vol3_8, iters=3, base_iters=1)
    print(f"e2e slabwise ns={ns}                   {sec*1e3:8.2f} ms  "
          f"({H*W/sec/1e3:.0f}k rays/s = {H*W/sec/34133:.2f}x)", flush=True)
