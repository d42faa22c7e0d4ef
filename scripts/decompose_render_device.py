"""Device-looped decomposition of the EXACT full-image render path
(render/renderer.py) at 640x512, N_samples=128 — where do the ~3 s go?

Times each stage in isolation over one 16384-ray chunk (the lax.map body
of render_image_chunked), then scales to the 20-chunk image:

  * ray gen + NDC
  * encoding-volume trilinear fetch (index_point_feature)
  * 3-view color reprojection (build_color_volume)
  * positional encoding + MLP
  * compositing
  * the full chunk fn (sanity: sum of parts vs whole)

Usage: python scripts/decompose_render_device.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.devtime import device_time
from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()
print(jax.devices(), flush=True)

H, W, PAD, S = 512, 640, 24, 128
CHUNK = 16384
N_CHUNKS = H * W // CHUNK

from bench import make_scene  # noqa: E402
from mvsnerf_tpu.models import init_mlp, init_mvsnet, mvsnet_apply  # noqa: E402
from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels  # noqa: E402
from mvsnerf_tpu.ops.interp import index_point_feature  # noqa: E402
from mvsnerf_tpu.ops.encoding import positional_encoding  # noqa: E402
from mvsnerf_tpu.models.nerf_mlp import mlp_apply  # noqa: E402
from mvsnerf_tpu.ops.compositing import raw2outputs  # noqa: E402
from mvsnerf_tpu.render.renderer import (build_color_volume,  # noqa: E402
                                         gen_dir_feature, render_rays)

rng = np.random.default_rng(0)
CKPT = "/root/reference/ckpts/mvsnerf-v0.tar"
if os.path.exists(CKPT):
    from mvsnerf_tpu.io import load_reference_checkpoint
    ck = load_reference_checkpoint(CKPT)
    mlp, mvs = ck["mlp"], ck["mvsnet"]
else:
    mlp = init_mlp(jax.random.PRNGKey(0), "v0")
    mvs = init_mvsnet(jax.random.PRNGKey(1))

imgs, intr, w2cs, projs, near_far = make_scene(rng)
intrs = jnp.broadcast_to(intr, (3, 3, 3))
volume = jax.jit(lambda p, im: mvsnet_apply(
    p, im, projs, near_far, pad=PAD)[0])(mvs, imgs)
jax.block_until_ready(volume)

c2w_t = jnp.linalg.inv(w2cs[0])
inv_scale = jnp.asarray([W - 1.0, H - 1.0])
t = jnp.linspace(0.0, 1.0, S)
z_row = near_far[0] * (1 - t) + near_far[1] * t

xs = jnp.asarray(rng.uniform(0, W - 1, CHUNK).astype(np.float32))
ys = jnp.asarray(rng.uniform(0, H - 1, CHUNK).astype(np.float32))


def ray_data(xs, ys):
    rays_o, rays_d = rays_from_pixels(xs, ys, intr, c2w_t)
    rays_o = jnp.broadcast_to(rays_o, (CHUNK, 3))
    z_vals = jnp.broadcast_to(z_row, (CHUNK, S))
    pts = rays_o[:, None] + z_vals[..., None] * rays_d[:, None]
    pts_ndc = get_ndc_coordinate(w2cs[0], intr, pts, inv_scale,
                                 near=near_far[0], far=near_far[1], pad=PAD)
    return pts, pts_ndc, z_vals, rays_d


pts, pts_ndc, z_vals, rays_d = jax.jit(ray_data)(xs, ys)
feats20 = jnp.zeros((CHUNK, S, 20), jnp.float32)
cos = jnp.linalg.norm(rays_d, axis=-1)
angle = gen_dir_feature(w2cs[0], rays_d / cos[:, None])
pe = positional_encoding(pts_ndc, 10)
mlp_in = jnp.concatenate(
    [pe, feats20, jnp.broadcast_to(angle[:, None], (CHUNK, S, 3))], -1)
raw = jnp.zeros((CHUNK, S, 4), jnp.float32)
jax.block_until_ready((pts, mlp_in))


def rep(name, sec):
    print(f"{name:42s} {sec * 1e3:9.2f} ms/chunk "
          f"{sec * N_CHUNKS * 1e3:9.1f} ms/image", flush=True)


rep("ray gen + NDC", device_time(ray_data, xs, ys, iters=16))
rep("volume trilinear fetch",
    device_time(lambda v, p: index_point_feature(v, p), volume, pts_ndc,
                iters=16))
rep("3-view color reprojection",
    device_time(lambda p: build_color_volume(p, w2cs, intrs, imgs),
                pts, iters=16))
rep("PE(xyz)", device_time(lambda p: positional_encoding(p, 10), pts_ndc,
                           iters=16))
rep("MLP fwd (v0)",
    device_time(lambda m, x: mlp_apply(m, x, "v0", 63, 3), mlp, mlp_in,
                iters=16))
rep("compositing",
    device_time(lambda r, z: raw2outputs(r, z), raw, z_vals, iters=16))


def full_chunk(xs, ys):
    pts, pts_ndc, z_vals, rays_d = ray_data(xs, ys)
    out = render_rays(mlp, volume, pts, pts_ndc, z_vals, rays_d,
                      w2c_ref=w2cs[0], w2cs=w2cs, intrinsics=intrs,
                      imgs=imgs)
    return out["rgb"], out["depth"]


rep("FULL chunk", device_time(full_chunk, xs, ys, iters=8))
