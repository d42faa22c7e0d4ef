"""Device-looped decomposition of the fine-tune step FORWARD (11.2 ms of
the 23.8 ms step — scripts/ablate_finetune_device.py): volume sampling vs
MLP (at each precision) vs colors vs compositing, plus fwd+bwd splits of
the same pieces wrt the trainable leaves.

Run: python scripts/decompose_finetune_fwd.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import H, W, N_RAYS, N_SAMPLES, PAD, make_scene  # noqa: E402
from mvsnerf_tpu.models import init_mlp, init_mvsnet, mvsnet_apply  # noqa: E402
from mvsnerf_tpu.models.nerf_mlp import mlp_apply  # noqa: E402
from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels  # noqa: E402
from mvsnerf_tpu.ops.compositing import raw2outputs  # noqa: E402
from mvsnerf_tpu.ops.encoding import positional_encoding  # noqa: E402
from mvsnerf_tpu.ops.volume_grad import (sample_volume_banded,  # noqa: E402
                                         sample_volume_train)
from mvsnerf_tpu.render.renderer import (build_color_volume,  # noqa: E402
                                         gen_dir_feature)
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

rng = np.random.default_rng(0)
mlp = init_mlp(jax.random.PRNGKey(0), "v0")
mvs = init_mvsnet(jax.random.PRNGKey(1))
imgs, intr, w2cs, projs, near_far = make_scene(rng)
intrs = jnp.broadcast_to(intr, (3, 3, 3))
volume = jax.jit(lambda p, im: mvsnet_apply(p, im, projs, near_far,
                                            pad=PAD)[0])(mvs, imgs)
jax.block_until_ready(volume)
c2w_t = jnp.linalg.inv(w2cs[0])
inv_scale = jnp.asarray([W - 1.0, H - 1.0])

xs = jnp.asarray(rng.uniform(0, W - 1, N_RAYS).astype(np.float32))
ys = jnp.asarray(rng.uniform(0, H - 1, N_RAYS).astype(np.float32))
t = jnp.linspace(0.0, 1.0, N_SAMPLES)
z_vals = jnp.broadcast_to(near_far[0] * (1 - t) + near_far[1] * t,
                          (N_RAYS, N_SAMPLES))
rays_o, rays_d = rays_from_pixels(xs, ys, intr, c2w_t)
rays_o = jnp.broadcast_to(rays_o, (N_RAYS, 3))
pts_world = rays_o[:, None] + z_vals[..., None] * rays_d[:, None]
pts_ndc = get_ndc_coordinate(w2cs[0], intr, pts_world, inv_scale,
                             near=near_far[0], far=near_far[1], pad=PAD)
cos = jnp.linalg.norm(rays_d, axis=-1)
angle = gen_dir_feature(w2cs[0], rays_d / cos[..., None])
jax.block_until_ready(pts_ndc)


def t_ms(name, fn, *args, grad_wrt=None):
    if grad_wrt is not None:
        def run(*a):
            return jax.grad(lambda *g: jnp.sum(fn(*g) ** 2),
                            argnums=grad_wrt)(*a)
    else:
        run = fn
    try:
        sec = device_time(run, *args, iters=10, base_iters=2)
        print(f"{name:38s} {sec*1e3:8.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:38s} FAILED: {e!r}", flush=True)


# ---- volume sampling ----------------------------------------------------
t_ms("vol sample fwd (banded f32, k=4)",
     lambda v: sample_volume_train(v, pts_ndc, 4), volume)
t_ms("vol sample fwd (banded bf16, k=4)",
     lambda v: sample_volume_banded(v, pts_ndc, 4), volume)
t_ms("vol sample fwd+bwd (train, k=4)",
     lambda v: sample_volume_train(v, pts_ndc, 4), volume, grad_wrt=0)

# ---- colors --------------------------------------------------------------
t_ms("colors pallas fwd",
     lambda im: build_color_volume(pts_world, w2cs, intrs, im,
                                   mode="pallas"), imgs)

# ---- PE -------------------------------------------------------------------
t_ms("positional encoding fwd",
     lambda p: positional_encoding(p, 10), pts_ndc)

# ---- MLP at each precision -------------------------------------------------
feats = jnp.concatenate(
    [sample_volume_train(volume, pts_ndc, 4),
     build_color_volume(pts_world, w2cs, intrs, imgs, mode="pallas")],
    axis=-1)
pts_pe = positional_encoding(pts_ndc, 10)
angle_b = jnp.broadcast_to(angle[:, None], (N_RAYS, N_SAMPLES, 3))
x_in = jnp.concatenate([pts_pe, feats, angle_b], axis=-1)
jax.block_until_ready(x_in)

import mvsnerf_tpu.models.nerf_mlp as nm  # noqa: E402
import mvsnerf_tpu.ops.precision as pr  # noqa: E402

orig_prec = nm._MLP_PRECISION
for lvl in ("highest", "high", "default"):
    nm._MLP_PRECISION = pr._LEVELS[lvl]
    # mlp_apply reads the module-global at trace time
    t_ms(f"mlp v0 fwd  [{lvl}]",
         lambda p: mlp_apply(p, x_in, "v0", 63, 3), mlp)
    t_ms(f"mlp v0 f+b  [{lvl}]",
         lambda p: mlp_apply(p, x_in, "v0", 63, 3), mlp, grad_wrt=0)
nm._MLP_PRECISION = orig_prec

# ---- compositing ------------------------------------------------------------
raw = mlp_apply(mlp, x_in, "v0", 63, 3)
jax.block_until_ready(raw)
t_ms("raw2outputs fwd", lambda r: raw2outputs(r, z_vals)["rgb"], raw)
