"""A/B the fine-tune step's per-sample color reprojection on device.

The fine-tune step has been capped at ~3.6-3.8x for three rounds; the
color gather was measured at ~12 ms of the ~24 ms step (round-1 decomp).
build_color_volume now has a banded-MXU pallas mode (auto on TPU) — this
script checks (a) whether the band contract actually holds for random-ray
training batches on the bench scene, (b) the step time under
gather / pallas(rb=1) / band sweep, (c) the isolated color cost fwd+bwd.

Run: python scripts/ab_finetune_colors_device.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import make_scene, H, W, N_RAYS, N_SAMPLES  # noqa: E402
from mvsnerf_tpu.models import init_mlp, init_mvsnet, mvsnet_apply  # noqa: E402
from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels  # noqa: E402
from mvsnerf_tpu.ops.pallas_sweep import sweep_fits_band  # noqa: E402
from mvsnerf_tpu.render import render_rays  # noqa: E402
from mvsnerf_tpu.render.renderer import build_color_volume  # noqa: E402
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

rng = np.random.default_rng(0)
mlp = init_mlp(jax.random.PRNGKey(0), "v0")
mvs = init_mvsnet(jax.random.PRNGKey(1))
imgs, intr, w2cs, projs, near_far = make_scene(rng)
intrs = jnp.broadcast_to(intr, (3, 3, 3))
volume = jax.jit(lambda p, im: mvsnet_apply(p, im, projs, near_far,
                                            pad=24)[0])(mvs, imgs)
jax.block_until_ready(volume)
params = {"mlp": mlp, "volume": volume}
c2w_t = jnp.linalg.inv(w2cs[0])
inv_scale = jnp.asarray([W - 1.0, H - 1.0])

xs = jnp.asarray(rng.uniform(0, W - 1, N_RAYS).astype(np.float32))
ys = jnp.asarray(rng.uniform(0, H - 1, N_RAYS).astype(np.float32))
target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
t = jnp.linspace(0.0, 1.0, N_SAMPLES)
z_row = near_far[0] * (1 - t) + near_far[1] * t
z_vals = jnp.broadcast_to(z_row, (N_RAYS, N_SAMPLES))


def ray_pts(xs, ys):
    rays_o, rays_d = rays_from_pixels(xs, ys, intr, c2w_t)
    rays_o = jnp.broadcast_to(rays_o, (N_RAYS, 3))
    pts = rays_o[:, None] + z_vals[..., None] * rays_d[:, None]
    return pts, rays_d


pts, rays_d = jax.jit(ray_pts)(xs, ys)
jax.block_until_ready(pts)

# (a) does the band contract hold for random rays? (rb x band sweep)
for rb in (1, 8):
    for band in (16, 32, 64):
        fits = []
        for v in range(3):
            ndc = get_ndc_coordinate(w2cs[v], intrs[v], pts, inv_scale,
                                     near=1.0, far=2.0)
            grid = jnp.clip(ndc[..., :2] * 2.0 - 1.0, -1.0, 1.0)
            fits.append(bool(sweep_fits_band(grid, H, rb, band)))
        print(f"band contract rb={rb} band={band}: {fits}", flush=True)

# (b) isolated color cost fwd and fwd+bwd (wrt nothing - imgs constant)
for mode, rb in (("gather", 1), ("pallas", 1), ("pallas", 8)):
    def colors(p, mode=mode, rb=rb):
        return build_color_volume(p, w2cs, intrs, imgs, mode=mode,
                                  row_block=rb)
    sec = device_time(colors, pts, iters=20, base_iters=2)
    print(f"colors {mode} rb={rb}: fwd {sec*1e3:7.3f} ms", flush=True)

# (c) full fine-tune step under each mode (env override threads through
# build_color_volume's call site via mode injection)
import mvsnerf_tpu.render.renderer as rmod

orig_bcv = rmod.build_color_volume


def step_time(mode, rb):
    def bcv(pw, w2, ins, im, with_mask=True, img_feats=None, **kw):
        return orig_bcv(pw, w2, ins, im, with_mask=with_mask,
                        img_feats=img_feats, mode=mode, row_block=rb)
    rmod.build_color_volume = bcv
    try:
        import optax
        opt = optax.adam(5e-4)

        def loss_fn(p, key):
            xs_ = jax.random.uniform(key, (N_RAYS,), maxval=W - 1.0)
            ys_ = jax.random.uniform(jax.random.fold_in(key, 1), (N_RAYS,),
                                     maxval=H - 1.0)
            pts_, rays_d_ = ray_pts(xs_, ys_)
            pts_ndc = get_ndc_coordinate(w2cs[0], intr, pts_, inv_scale,
                                         near=near_far[0], far=near_far[1],
                                         pad=24)
            out = render_rays(p["mlp"], p["volume"], pts_, pts_ndc, z_vals,
                              rays_d_, w2c_ref=w2cs[0], w2cs=w2cs,
                              intrinsics=intrs, imgs=imgs,
                              fast_volume_grad=True, volume_band_k=4)
            return jnp.mean((out["rgb"] - target) ** 2)

        opt_state = opt.init(params)

        def update(state, key):
            p, o = state
            grads = jax.grad(loss_fn)(p, key)
            updates, o = opt.update(grads, o, p)
            return optax.apply_updates(p, updates), o

        def stepper(state, i):
            return update(state, jax.random.fold_in(jax.random.PRNGKey(0),
                                                    i))

        from bench import _scan_rate
        sec, _ = _scan_rate(stepper, (params, opt_state), n_short=5,
                            n_long=45)
        print(f"finetune step [{mode} rb={rb}]: {sec*1e3:7.3f} ms "
              f"= {N_RAYS/sec/1e3:.1f}k rays/s", flush=True)
    finally:
        rmod.build_color_volume = orig_bcv


for mode, rb in (("gather", 1), ("pallas", 1), ("pallas", 8)):
    step_time(mode, rb)
