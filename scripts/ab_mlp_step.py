"""In-step device A/B of the training MLP implementations: the FULL
fine-tune train step (render + MSE + backward + Adam, bench.py's
workload) with --mlp_impl in {xla, pallas, pallas_high}, volume gather
pinned to the production winner (pallas2).

Run: python scripts/ab_mlp_step.py [xla pallas pallas_high ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import make_scene, _scan_rate, H, W, PAD, N_RAYS, N_SAMPLES  # noqa: E402
from mvsnerf_tpu.models import init_mlp, init_mvsnet, mvsnet_apply  # noqa: E402
from mvsnerf_tpu.render import render_rays  # noqa: E402
from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels  # noqa: E402

IMPLS = sys.argv[1:] or ["xla", "pallas", "pallas_high"]

rng = np.random.default_rng(0)
mlp = init_mlp(jax.random.PRNGKey(0), "v0")
mvs = init_mvsnet(jax.random.PRNGKey(1))
imgs, intr, w2cs, projs, near_far = make_scene(rng)
v = imgs.shape[0]
intrs = jnp.broadcast_to(intr, (v, 3, 3))
volume = jax.jit(lambda p, im: mvsnet_apply(
    p, im, projs, near_far, pad=PAD)[0])(mvs, imgs)
jax.block_until_ready(volume)
print(f"volume {volume.shape}; devices {jax.devices()}", flush=True)

params0 = {"mlp": mlp, "volume": volume}
c2w_t = jnp.linalg.inv(w2cs[0])
inv_scale = jnp.asarray([W - 1.0, H - 1.0])
xs = jnp.asarray(rng.uniform(0, W - 1, N_RAYS).astype(np.float32))
ys = jnp.asarray(rng.uniform(0, H - 1, N_RAYS).astype(np.float32))
target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
key = jax.random.PRNGKey(0)
opt = optax.adam(5e-4)

for impl in IMPLS:
    def loss_fn(params, k, impl=impl):
        t = jnp.linspace(0.0, 1.0, N_SAMPLES)
        z = near_far[0] * (1 - t) + near_far[1] * t
        z_vals = jnp.broadcast_to(z, (N_RAYS, N_SAMPLES))
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], -1)
        lower = jnp.concatenate([z_vals[:, :1], mids], -1)
        z_vals = lower + (upper - lower) * jax.random.uniform(k, z_vals.shape)
        rays_o, rays_d = rays_from_pixels(xs, ys, intr, c2w_t)
        rays_o = jnp.broadcast_to(rays_o, (N_RAYS, 3))
        pts = rays_o[:, None] + z_vals[..., None] * rays_d[:, None]
        pts_ndc = get_ndc_coordinate(w2cs[0], intr, pts, inv_scale,
                                     near=near_far[0], far=near_far[1],
                                     pad=PAD)
        out = render_rays(params["mlp"], params["volume"], pts, pts_ndc,
                          z_vals, rays_d, w2c_ref=w2cs[0], w2cs=w2cs,
                          intrinsics=intrs, imgs=imgs,
                          fast_volume_grad=True, volume_band_k=4,
                          volume_gather_impl="pallas2", mlp_impl=impl)
        return jnp.mean((out["rgb"] - target) ** 2)

    def update(state, i, impl=impl):
        p, o = state
        grads = jax.grad(loss_fn)(p, jax.random.fold_in(key, i))
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    t0 = time.perf_counter()
    sec, reps = _scan_rate(update, (params0, opt.init(params0)),
                           n_short=5, n_long=45)
    print(f"{impl:12s} step {sec*1e3:7.3f} ms = {N_RAYS/sec:8.0f} rays/s "
          f"(reps {[f'{N_RAYS/r:.0f}' for r in reps]}, "
          f"wall {time.perf_counter()-t0:.0f}s)", flush=True)
