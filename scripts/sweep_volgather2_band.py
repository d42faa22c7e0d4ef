"""Sweep the v2 gather's z band (band_k) and y band (hb) on the real
fine-tune batch: stratified sampling bounds each column's z span by ~one
sample spacing, so the kernel may run at band_k=2 (band 3) instead of the
banded path's safe 4 — a linear FLOP cut in both directions. The fits
check validates the contract on the actual coordinates; production falls
back to the SAFE band when it fails.

Run: python scripts/sweep_volgather2_band.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import make_scene, H, W, PAD, N_RAYS, N_SAMPLES  # noqa: E402
from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels  # noqa: E402
from mvsnerf_tpu.ops.interp import grid_sample_3d  # noqa: E402
from mvsnerf_tpu.ops.pallas_volgather2 import (  # noqa: E402
    sample_volume_pallas2, sort_rays_by_y, volgather2_fits)
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

rng = np.random.default_rng(0)
imgs, intr, w2cs, projs, near_far = make_scene(rng)
c2w_t = jnp.linalg.inv(w2cs[0])
inv_scale = jnp.asarray([W - 1.0, H - 1.0])
D, HP, WP, C = 128, 176, 208, 8

xs = jnp.asarray(rng.uniform(0, W - 1, N_RAYS).astype(np.float32))
ys = jnp.asarray(rng.uniform(0, H - 1, N_RAYS).astype(np.float32))


@jax.jit
def batch_ndc(key):
    t = jnp.linspace(0.0, 1.0, N_SAMPLES)
    z = near_far[0] * (1 - t) + near_far[1] * t
    zv = jnp.broadcast_to(z, (N_RAYS, N_SAMPLES))
    mids = 0.5 * (zv[:, 1:] + zv[:, :-1])
    upper = jnp.concatenate([mids, zv[:, -1:]], -1)
    lower = jnp.concatenate([zv[:, :1], mids], -1)
    zv = lower + (upper - lower) * jax.random.uniform(key, zv.shape)
    rays_o, rays_d = rays_from_pixels(xs, ys, intr, c2w_t)
    rays_o = jnp.broadcast_to(rays_o, (N_RAYS, 3))
    pts = rays_o[:, None] + zv[..., None] * rays_d[:, None]
    return get_ndc_coordinate(w2cs[0], intr, pts, inv_scale,
                              near=near_far[0], far=near_far[1], pad=PAD)


# contract stability: does (k, hb) fit across MANY stratified batches?
# ONE jitted program checks all configs on all batches (eager argsort/
# take per batch through the axon tunnel costs 100ms+ per dispatch)
CFGS = [(bk, hb) for bk in (2, 3, 4) for hb in (32, 48)]


@jax.jit
def fits_all(keys):
    def one(key):
        n = batch_ndc(key)
        ns = jnp.take(n, sort_rays_by_y(n)[0], axis=0)
        return jnp.stack([volgather2_fits(ns, (D, HP, WP, C), bk, hb, 256)
                          for bk, hb in CFGS])
    return jnp.all(jax.lax.map(one, keys), axis=0)


oks = np.asarray(fits_all(jax.random.split(jax.random.PRNGKey(7), 20)))
for (bk, hb), ok in zip(CFGS, oks):
    print(f"fits k={bk} hb={hb} over 20 batches: {bool(ok)}", flush=True)

ndc = batch_ndc(jax.random.PRNGKey(0))
order, inv = sort_rays_by_y(ndc)
ndc_s = jnp.take(ndc, order, axis=0)
vol = jnp.asarray(rng.standard_normal((D, HP, WP, C)).astype(np.float32))
ref = jax.jit(lambda v, n: grid_sample_3d(v, n * 2 - 1))(vol, ndc_s)
scale = float(jnp.max(jnp.abs(ref)))

for bk in (2, 3, 4):
    for hb in (32, 48):
        def v2(v, nd, bk=bk, hb=hb):
            return sample_volume_pallas2(v, nd, bk, hb, 256)
        try:
            out = jax.jit(v2)(vol, ndc_s)
            err = float(jnp.max(jnp.abs(out - ref)))
            fwd = device_time(jax.jit(v2), vol, ndc_s,
                              iters=20, base_iters=2) * 1e3

            def fb(v, nd, bk=bk, hb=hb):
                return jax.value_and_grad(
                    lambda vv: 0.5 * jnp.sum(v2(vv, nd) ** 2))(v)
            fbm = device_time(jax.jit(fb), vol, ndc_s,
                              iters=20, base_iters=2) * 1e3
            print(f"k={bk} hb={hb}: fwd {fwd:6.3f} ms  fwd+bwd {fbm:6.3f} "
                  f"ms  max|err| {err:.3e} (scale {scale:.2f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"k={bk} hb={hb} FAILED: {e!r}"[:300], flush=True)
