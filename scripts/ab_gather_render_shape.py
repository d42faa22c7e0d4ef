"""Bisect the round-4 exact-render regression (BENCH r3 130.4k -> r4
117.0k rays/s): round 4 flipped `volume_gather_impl auto` -> pallas2 on
TPU, but the win was only ever measured at the 1024-ray TRAINING shape;
the render bench's 16384-ray chunks (fast_volume_grad=True) inherited
the flip unmeasured (VERDICT r4 weak 1 / task 3).

Measures isolated forward time of the three gather realizations at both
shapes with full-image-structured rays (render chunks = consecutive
pixel rows) and random-pixel rays (training batches):

    python scripts/ab_gather_render_shape.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import make_scene, H, W, PAD, N_SAMPLES  # noqa: E402
from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels  # noqa: E402
from mvsnerf_tpu.ops.interp import index_point_feature  # noqa: E402
from mvsnerf_tpu.ops.pallas_volgather2 import sample_volume_sorted  # noqa: E402
from mvsnerf_tpu.ops.volume_grad import sample_volume_train  # noqa: E402
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

rng = np.random.default_rng(0)
imgs, intr, w2cs, projs, near_far = make_scene(rng)
c2w_t = jnp.linalg.inv(w2cs[0])
inv_scale = jnp.asarray([W - 1.0, H - 1.0])
D, HP, WP, C = 128, 176, 208, 8
BK = 4

vol = jnp.asarray(rng.standard_normal((D, HP, WP, C)).astype(np.float32))


@jax.jit
def batch_ndc(xs, ys):
    n = xs.shape[0]
    t = jnp.linspace(0.0, 1.0, N_SAMPLES)
    z = near_far[0] * (1 - t) + near_far[1] * t
    zv = jnp.broadcast_to(z, (n, N_SAMPLES))
    rays_o, rays_d = rays_from_pixels(xs, ys, intr, c2w_t)
    rays_o = jnp.broadcast_to(rays_o, (n, 3))
    pts = rays_o[:, None] + zv[..., None] * rays_d[:, None]
    return get_ndc_coordinate(w2cs[0], intr, pts, inv_scale,
                              near=near_far[0], far=near_far[1], pad=PAD)


def shapes():
    # render chunk: the FIRST 16384 full-image pixels (25.6 rows)
    gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
    yield ("render_chunk_16384",
           jnp.asarray(gx.reshape(-1)[:16384]),
           jnp.asarray(gy.reshape(-1)[:16384]))
    # training batch: 1024 random pixels
    yield ("train_batch_1024",
           jnp.asarray(rng.uniform(0, W - 1, 1024).astype(np.float32)),
           jnp.asarray(rng.uniform(0, H - 1, 1024).astype(np.float32)))


IMPLS = {
    "plain_gather": lambda v, n: index_point_feature(v, n),
    "banded": lambda v, n: sample_volume_train(v, n, BK),
    "pallas2": lambda v, n: sample_volume_sorted(v, n, BK),
}

for tag, xs, ys in shapes():
    ndc = batch_ndc(xs, ys)
    jax.block_until_ready(ndc)
    print(f"== {tag} (n={xs.shape[0]}, S={N_SAMPLES})", flush=True)
    for name, fn in IMPLS.items():
        try:
            sec = device_time(fn, vol, ndc, iters=12, base_iters=2)
            print(f"  {name:14s} fwd {sec * 1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:14s} FAILED: {e!r}", flush=True)
