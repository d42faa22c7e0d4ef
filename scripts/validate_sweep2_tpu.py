"""Device validation + A/B of the x-windowed sweep kernel
(ops/pallas_sweep2.py) at the production DTU shape (640x512, pad 24,
D=128, V=3):

  1. xband fits on the production geometry (else the kernel is dead code)
  2. forward numerics vs the v1 fused kernel and the exact gather path
  3. gradient numerics (d_feats) vs v1
  4. device-looped full cost-volume build fwd and fwd+bwd: v1 vs xband

Run: python scripts/validate_sweep2_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import make_scene, H, W, PAD  # noqa: E402
from mvsnerf_tpu.ops.homography import (build_cost_volume,  # noqa: E402
                                        plane_sweep_pix_coords)
from mvsnerf_tpu.models.mvsnet import depth_plane_values  # noqa: E402
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

rng = np.random.default_rng(0)
imgs, intr, w2cs, projs, near_far = make_scene(rng)
h, w = H // 4, W // 4
feats = jnp.asarray(rng.standard_normal((3, h, w, 32)).astype(np.float32))
depths = depth_plane_values(near_far[0], near_far[1], 128)
hp, wp = h + 2 * PAD, w + 2 * PAD

# --- 1. fits on the production geometry --------------------------------
from mvsnerf_tpu.ops.pallas_sweep2 import (  # noqa: E402
    tile_lanes, xband_fits, xband_shape_ok)

assert xband_shape_ok(hp, wp, h, w), (hp, wp, h, w)
coords = [plane_sweep_pix_coords(projs[i], depths, h, w, PAD)
          for i in range(1, 3)]
xs = tile_lanes(jnp.stack([c[0] for c in coords]), wp)
ys = tile_lanes(jnp.stack([c[1] for c in coords]), wp)
fits = bool(jax.jit(lambda a, b: xband_fits(a, b, h, w))(xs, ys))
print(f"xband_fits on production geometry: {fits}", flush=True)

spans_x = np.asarray(jnp.max(xs.reshape(2, -1, 128), -1)
                     - jnp.min(xs.reshape(2, -1, 128), -1))
spans_y = np.asarray(jnp.max(ys.reshape(2, -1, 128), -1)
                     - jnp.min(ys.reshape(2, -1, 128), -1))
print(f"tile spans: x mean {spans_x.mean():.1f} max {spans_x.max():.1f} "
      f"(wb=32); y mean {spans_y.mean():.1f} max {spans_y.max():.1f} "
      f"(bandp=16)", flush=True)

# --- 2/3. numerics vs v1 and gather ------------------------------------


def build(mode_env, x):
    # packed16 = the production training layout (dense materializes
    # (D, hp, wp, cc) copies that OOM the grad test at DTU scale)
    os.environ["MVSNERF_SWEEP_IMPL"] = mode_env
    try:
        return jax.jit(lambda f: build_cost_volume(
            imgs, f, projs, depths, pad=PAD, warp_fwd_mode="pallas",
            warp_band=32, cost_layout="packed16")[0])(x)
    finally:
        os.environ.pop("MVSNERF_SWEEP_IMPL", None)


cost_v1 = np.asarray(build("fused", feats))
cost_xb = np.asarray(build("xband", feats))
err = np.abs(cost_xb - cost_v1)
print(f"fwd max|err| xband vs v1: {err.max():.3e} "
      f"(rel {err.max() / max(np.abs(cost_v1).max(), 1e-9):.3e})",
      flush=True)


def gloss(mode_env):
    os.environ["MVSNERF_SWEEP_IMPL"] = mode_env
    try:
        return jax.jit(jax.grad(lambda f: jnp.sum(
            build_cost_volume(imgs, f, projs, depths, pad=PAD,
                              warp_fwd_mode="pallas", warp_band=32,
                              cost_layout="packed16")[0]
            ** 2)))(feats)
    finally:
        os.environ.pop("MVSNERF_SWEEP_IMPL", None)


g_v1 = np.asarray(gloss("fused"))
g_xb = np.asarray(gloss("xband"))
gerr = np.abs(g_xb - g_v1)
print(f"grad max|err| xband vs v1: {gerr.max():.3e} "
      f"(rel {gerr.max() / max(np.abs(g_v1).max(), 1e-9):.3e})", flush=True)

# --- 4. device-looped timings ------------------------------------------
for mode in ("fused", "xband"):
    os.environ["MVSNERF_SWEEP_IMPL"] = mode

    def fwd(f):
        return build_cost_volume(imgs, f, projs, depths, pad=PAD,
                                 warp_fwd_mode="pallas", warp_band=32,
                                 cost_layout="packed16")[0]

    def fwdbwd(f):
        return jax.grad(lambda ff: jnp.sum(fwd(ff) ** 2))(f)

    t_f = device_time(fwd, feats, iters=8, base_iters=2)
    t_fb = device_time(fwdbwd, feats, iters=8, base_iters=2)
    print(f"{mode:6s} cost-volume build (packed16): fwd {t_f * 1e3:7.2f} ms"
          f"   fwd+bwd {t_fb * 1e3:7.2f} ms", flush=True)
    os.environ.pop("MVSNERF_SWEEP_IMPL", None)
