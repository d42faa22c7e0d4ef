"""Locate the xband build's overhead beyond kernel+epilogue: time the
full cost-volume build fwd under both impls in two layouts (packed16 =
production epilogue; cmajor = near-zero epilogue for v1, untile-only for
xband) and difference against the isolated kernel times.

Run: python scripts/probe_xband_overhead.py
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
from mvsnerf_tpu.models.mvsnet import depth_plane_values  # noqa: E402
from mvsnerf_tpu.ops.homography import build_cost_volume  # noqa: E402
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

rng = np.random.default_rng(0)
imgs, intr, w2cs, projs, near_far = make_scene(rng)
h, w = H // 4, W // 4
feats = jnp.asarray(rng.standard_normal((3, h, w, 32)).astype(np.float32))
depths = depth_plane_values(near_far[0], near_far[1], 128)

for mode in ("fused", "xband"):
    for layout in ("cmajor", "packed16"):
        os.environ["MVSNERF_SWEEP_IMPL"] = mode

        def fwd(f):
            return build_cost_volume(imgs, f, projs, depths, pad=PAD,
                                     warp_fwd_mode="pallas", warp_band=32,
                                     cost_layout=layout)[0]

        sec = device_time(fwd, feats, iters=8, base_iters=2)
        print(f"{mode:6s} {layout:9s} build fwd {sec * 1e3:8.2f} ms",
              flush=True)
        os.environ.pop("MVSNERF_SWEEP_IMPL", None)


# --- Pallas repack kernel vs the XLA packed16 permutation (fwd) --------
from mvsnerf_tpu.ops.pallas_sweep2 import (_pack16_xla,  # noqa: E402
                                           pack16_from_tiles)

hp, wp = h + 2 * PAD, w + 2 * PAD
D, ct, cc = 128, 41, 48
dummy = jnp.asarray(rng.standard_normal((cc, D * hp * wp)).astype(np.float32))

ref = jax.jit(lambda x: _pack16_xla(x, D, hp, wp, ct, cc))(dummy)
out = jax.jit(lambda x: pack16_from_tiles(x, D, hp, wp, ct))(dummy)
err = float(jnp.max(jnp.abs(out - ref)))
print(f"repack kernel max|err| vs XLA: {err:.1e}", flush=True)

sec = device_time(lambda x: _pack16_xla(x, D, hp, wp, ct, cc), dummy,
                  iters=8, base_iters=2)
print(f"{'pack16 XLA (isolated)':26s} {sec * 1e3:8.2f} ms", flush=True)
sec = device_time(lambda x: pack16_from_tiles(x, D, hp, wp, ct), dummy,
                  iters=8, base_iters=2)
print(f"{'pack16 PALLAS repack':26s} {sec * 1e3:8.2f} ms", flush=True)


# --- in-build: XLA pack vs the Pallas repack kernel --------------------
for pk in ("xla", "kernel"):
    os.environ["MVSNERF_SWEEP_IMPL"] = "xband"
    if pk == "kernel":
        os.environ["MVSNERF_XBAND_PACK"] = "kernel"

    def fwd2(f):
        return build_cost_volume(imgs, f, projs, depths, pad=PAD,
                                 warp_fwd_mode="pallas", warp_band=32,
                                 cost_layout="packed16")[0]

    sec = device_time(fwd2, feats, iters=8, base_iters=2)
    print(f"xband packed16 build fwd [{pk:6s}] {sec * 1e3:8.2f} ms",
          flush=True)
    os.environ.pop("MVSNERF_SWEEP_IMPL", None)
    os.environ.pop("MVSNERF_XBAND_PACK", None)


# --- in-build fwd+bwd: XLA pack vs Pallas repack+unpack ----------------
for pk in ("xla", "kernel"):
    os.environ["MVSNERF_SWEEP_IMPL"] = "xband"
    if pk == "kernel":
        os.environ["MVSNERF_XBAND_PACK"] = "kernel"

    def fb2(f):
        return jax.grad(lambda ff: jnp.sum(build_cost_volume(
            imgs, ff, projs, depths, pad=PAD, warp_fwd_mode="pallas",
            warp_band=32, cost_layout="packed16")[0] ** 2))(f)

    sec = device_time(fb2, feats, iters=8, base_iters=2)
    print(f"xband packed16 build fwd+bwd [{pk:6s}] {sec * 1e3:8.2f} ms",
          flush=True)
    os.environ.pop("MVSNERF_SWEEP_IMPL", None)
    os.environ.pop("MVSNERF_XBAND_PACK", None)
