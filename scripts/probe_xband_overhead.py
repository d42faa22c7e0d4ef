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
