"""Device-looped A/B of the plane-sweep warp implementations and the
pallas kernel's band size at the generalizable-training shape — the
cost-volume build fwd+bwd is ~57% of the step (114 ms), so this is the
main lever.

  * warp_fwd_mode: pallas (fused kernel) vs packed (corner-packed gather)
    vs banded (dense banded matmul)
  * pallas band: 32 (default) vs 16 vs 8 (FLOPs scale ~linearly with band;
    smaller bands need the per-block y-span contract to still hold)

Usage: python scripts/ab_warp_device.py
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

IMG_H, IMG_W = 512, 640

from mvsnerf_tpu.models import init_mvsnet  # noqa: E402
from mvsnerf_tpu.models.mvsnet import feature_net_apply  # noqa: E402
from mvsnerf_tpu.ops.homography import build_cost_volume  # noqa: E402

rng = np.random.default_rng(2)
params = init_mvsnet(jax.random.PRNGKey(0))
imgs = jnp.asarray(rng.standard_normal((3, IMG_H, IMG_W, 3))
                   .astype(np.float32))
feats = feature_net_apply(params["feature"], imgs)
intr = np.array([[722.0, 0, IMG_W / 2], [0, 722.0, IMG_H / 2],
                 [0, 0, 1]], np.float32)
intr[:2] /= 4
ref = np.eye(4, dtype=np.float32)
ref[:3] = intr @ np.eye(4)[:3]
ref_inv = np.linalg.inv(ref)
projs = []
for i in range(3):
    ang = 0.04 * (i - 1)
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = [0.3 * (i - 1), 0, 0]
    p4 = np.eye(4, dtype=np.float32)
    p4[:3] = intr @ w2c[:3]
    projs.append((p4 @ ref_inv)[:3])
projs = jnp.asarray(np.stack(projs))
depth_values = jnp.linspace(2.125, 4.525, 128)
jax.block_until_ready(feats)


def rep(name, sec):
    print(f"{name:46s} {sec * 1e3:9.2f} ms", flush=True)


def run(mode, band=32):
    def build(feats, imgs):
        cost, _, _ = build_cost_volume(imgs, feats, projs, depth_values,
                                       pad=24, warp_fwd_mode=mode,
                                       warp_band=band)
        return cost

    def loss(feats, imgs):
        return jnp.sum(build(feats, imgs) ** 2)

    try:
        rep(f"build fwd   mode={mode} band={band}",
            device_time(build, feats, imgs, iters=8))
        rep(f"build f+bwd mode={mode} band={band}",
            device_time(jax.grad(loss, argnums=(0,)), feats, imgs,
                        iters=8))
    except Exception as e:  # noqa: BLE001
        print(f"mode={mode} band={band} FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


run("pallas", band=32)
run("pallas", band=16)
run("pallas", band=8)
run("packed")
run("banded")
