"""On-device A/B of the round-2 kernels with DEVICE-LOOPED timing
(mvsnerf_tpu/utils/devtime.py — per-dispatch overhead through the axon
tunnel is 100 ms - 9 s, so Python-loop timing measures the tunnel):

  * CostRegNet U-Net: packed vs dband (fwd, fwd+bwd) at the
    generalizable-training shape 41 x 128 x 176 x 208
  * FeatureNet: plain vs packed (fwd, fwd+bwd) at 3x512x640
  * fused sweep fwd+bwd: MVSNERF_SWEEP_BWD_GROUPS in {1, 4, 8, 16}

Usage: python scripts/ab_kernels_device.py [--section unet|featurenet|sweep]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.devtime import device_time
from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

ap = argparse.ArgumentParser()
ap.add_argument("--section", default="all",
                choices=["all", "unet", "featurenet", "sweep"])
ap.add_argument("--iters", type=int, default=8)
a = ap.parse_args()
print(jax.devices(), flush=True)

D, H, W, CIN = 128, 176, 208, 41
IMG_H, IMG_W = 512, 640


def report(name, sec):
    print(f"{name:46s} {sec * 1e3:9.2f} ms", flush=True)
    return sec * 1e3


def section_unet():
    from mvsnerf_tpu.models import init_mvsnet
    from mvsnerf_tpu.models.costreg_packed import cost_reg_packed_apply
    from mvsnerf_tpu.ops import pallas_costreg as pc

    rng = np.random.default_rng(0)
    params = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]
    x_cl = jnp.asarray(rng.standard_normal((1, D, H, W, CIN))
                       .astype(np.float32))
    x_cm = jnp.transpose(x_cl[0], (3, 0, 1, 2))
    jax.block_until_ready(x_cm)

    out = {}
    out["packed fwd"] = report(
        "packed U-Net fwd",
        device_time(lambda p, x: cost_reg_packed_apply(p, x)[0],
                    params, x_cl, iters=a.iters))
    out["dband fwd"] = report(
        "dband U-Net fwd (f32)",
        device_time(lambda p, x: pc.cost_reg_dband_apply(p, x),
                    params, x_cm, iters=a.iters))

    def loss_packed(p, x):
        return jnp.sum(cost_reg_packed_apply(p, x) ** 2)

    def loss_db(p, x):
        return jnp.sum(pc.cost_reg_dband_apply(p, x) ** 2)

    out["packed fwd+bwd"] = report(
        "packed U-Net fwd+bwd",
        device_time(jax.grad(loss_packed, argnums=(0, 1)), params, x_cl,
                    iters=a.iters))
    out["dband fwd+bwd"] = report(
        "dband U-Net fwd+bwd (f32)",
        device_time(jax.grad(loss_db, argnums=(0, 1)), params, x_cm,
                    iters=a.iters))
    return out


def section_featurenet():
    from mvsnerf_tpu.models import init_mvsnet
    from mvsnerf_tpu.models.mvsnet import feature_net_apply
    from mvsnerf_tpu.models.featurenet_packed import feature_net_packed_apply

    rng = np.random.default_rng(1)
    params = init_mvsnet(jax.random.PRNGKey(0))["feature"]
    imgs = jnp.asarray(rng.standard_normal((3, IMG_H, IMG_W, 3))
                       .astype(np.float32))
    jax.block_until_ready(imgs)

    report("FeatureNet plain fwd",
           device_time(feature_net_apply, params, imgs, iters=a.iters))
    report("FeatureNet packed fwd",
           device_time(feature_net_packed_apply, params, imgs,
                       iters=a.iters))

    def loss_plain(p, x):
        return jnp.sum(feature_net_apply(p, x) ** 2)

    def loss_packed(p, x):
        return jnp.sum(feature_net_packed_apply(p, x) ** 2)

    report("FeatureNet plain fwd+bwd",
           device_time(jax.grad(loss_plain, argnums=(0, 1)), params, imgs,
                       iters=a.iters))
    report("FeatureNet packed fwd+bwd",
           device_time(jax.grad(loss_packed, argnums=(0, 1)), params, imgs,
                       iters=a.iters))


def section_sweep(groups_list=(1, 4, 8, 16)):
    """Times the full cost-volume build fwd+bwd (fused pallas warp) per
    MVSNERF_SWEEP_BWD_GROUPS (read at trace time by ops/homography.py)."""
    from mvsnerf_tpu.models import init_mvsnet
    from mvsnerf_tpu.models.mvsnet import feature_net_apply
    from mvsnerf_tpu.ops.homography import build_cost_volume

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

    def loss(feats, imgs):
        cost, _, _ = build_cost_volume(imgs, feats, projs, depth_values,
                                       pad=24, warp_fwd_mode="pallas")
        return jnp.sum(cost ** 2)

    for g in groups_list:
        os.environ["MVSNERF_SWEEP_BWD_GROUPS"] = str(g)
        sec = device_time(jax.grad(loss, argnums=(0,)), feats, imgs,
                          iters=a.iters)
        report(f"sweep build fwd+bwd groups={g}", sec)


if a.section in ("all", "unet"):
    section_unet()
if a.section in ("all", "featurenet"):
    section_featurenet()
if a.section in ("all", "sweep"):
    section_sweep()
