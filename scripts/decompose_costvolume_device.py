"""Device-looped decomposition of the generalizable step's cost-volume
build (the 114 ms that is ~57% of the 190 ms step) at DTU production
shape: which of {coords, fused sweep fwd, sweep bwd, packed16 relayout,
side-output assembly} actually costs.

Run: python scripts/decompose_costvolume_device.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import make_scene  # noqa: E402
from mvsnerf_tpu.models import init_mvsnet  # noqa: E402
from mvsnerf_tpu.models.mvsnet import (depth_plane_values,  # noqa: E402
                                       feature_net_apply)
from mvsnerf_tpu.ops.homography import (build_cost_volume,  # noqa: E402
                                        plane_sweep_pix_coords)
from mvsnerf_tpu.ops.pallas_sweep import (_Static,  # noqa: E402
                                          cost_volume_fused_pallas)
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

H, W, PAD, D = 512, 640, 24, 128
h, w = H // 4, W // 4
HP, WP = h + 2 * PAD, w + 2 * PAD

rng = np.random.default_rng(0)
mvs = init_mvsnet(jax.random.PRNGKey(0))
imgs, intr, w2cs, projs, near_far = make_scene(rng)
feats = jax.jit(lambda p, im: feature_net_apply(p, im))(mvs["feature"],
                                                        imgs)
jax.block_until_ready(feats)
depth_values = depth_plane_values(float(near_far[0]), float(near_far[1]), D)
V, C, Ci = 3, 32, 3
cp = -(-(C + Ci) // 8) * 8
cc = -(-(Ci * V + C) // 8) * 8
RB, BAND = 8, 16
BPP, M = HP // RB, RB * WP

print(f"shape: D={D} hp={HP} wp={WP} cp={cp} cc={cc} rb={RB} band={BAND} "
      f"blocks={D * BPP}", flush=True)

# ---- stage 0: coords ---------------------------------------------------
def coords_fn(projs):
    cs = [plane_sweep_pix_coords(projs[i], depth_values, h, w, PAD)
          for i in range(1, V)]
    return jnp.stack([c[0] for c in cs]), jnp.stack([c[1] for c in cs])


sec = device_time(coords_fn, projs, iters=10, base_iters=2)
print(f"coords (2 views)              {sec*1e3:8.2f} ms", flush=True)
xs, ys = jax.jit(coords_fn)(projs)

# ---- kernel inputs -----------------------------------------------------
from mvsnerf_tpu.ops.interp import interpolate_bilinear_resize  # noqa: E402

imgs_l = jax.vmap(lambda im: interpolate_bilinear_resize(im, h, w))(imgs)
ref_feat = jnp.pad(feats[0], ((PAD, PAD), (PAD, PAD), (0, 0)))
ref_img = jnp.pad(imgs_l[0], ((PAD, PAD), (PAD, PAD), (0, 0)))
srcs_cw = jnp.stack([
    jnp.pad(jnp.concatenate([feats[i], imgs_l[i]], -1),
            ((0, 0), (0, 0), (0, cp - C - Ci))).transpose(0, 2, 1)
    for i in range(1, V)])
ref_p = jnp.pad(jnp.concatenate([ref_feat, ref_img], -1),
                ((0, 0), (0, 0), (0, cp - C - Ci)))
refb = ref_p.reshape(BPP, RB, WP, cp).transpose(0, 3, 1, 2).reshape(
    BPP, cp, M)
static = _Static(band=BAND, m=M, bpp=BPP, c_feat=C, c_img=Ci, cc=cc,
                 bwd_groups=1)
jax.block_until_ready((srcs_cw, refb))

# ---- stage 1: fused sweep kernel ---------------------------------------
def sweep_fwd(srcs_cw, refb, xs, ys):
    return cost_volume_fused_pallas(srcs_cw, refb, xs, ys, static)


sec = device_time(sweep_fwd, srcs_cw, refb, xs, ys, iters=6, base_iters=2)
print(f"fused sweep fwd               {sec*1e3:8.2f} ms", flush=True)


def sweep_loss(srcs_cw, refb, xs, ys):
    return jnp.sum(cost_volume_fused_pallas(srcs_cw, refb, xs, ys,
                                            static) ** 2)


def sweep_grad(srcs_cw, refb, xs, ys):
    return jax.grad(sweep_loss, argnums=(0, 1))(srcs_cw, refb, xs, ys)


sec = device_time(sweep_grad, srcs_cw, refb, xs, ys, iters=6, base_iters=2)
print(f"fused sweep fwd+bwd           {sec*1e3:8.2f} ms", flush=True)

# ---- stage 2: packed16 relayout (fwd and its transpose) ----------------
cost_cm = jax.jit(sweep_fwd)(srcs_cw, refb, xs, ys)
jax.block_until_ready(cost_cm)
ct = Ci * V + C


def relayout(cost_cm):
    cm5 = cost_cm.reshape(cc, D // 16, 16, HP * WP)
    parts = [cm5[:ct, :, p].transpose(1, 2, 0) for p in range(16)]
    return jnp.concatenate(parts, -1).reshape(1, D // 16, HP, WP, 16 * ct)


sec = device_time(relayout, cost_cm, iters=6, base_iters=2)
print(f"packed16 relayout fwd         {sec*1e3:8.2f} ms", flush=True)


def relayout_grad(cost_cm):
    return jax.grad(lambda c: jnp.sum(relayout(c) ** 2))(cost_cm)


sec = device_time(relayout_grad, cost_cm, iters=6, base_iters=2)
print(f"packed16 relayout fwd+bwd     {sec*1e3:8.2f} ms", flush=True)

# ---- stage 3: full build_cost_volume (as the step runs it) -------------
for layout in ("packed16", "cmajor"):
    def build(feats_, imgs_, layout=layout):
        cost, _, _ = build_cost_volume(imgs_, feats_, projs, depth_values,
                                       pad=PAD, warp_fwd_mode="pallas",
                                       cost_layout=layout)
        return cost

    sec = device_time(build, feats, imgs, iters=6, base_iters=2)
    print(f"build_cost_volume fwd [{layout:8s}] {sec*1e3:8.2f} ms",
          flush=True)

    def build_grad(feats_, imgs_, layout=layout):
        return jax.grad(lambda f, im: jnp.sum(build(f, im, layout) ** 2),
                        argnums=(0, 1))(feats_, imgs_)

    sec = device_time(build_grad, feats, imgs, iters=6, base_iters=2)
    print(f"build_cost_volume f+b [{layout:8s}] {sec*1e3:8.2f} ms",
          flush=True)
