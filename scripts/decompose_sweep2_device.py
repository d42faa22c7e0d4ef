"""Decompose the xband-vs-v1 cost-volume gap on device: raw kernel fwd /
fwd+bwd on pre-packed inputs, and the XLA-side relayout epilogues, timed
separately (the full-build A/B in validate_sweep2_tpu.py mixes them).

Run: python scripts/decompose_sweep2_device.py [wb bandp]
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
from mvsnerf_tpu.ops.homography import plane_sweep_pix_coords  # noqa: E402
from mvsnerf_tpu.ops.pallas_sweep import (_Static,  # noqa: E402
                                          cost_volume_fused_pallas)
from mvsnerf_tpu.ops.pallas_sweep2 import (TR,  # noqa: E402
                                           cost_volume_xband_pallas,
                                           tile_lanes, untile_lanes)
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

WB = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BANDP = int(sys.argv[2]) if len(sys.argv) > 2 else 16

rng = np.random.default_rng(0)
imgs, intr, w2cs, projs, near_far = make_scene(rng)
h, w = H // 4, W // 4
C, Ci = 32, 3
cp = 40
hp, wp = h + 2 * PAD, w + 2 * PAD
D = 128
depths = depth_plane_values(near_far[0], near_far[1], D)
cc = -(-(Ci * 3 + C) // 8) * 8

feats = jnp.asarray(rng.standard_normal((3, h, w, C)).astype(np.float32))
imgs_l = jnp.asarray(rng.uniform(0, 1, (3, h, w, Ci)).astype(np.float32))

coords = [plane_sweep_pix_coords(projs[i], depths, h, w, PAD)
          for i in range(1, 3)]
xs = jnp.stack([c[0] for c in coords])
ys = jnp.stack([c[1] for c in coords])
xs_t = tile_lanes(xs, wp)
ys_t = tile_lanes(ys, wp)

cat = jnp.concatenate([feats, imgs_l], axis=-1)
cat = jnp.pad(cat, ((0, 0), (0, 0), (0, 0), (0, cp - C - Ci)))
srcs_hwc = cat[1:]                                    # (2, h, w, cp)
srcs_cw = cat[1:].transpose(0, 1, 3, 2)               # (2, h, cp, w)

ref_cat = jnp.pad(cat[0], ((PAD, PAD), (PAD, PAD), (0, 0)))
refb_t = tile_lanes(
    ref_cat.reshape(hp // TR, TR * wp, cp).transpose(0, 2, 1), wp)

st2 = _Static(band=0, m=TR * wp, bpp=hp // TR, c_feat=C, c_img=Ci,
              cc=cc, wb=WB, bandp=BANDP)

rb, band = 8, 16
bpp1, m1 = hp // rb, rb * wp
refb1 = ref_cat.reshape(bpp1, rb, wp, cp).transpose(0, 3, 1, 2)
refb1 = refb1.reshape(bpp1, cp, m1)
st1 = _Static(band=band, m=m1, bpp=bpp1, c_feat=C, c_img=Ci, cc=cc,
              bwd_groups=1)

print(f"xband wb={WB} bandp={BANDP}", flush=True)


def xb_fwd(s, x, y):
    return cost_volume_xband_pallas(s, refb_t, x, y, st2)


def v1_fwd(s, x, y):
    return cost_volume_fused_pallas(s, refb1, x, y, st1)


def xb_fb(s, x, y):
    return jax.grad(lambda ss: jnp.sum(xb_fwd(ss, x, y) ** 2))(s)


def v1_fb(s, x, y):
    return jax.grad(lambda ss: jnp.sum(v1_fwd(ss, x, y) ** 2))(s)


for name, fn, args in (
        ("xband kernel fwd", xb_fwd, (srcs_hwc, xs_t, ys_t)),
        ("v1    kernel fwd", v1_fwd, (srcs_cw, xs, ys)),
        ("xband kernel fwd+bwd", xb_fb, (srcs_hwc, xs_t, ys_t)),
        ("v1    kernel fwd+bwd", v1_fb, (srcs_cw, xs, ys))):
    sec = device_time(fn, *args, iters=8, base_iters=2)
    print(f"{name:24s} {sec * 1e3:8.2f} ms", flush=True)

# XLA-side epilogues on a dummy (cc, N) tensor
dummy = jnp.asarray(rng.standard_normal((cc, D * hp * wp)).astype(np.float32))
ct = Ci * 3 + C


def pack16(cm):
    cm5 = cm.reshape(cc, D // 16, 16, hp * wp)
    parts = [cm5[:ct, :, p].transpose(1, 2, 0) for p in range(16)]
    return jnp.concatenate(parts, -1).reshape(1, D // 16, hp, wp, 16 * ct)


sec = device_time(lambda d: pack16(untile_lanes(d, wp)), dummy,
                  iters=8, base_iters=2)
print(f"{'untile + pack16':24s} {sec * 1e3:8.2f} ms", flush=True)
sec = device_time(pack16, dummy, iters=8, base_iters=2)
print(f"{'pack16 alone':24s} {sec * 1e3:8.2f} ms", flush=True)
sec = device_time(lambda x: tile_lanes(x, wp), xs, iters=8, base_iters=2)
print(f"{'tile_lanes (coords x1)':24s} {sec * 1e3:8.2f} ms", flush=True)


# --- epilogue formulation A/B: fused 6-D permutation vs 3 staged
# transposes (channel-minor first, then row un-tile with (TC*cc)
# contiguous units, then plane pack) with optimization barriers so XLA
# can't re-merge the stages into the 16-lane-granularity single pass.
from mvsnerf_tpu.ops.pallas_sweep2 import TC as _TC  # noqa: E402

ct2 = Ci * 3 + C
bpp2 = hp // TR
nct2 = wp // _TC


def pack16_fused_from_tiles(cm):
    cm7 = cm.reshape(cc, D // 16, 16, bpp2, nct2, TR, _TC)
    parts = [cm7[:ct2, :, p].transpose(1, 2, 4, 3, 5, 0)
             for p in range(16)]
    return jnp.concatenate(
        [p.reshape(D // 16, hp, wp, ct2) for p in parts],
        axis=-1).reshape(1, D // 16, hp, wp, 16 * ct2)


def pack16_staged_from_tiles(cm):
    sm = cm.T                                       # (N, cc)
    sm = jax.lax.optimization_barrier(sm)
    s5 = sm.reshape(D * bpp2, nct2, TR, _TC, cc)
    s5 = jnp.swapaxes(s5, 1, 2)                     # 3KB move units
    s5 = jax.lax.optimization_barrier(s5)
    d5 = s5.reshape(D // 16, 16, hp, wp, cc)
    pk = d5.transpose(0, 2, 3, 1, 4)[..., :ct2]
    return pk.reshape(1, D // 16, hp, wp, 16 * ct2)


ref_pk = jax.jit(pack16_fused_from_tiles)(dummy)
out_pk = jax.jit(pack16_staged_from_tiles)(dummy)
import numpy as _nptest
_nptest.testing.assert_allclose(_nptest.asarray(out_pk),
                                _nptest.asarray(ref_pk))
print("staged epilogue matches fused", flush=True)

sec = device_time(pack16_fused_from_tiles, dummy, iters=8, base_iters=2)
print(f"{'epilogue fused 6-D':24s} {sec * 1e3:8.2f} ms", flush=True)
sec = device_time(pack16_staged_from_tiles, dummy, iters=8, base_iters=2)
print(f"{'epilogue staged 3-pass':24s} {sec * 1e3:8.2f} ms", flush=True)
