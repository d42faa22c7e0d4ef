"""Locate the fused plane-sweep kernel's cost at DTU production shape
(the generalizable step's dominant term): the analytic floor is ~10 ms
MXU (bf16, 2 views x 2816 blocks x (640,160)@(160,1664)) + ~6 ms VPU
(hat builds + band sums) + ~1 ms HBM, but the measured fwd is ~50 ms.
Stub variants isolate {grid+write floor, warp matmul, hat builds,
band-sum, variance assembly} by patching the kernel body.

Run: python scripts/probe_sweep_internals.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from bench import make_scene  # noqa: E402
from mvsnerf_tpu.models import init_mvsnet  # noqa: E402
from mvsnerf_tpu.models.mvsnet import (depth_plane_values,  # noqa: E402
                                       feature_net_apply)
from mvsnerf_tpu.ops import pallas_sweep as ps  # noqa: E402
from mvsnerf_tpu.ops.homography import plane_sweep_pix_coords  # noqa: E402
from mvsnerf_tpu.utils.devtime import device_time  # noqa: E402

H, W, PAD, D = 512, 640, 24, 128
h, w = H // 4, W // 4
HP, WP = h + 2 * PAD, w + 2 * PAD
V, C, Ci = 3, 32, 3
cp = -(-(C + Ci) // 8) * 8
cc = -(-(Ci * V + C) // 8) * 8
RB, BAND = 8, 16
BPP, M = HP // RB, RB * WP
N = D * HP * WP

rng = np.random.default_rng(0)
mvs = init_mvsnet(jax.random.PRNGKey(0))
imgs, intr, w2cs, projs, near_far = make_scene(rng)
feats = jax.jit(lambda p, im: feature_net_apply(p, im))(mvs["feature"],
                                                        imgs)
depth_values = depth_plane_values(float(near_far[0]), float(near_far[1]), D)

from mvsnerf_tpu.ops.interp import interpolate_bilinear_resize  # noqa: E402

imgs_l = jax.vmap(lambda im: interpolate_bilinear_resize(im, h, w))(imgs)
ref_p = jnp.pad(jnp.concatenate(
    [jnp.pad(feats[0], ((PAD, PAD), (PAD, PAD), (0, 0))),
     jnp.pad(imgs_l[0], ((PAD, PAD), (PAD, PAD), (0, 0)))], -1),
    ((0, 0), (0, 0), (0, cp - C - Ci)))
refb = ref_p.reshape(BPP, RB, WP, cp).transpose(0, 3, 1, 2).reshape(
    BPP, cp, M)
srcs_cw = jnp.stack([
    jnp.pad(jnp.concatenate([feats[i], imgs_l[i]], -1),
            ((0, 0), (0, 0), (0, cp - C - Ci))).transpose(0, 2, 1)
    for i in range(1, V)])
cs = [plane_sweep_pix_coords(projs[i], depth_values, h, w, PAD)
      for i in range(1, V)]
xs = jnp.stack([c[0] for c in cs])
ys = jnp.stack([c[1] for c in cs])
jax.block_until_ready((srcs_cw, refb, xs, ys))
print(f"blocks={D * BPP} m={M} band={BAND} cp={cp} cc={cc}", flush=True)


def run_variant(name, kernel_body):
    kern = functools.partial(kernel_body, h=HP, w=WP, band=BAND, cp=cp,
                             n_src=V - 1, bpp=BPP, c_feat=C, c_img=Ci)
    fn = lambda xs, ys, refb, s0, s1: pl.pallas_call(  # noqa: E731
        kern,
        grid=(N // M,),
        in_specs=[
            pl.BlockSpec((V - 1, 1, M), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V - 1, 1, M), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(refb.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, cp, WP), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HP, cp, WP), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cc, M), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cc, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(xs, ys, refb, srcs_cw[0], srcs_cw[1])
    sec = device_time(fn, xs, ys, refb, srcs_cw[0], srcs_cw[1],
                      iters=6, base_iters=2)
    print(f"{name:28s} {sec*1e3:8.2f} ms", flush=True)


# full forward (the real kernel, via the public path) ----------------------
from mvsnerf_tpu.ops.pallas_sweep import _Static, cost_volume_fused_pallas  # noqa: E402

static = _Static(band=BAND, m=M, bpp=BPP, c_feat=C, c_img=Ci, cc=cc)
fn_full = lambda s, r, x, y: cost_volume_fused_pallas(s, r, x, y, static)  # noqa: E731
sec = device_time(fn_full, srcs_cw, refb, xs, ys, iters=6, base_iters=2)
print(f"{'full fused fwd':28s} {sec*1e3:8.2f} ms", flush=True)


# variant kernels ----------------------------------------------------------
def k_write_only(x_ref, y_ref, refb_ref, s0, s1, out_ref, *, h, w, band,
                 cp, n_src, bpp, c_feat, c_img):
    m = x_ref.shape[2]
    out_ref[...] = jnp.broadcast_to(x_ref[0, 0, :][None],
                                    (out_ref.shape[0], m))


def k_matmul_only(x_ref, y_ref, refb_ref, s0, s1, out_ref, *, h, w, band,
                  cp, n_src, bpp, c_feat, c_img):
    """warp matmuls with CONSTANT weight matrices (no hat builds)."""
    m = x_ref.shape[2]
    acc = jnp.zeros((c_feat, m), jnp.float32)
    for v, ref in enumerate((s0, s1)):
        xs_ = x_ref[v, 0, :]
        axw_t = jnp.broadcast_to(xs_[None, :], (w, m))
        vband = ref[pl.ds(0, band)]
        t = jax.lax.dot_general(
            vband.reshape(band * cp, w), axw_t,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + t[:c_feat, :]
    out_ref[...] = jnp.broadcast_to(acc[:1], out_ref.shape)


def k_no_bandsum(x_ref, y_ref, refb_ref, s0, s1, out_ref, *, h, w, band,
                 cp, n_src, bpp, c_feat, c_img):
    """full hat builds + matmul, but band-sum replaced by slice."""
    m = x_ref.shape[2]
    acc = jnp.zeros((cp, m), jnp.float32)
    for v, ref in enumerate((s0, s1)):
        warped, axw_t, ayw_t, ymin = ps._warp_block(
            x_ref[v, 0, :], y_ref[v, 0, :], ref, h, w, band, cp)
        del warped  # rebuild without the band sum:
        vband = ref[pl.ds(ymin, band)]
        t = jax.lax.dot_general(
            vband.reshape(band * cp, w), axw_t,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + t.reshape(band, cp, m)[0]
    out_ref[...] = jnp.broadcast_to(acc[:1], out_ref.shape)


def k_full_novar(x_ref, y_ref, refb_ref, s0, s1, out_ref, *, h, w, band,
                 cp, n_src, bpp, c_feat, c_img):
    """full warps incl. band sum; skip the variance/mask/assembly."""
    m = x_ref.shape[2]
    acc = jnp.zeros((cp, m), jnp.float32)
    for v, ref in enumerate((s0, s1)):
        warped, _, _, _ = ps._warp_block(
            x_ref[v, 0, :], y_ref[v, 0, :], ref, h, w, band, cp)
        acc = acc + warped
    out_ref[...] = jnp.broadcast_to(acc[:1], out_ref.shape)


run_variant("write only (grid floor)", k_write_only)
run_variant("+ matmuls (const weights)", k_matmul_only)
run_variant("+ hat builds (no bandsum)", k_no_bandsum)
run_variant("+ band sum (no variance)", k_full_novar)
