"""Fused Pallas TPU kernel for trainable-volume trilinear sampling.

`ops/volume_grad.sample_volume_train` (the XLA banded factorization) is
HBM-bound: per sample column it materializes the (N, (K+1)·H) weight
matrix and the (N, W·C) post-matmul intermediate in HBM — measured
5.5 ms fwd / 4.2 ms bwd at the fine-tune workload (1024 rays x 128
samples, 128x176x208x8 volume), ~40% of the whole train step. This
kernel keeps both in VMEM:

Forward, per sample column s (one grid step):

    vband  = vol[zmin_s : zmin_s + K+1]          # (K+1, H, WL*C) DMA
    A_zy   = hat(k - (z - zmin)) * hat(h - y)     # (N, (K+1)*H) iota VPU
    T      = A_zy @ vband.reshape((K+1)*H, WL*C)  # MXU, stays in VMEM
    out    = lane-roll-tree( T * hat_x_rep )      # (N, C) VPU

where hat(d) = max(0, 1 - |d|) reproduces the bilinear corner weights
exactly and gives zeros-padding for free (same trick as the plane-sweep
kernel, ops/pallas_sweep.py). `zmin` per column is computed in XLA and
scalar-prefetched; the band DMA is issued at kernel entry and overlaps
the A_zy build.

The x interpolation folds via a lane roll-tree instead of a second
matmul: the volume is lane-packed (D, H, WL*C) with WL = next power of
two >= W, lane l = w*C + c, so the circular-roll doubling tree
(log2(WL) rotations by c*2^j) leaves every lane holding the sum over
its whole residue class mod C — i.e. the x-interpolated feature.

Backward (grad wrt the volume; the cotangent wrt coords is a gather,
left to XLA autodiff exactly as volume_grad._bwd does): the lane axis is
split into groups of 128; each group accumulates its (D, H, 128) slice
of the gradient volume in VMEM across all S columns (the output block is
constant along the column grid axis, zeroed at s == 0), with per-column
updates

    gv[zmin_s : zmin_s + K+1, :, g] += A_zy^T @ (hat_x_g * g_rep)

one (K+1)*H x N x 128 MXU matmul per (group, column). No gradient
tensor round-trips HBM; the result is written once.

Contract: every column's z-slab span fits in band_k slabs (same contract
as sample_volume_train). Coordinate convention matches
index_point_feature / reference utils.py:357-383 (align_corners=True,
zeros padding, ndc in [0, 1]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _next_pow2(v: int) -> int:
    n = 1
    while n < v:
        n *= 2
    return n


def pack_volume_lanes(volume):
    """(D, H, W, C) -> (D, H, WL*C) lane-packed, WL = next pow2 >= W."""
    D, H, W, C = volume.shape
    WL = _next_pow2(W)
    v = jnp.pad(volume, ((0, 0), (0, 0), (0, WL - W), (0, 0)))
    return v.reshape(D, H, WL * C)


def _hat(dist):
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist))


def _a_zy(ys, zs_rel, h, band):
    """(N, band*h) combined z*y trilinear weights from lane iota."""
    n = ys.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, band * h), 1)
    k_l = (lane // h).astype(jnp.float32)
    h_l = jax.lax.rem(lane, h).astype(jnp.float32)
    return _hat(k_l - zs_rel[:, None]) * _hat(h_l - ys[:, None])


def _fwd_kernel(zmin_ref, x_ref, y_ref, z_ref, vol_ref, out_ref,
                vband_ref, sem, *, h, wl, c, band, mxu_dtype):
    s = pl.program_id(0)
    zmin = zmin_ref[s]
    dma = pltpu.make_async_copy(vol_ref.at[pl.ds(zmin, band)],
                                vband_ref, sem)
    dma.start()

    xs = x_ref[0, 0, :]
    ys = y_ref[0, 0, :]
    zs_rel = z_ref[0, 0, :] - zmin.astype(jnp.float32)
    n = xs.shape[0]

    a_zy = _a_zy(ys, zs_rel, h, band)                     # (N, band*h)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, wl * c), 1)
    ax = _hat((lane // c).astype(jnp.float32) - xs[:, None])

    dma.wait()
    vb = vband_ref[...].reshape(band * h, wl * c)
    t = jax.lax.dot_general(a_zy.astype(mxu_dtype), vb.astype(mxu_dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t = t * ax

    # sum over the WL w-groups: circular-roll doubling tree
    width = wl * c
    shift = c
    while shift < width:
        t = t + pltpu.roll(t, shift, 1)
        shift *= 2
    out_ref[0, :, :] = t[:, :c]


def _bwd_kernel(zmin_ref, x_ref, y_ref, z_ref, g_ref, gv_ref, *,
                h, wl, c, band, mxu_dtype):
    gi = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        gv_ref[...] = jnp.zeros_like(gv_ref)

    xs = x_ref[0, 0, :]
    ys = y_ref[0, 0, :]
    zmin = zmin_ref[s]
    zs_rel = z_ref[0, 0, :] - zmin.astype(jnp.float32)
    n = xs.shape[0]

    # cotangent replicated across the group's 128/c w-slots
    g = g_ref[0, :, :]                                    # (N, c)
    g_rep = jnp.pad(g, ((0, 0), (0, 128 - c)))
    shift = c
    while shift < 128:
        g_rep = g_rep + pltpu.roll(g_rep, shift, 1)
        shift *= 2

    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
    w_l = (gi * (128 // c) + lane // c).astype(jnp.float32)
    u = g_rep * _hat(w_l - xs[:, None])                   # (N, 128)

    a_zy = _a_zy(ys, zs_rel, h, band)                     # (N, band*h)
    upd = jax.lax.dot_general(a_zy.astype(mxu_dtype), u.astype(mxu_dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    gv_ref[pl.ds(zmin, band)] += upd.reshape(band, h, 128)


def _column_zmin(z_vox, d, band):
    """Per-column band start, identical to volume_grad's derivation."""
    z0 = jnp.floor(z_vox).astype(jnp.int32)
    zmin = jnp.clip(jnp.min(z0, axis=1), 0, d - 1)
    return jnp.minimum(zmin, jnp.int32(max(d - band, 0)))


def _auto_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _coords(volume, ndc, band):
    """Per-column voxel coords, shaped (S, 1, N): the singleton middle
    axis makes each column's (1, 1, N) block legal under Mosaic's
    block-shape rule (second-minor must be 8-divisible or span the
    array; 1 spans the singleton)."""
    D, H, W, _ = volume.shape
    x = (ndc[..., 0] * (W - 1)).T                         # (S, N)
    y = (ndc[..., 1] * (H - 1)).T
    z = (ndc[..., 2] * (D - 1)).T
    zmin = _column_zmin(z, D, band)                       # (S,)
    return x[:, None], y[:, None], z[:, None], zmin


def _fwd_impl(volume, ndc, band_k, interpret, compute_dtype):
    D, H, W, C = volume.shape
    N, S, _ = ndc.shape
    assert C & (C - 1) == 0 and C <= 128, C
    assert N % 8 == 0, N
    band = band_k + 1
    # _column_zmin clamps to [0, D - band]; a shallower volume would make
    # the forward band DMA read past the z extent.
    assert D >= band, (D, band)
    WL = _next_pow2(W)
    vol_l = pack_volume_lanes(volume)
    x, y, z, zmin = _coords(volume, ndc, band)

    coord_spec = pl.BlockSpec((1, 1, N), lambda s, zm: (s, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_fwd_kernel, h=H, wl=WL, c=C, band=band,
                             mxu_dtype=compute_dtype)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(S,),
            in_specs=[coord_spec, coord_spec, coord_spec,
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, N, C), lambda s, zm: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((band, H, WL * C), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((S, N, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(zmin, x, y, z, vol_l)
    return jnp.swapaxes(out, 0, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sample_volume_pallas(volume, ndc, band_k: int = 4,
                         interpret: bool | None = None,
                         compute_dtype=jnp.float32):
    """Drop-in for sample_volume_train with fused Pallas fwd/bwd.

    Args:
        volume: (D, H, W, C) f32, C a power of two <= 128 (8 for the
            encoding volume).
        ndc: (N, S, 3) in [0, 1], (x, y, z), align_corners=True, zeros
            padding outside.
        band_k: z-slab band (K): per column all samples' floor(z) must
            span < K slabs (module doc).
        compute_dtype: MXU operand dtype for the in-kernel matmuls.
            f32 is exact; bf16 quantizes the trilinear weights (and the
            volume features) to ~2^-9 relative — the matmuls run ~4x
            faster on the MXU, which matters because the one-hot
            factorization is compute-bound (the kernel inflates the
            8-corner gather into dense (N, band*H) @ (band*H, WL*C)
            work).

    Returns:
        (N, S, C) f32 features.
    """
    return _fwd_impl(volume, ndc, band_k, interpret, compute_dtype)


def _fwd_rule(volume, ndc, band_k, interpret, compute_dtype):
    return (_fwd_impl(volume, ndc, band_k, interpret, compute_dtype),
            (volume, ndc))


def _bwd_rule(band_k, interpret, compute_dtype, res, g):
    volume, ndc = res
    D, H, W, C = volume.shape
    N, S, _ = ndc.shape
    band = band_k + 1
    WL = _next_pow2(W)
    x, y, z, zmin = _coords(volume, ndc, band)
    g_t = jnp.swapaxes(g, 0, 1)                           # (S, N, C)

    # lane groups of 128; volumes with WL*C < 128 still need one group
    # (an empty grid would leave the output uninitialized). Lanes beyond
    # WL*C get w_l >= WL >= W in the kernel, so their hat weight is 0 and
    # the pad rows accumulate nothing — sliced off below.
    lc = max(WL * C, 128)
    n_groups = lc // 128
    coord_spec = pl.BlockSpec((1, 1, N), lambda gi, s, zm: (s, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_bwd_kernel, h=H, wl=WL, c=C, band=band,
                             mxu_dtype=compute_dtype)
    gv = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_groups, S),
            in_specs=[coord_spec, coord_spec, coord_spec,
                      pl.BlockSpec((1, N, C), lambda gi, s, zm: (s, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((D, H, 128),
                                   lambda gi, s, zm: (0, 0, gi),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[],
        ),
        out_shape=jax.ShapeDtypeStruct((D, H, lc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(zmin, x, y, z, g_t)
    g_vol = gv[:, :, :WL * C].reshape(D, H, WL, C)[:, :, :W]

    # cotangent wrt ndc: gathers only — autodiff, as in volume_grad._bwd
    from .interp import grid_sample_3d
    _, vjp_ndc = jax.vjp(lambda nd: grid_sample_3d(volume, nd * 2.0 - 1.0),
                         ndc)
    g_ndc = vjp_ndc(g)[0]
    return g_vol, g_ndc


sample_volume_pallas.defvjp(_fwd_rule, _bwd_rule)
