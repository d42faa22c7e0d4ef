"""Fused Pallas volume gather/splat v2: y-sorted ray blocks.

The v1 kernel (ops/pallas_volgather.py) lost its device A/B against the
XLA banded path (in-step 30.1 vs 23.8 ms, docs/status.md round 4): both
pay the same dense one-hot matmul FLOPs — (N, (K+1)*H) @ ((K+1)*H, W*C)
per sample column — and v1's backward additionally rebuilds the weight
matrix per lane group and thrashes its VMEM-resident output block.

v2 attacks the FLOPs themselves. The (K+1)*H contraction axis is ~98%
zeros: each sample touches 2 of H rows. Sorting the rays of a batch by
their image-space y once (one argsort + gather in XLA; the output is
scattered back by the inverse permutation) makes every block of NB
consecutive rays span a narrow y band, so per (column, block) the matmul
shrinks to (NB, (K+1)*HB) @ ((K+1)*HB, WL*C) with HB ~ H/4 — an ~4x MXU
FLOP cut, on top of v1's VMEM residency:

  forward, grid (S,), per column (double-buffered vband DMA across
  columns; block loop unrolled in-kernel):
      vband = vol[zmin_s : zmin_s+K+1]            # (K+1, H, WL*C) DMA
      for b in range(N // NB):
          A  = hat(k - z_rel) * hat(h - (y - ymin_sb))   # (NB, (K+1)*HB)
          T  = A @ vband[:, ymin_sb : ymin_sb+HB].reshape(-1, WL*C)
          out[b] = roll-tree-fold-x(T * hat_x)

  backward, grid (G, S) over 128-lane groups of the gradient volume
  (VMEM-resident per group, zeroed at s == 0):
      for b: gv[zmin_s:+K+1, ymin_sb:+HB, g] += A^T @ (hat_x_g * g_rep)

Contract: on top of v1's z-band contract, every (column, block)'s y span
must fit HB rows from its 8-aligned band start. `volgather2_fits` checks
both on the actual coordinates; callers lax.cond-fall back to the banded
path (same pattern as the color warp's sweep_fits_band). Rays must be
pre-sorted by y for the contract to hold at useful HB — see
`sort_rays_by_y` / `sample_volume_sorted`.

Coordinate convention matches index_point_feature / reference
utils.py:357-383 (align_corners=True, zeros padding, ndc in [0, 1]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_volgather import (_auto_interpret, _hat, _next_pow2,
                               pack_volume_lanes)


def _block_a(ys, zs_rel, hb, band):
    """(NB, band*hb) combined z*y weights; ys are band-relative."""
    nb = ys.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (nb, band * hb), 1)
    k_l = (lane // hb).astype(jnp.float32)
    h_l = jax.lax.rem(lane, hb).astype(jnp.float32)
    return _hat(k_l - zs_rel[:, None]) * _hat(h_l - ys[:, None])


def _fwd_kernel(zmin_ref, ymin_ref, x_ref, y_ref, z_ref, vol_ref, out_ref,
                vband0, vband1, sem0, sem1, *, h, wl, c, band, hb, nb,
                n_blocks, s_total, mxu_dtype):
    s = pl.program_id(0)
    bufs = (vband0, vband1)
    sems = (sem0, sem1)

    # double-buffered vband DMA: issue s+1's copy before computing s
    def start(slot, col):
        for i, (b, sm) in enumerate(zip(bufs, sems)):
            @pl.when(slot == i)
            def _():
                pltpu.make_async_copy(
                    vol_ref.at[pl.ds(zmin_ref[col], band)], b, sm).start()

    def wait(slot):
        for i, (b, sm) in enumerate(zip(bufs, sems)):
            @pl.when(slot == i)
            def _():
                pltpu.make_async_copy(
                    vol_ref.at[pl.ds(0, band)], b, sm).wait()

    @pl.when(s == 0)
    def _():
        start(0, 0)

    @pl.when(s + 1 < s_total)
    def _():
        start((s + 1) % 2, s + 1)

    wait(s % 2)
    zmin_f = zmin_ref[s].astype(jnp.float32)

    for b in range(n_blocks):
        xs = x_ref[0, 0, b * nb:(b + 1) * nb]
        ys = y_ref[0, 0, b * nb:(b + 1) * nb]
        zs = z_ref[0, 0, b * nb:(b + 1) * nb]
        # the scalar carries ymin/8; multiplying by 8 IN-KERNEL lets
        # Mosaic statically prove the sublane slice is 8-aligned
        ymin = ymin_ref[s * n_blocks + b] * 8
        a = _block_a(ys - ymin.astype(jnp.float32), zs - zmin_f, hb, band)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nb, wl * c), 1)
        ax = _hat((lane // c).astype(jnp.float32) - xs[:, None])

        for i, buf in enumerate(bufs):
            @pl.when(s % 2 == i)
            def _():
                vb = buf[:, pl.ds(ymin, hb), :].reshape(band * hb, wl * c)
                t = jax.lax.dot_general(
                    a.astype(mxu_dtype), vb.astype(mxu_dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                t = t * ax
                width = wl * c
                shift = c
                while shift < width:
                    t = t + pltpu.roll(t, shift, 1)
                    shift *= 2
                out_ref[0, b * nb:(b + 1) * nb, :] = t[:, :c]


def _bwd_kernel(zmin_ref, ymin_ref, x_ref, y_ref, z_ref, g_ref, gv_ref, *,
                h, wl, c, band, hb, nb, n_blocks, gw, mxu_dtype):
    """gw = lanes of the gradient volume per grid group (multiple of 128):
    wider groups mean fewer, larger MXU issues and fewer redundant
    per-(s, block) weight builds, at (D, H, gw)*4 bytes of VMEM."""
    gi = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        gv_ref[...] = jnp.zeros_like(gv_ref)

    zmin = zmin_ref[s]
    zmin_f = zmin.astype(jnp.float32)

    for b in range(n_blocks):
        xs = x_ref[0, 0, b * nb:(b + 1) * nb]
        ys = y_ref[0, 0, b * nb:(b + 1) * nb]
        zs = z_ref[0, 0, b * nb:(b + 1) * nb]
        ymin = ymin_ref[s * n_blocks + b] * 8   # /8-scalar: see fwd
        g = g_ref[0, b * nb:(b + 1) * nb, :]              # (NB, c)
        g_rep = jnp.pad(g, ((0, 0), (0, gw - c)))
        shift = c
        while shift < gw:
            g_rep = g_rep + pltpu.roll(g_rep, shift, 1)
            shift *= 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (nb, gw), 1)
        w_l = (gi * (gw // c) + lane // c).astype(jnp.float32)
        u = g_rep * _hat(w_l - xs[:, None])               # (NB, gw)

        a = _block_a(ys - ymin.astype(jnp.float32), zs - zmin_f, hb, band)
        upd = jax.lax.dot_general(
            a.astype(mxu_dtype), u.astype(mxu_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (band*hb, gw)
        gv_ref[pl.ds(zmin, band), pl.ds(ymin, hb)] += \
            upd.reshape(band, hb, gw)


def _column_zmin(z, d, band):
    z0 = jnp.floor(z).astype(jnp.int32)
    zmin = jnp.clip(jnp.min(z0, axis=-1), 0, d - 1)
    return jnp.minimum(zmin, jnp.int32(max(d - band, 0)))


def _block_ymin(y, h, hb, nb):
    """8-aligned per-(column, block) y-band starts, flattened (S*B,).

    y: (S, N) voxel-space y of the (sorted) rays."""
    s, n = y.shape
    yb = y.reshape(s, n // nb, nb)
    y0 = jnp.floor(yb).astype(jnp.int32)
    ymin = jnp.clip(jnp.min(y0, axis=-1), 0, h - 1)
    ymin = (ymin // 8) * 8
    ymin = jnp.minimum(ymin, jnp.int32(max(h - hb, 0)))
    # carried as ymin/8 so the kernel can multiply by 8 and give Mosaic a
    # statically provable 8-aligned sublane slice start (callers of the
    # KERNEL use this; volgather2_fits re-derives the aligned value)
    return (ymin // 8).reshape(-1)


def volgather2_fits(ndc, volume_shape, band_k: int, hb: int, nb: int):
    """Whether the (z-band, y-band) contracts hold for these coordinates
    (rays assumed already y-sorted). Out-of-range corners carry zero hat
    weight in the kernel, so only in-range corner rows constrain the
    bands (same accounting as pallas_sweep.sweep_fits_band_pix).
    Traced-safe (returns a scalar bool for lax.cond)."""
    d, h, w, _ = volume_shape
    band = band_k + 1

    def axis_span_ok(v, size, vmin, width):
        """All in-range corner rows of v lie in [vmin, vmin+width-1]."""
        v0 = jnp.floor(v).astype(jnp.int32)
        in0 = (v0 >= 0) & (v0 <= size - 1)
        in1 = (v0 + 1 >= 0) & (v0 + 1 <= size - 1)
        lo = jnp.where(in0, v0, jnp.where(in1, v0 + 1, size))
        hi = jnp.where(in1, v0 + 1, jnp.where(in0, v0, -1))
        return jnp.all((lo >= vmin) & (hi <= vmin + (width - 1)))

    y = (ndc[..., 1] * (h - 1)).T                         # (S, N)
    z = (ndc[..., 2] * (d - 1)).T
    s, n = y.shape
    zmin = _column_zmin(z, d, band)
    z_ok = axis_span_ok(z, d, zmin[:, None], band)
    yb = y.reshape(s, n // nb, nb)
    ymin = _block_ymin(y, h, hb, nb).reshape(s, n // nb) * 8
    y_ok = axis_span_ok(yb, h, ymin[..., None], hb)
    return z_ok & y_ok


def _prep(volume, ndc, band, hb, nb):
    D, H, W, C = volume.shape
    x = (ndc[..., 0] * (W - 1)).T
    y = (ndc[..., 1] * (H - 1)).T
    z = (ndc[..., 2] * (D - 1)).T
    zmin = _column_zmin(z, D, band)
    ymin = _block_ymin(y, H, hb, nb)
    return x[:, None], y[:, None], z[:, None], zmin, ymin


def _fwd_impl(volume, ndc, band_k, hb, nb, interpret, compute_dtype):
    D, H, W, C = volume.shape
    N, S, _ = ndc.shape
    assert C & (C - 1) == 0 and C <= 128, C
    assert N % nb == 0 and nb % 8 == 0, (N, nb)
    assert hb % 8 == 0 and hb <= H, (hb, H)
    band = band_k + 1
    assert D >= band, (D, band)
    WL = _next_pow2(W)
    vol_l = pack_volume_lanes(volume)
    x, y, z, zmin, ymin = _prep(volume, ndc, band, hb, nb)
    n_blocks = N // nb

    coord_spec = pl.BlockSpec((1, 1, N), lambda s, zm, ym: (s, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(
        _fwd_kernel, h=H, wl=WL, c=C, band=band, hb=hb, nb=nb,
        n_blocks=n_blocks, s_total=S, mxu_dtype=compute_dtype)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S,),
            in_specs=[coord_spec, coord_spec, coord_spec,
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, N, C), lambda s, zm, ym: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((band, H, WL * C), jnp.float32),
                pltpu.VMEM((band, H, WL * C), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((S, N, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(zmin, ymin, x, y, z, vol_l)
    return jnp.swapaxes(out, 0, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def sample_volume_pallas2(volume, ndc, band_k: int = 4, hb: int = 48,
                          nb: int = 256, interpret: bool | None = None,
                          compute_dtype=jnp.bfloat16):
    """v2 fused trilinear volume sampling over y-SORTED rays.

    Args:
        volume: (D, H, W, C) f32, C a power of two <= 128.
        ndc: (N, S, 3) in [0, 1]; rays must be ordered so each NB-block
            spans < `hb` y rows per column (sort_rays_by_y).
        band_k: z-slab band (same contract as sample_volume_train).
        hb: static y-band rows per block (multiple of 8).
        nb: rays per block (multiple of 8, divides N).

    Returns:
        (N, S, C) f32 features.
    """
    return _fwd_impl(volume, ndc, band_k, hb, nb, interpret, compute_dtype)


def _fwd_rule(volume, ndc, band_k, hb, nb, interpret, compute_dtype):
    return (_fwd_impl(volume, ndc, band_k, hb, nb, interpret,
                      compute_dtype), (volume, ndc))


def _bwd_rule(band_k, hb, nb, interpret, compute_dtype, res, g):
    volume, ndc = res
    D, H, W, C = volume.shape
    N, S, _ = ndc.shape
    band = band_k + 1
    WL = _next_pow2(W)
    x, y, z, zmin, ymin = _prep(volume, ndc, band, hb, nb)
    g_t = jnp.swapaxes(g, 0, 1)                           # (S, N, C)
    n_blocks = N // nb

    lc = max(WL * C, 128)
    # lane-group width: as wide as the VMEM budget allows (fewer, larger
    # MXU issues; less redundant weight building), capped at 512 lanes =
    # a 46 MB (D, H, gw) block at the production volume
    gw = 128
    while gw < min(lc, 512) and D * H * gw * 2 * 4 <= 100 * 1024 * 1024:
        gw *= 2
    n_groups = lc // gw
    coord_spec = pl.BlockSpec((1, 1, N), lambda gi, s, zm, ym: (s, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(
        _bwd_kernel, h=H, wl=WL, c=C, band=band, hb=hb, nb=nb,
        n_blocks=n_blocks, gw=gw, mxu_dtype=compute_dtype)
    gv = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_groups, S),
            in_specs=[coord_spec, coord_spec, coord_spec,
                      pl.BlockSpec((1, N, C),
                                   lambda gi, s, zm, ym: (s, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((D, H, gw),
                                   lambda gi, s, zm, ym: (0, 0, gi),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[],
        ),
        out_shape=jax.ShapeDtypeStruct((D, H, lc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(zmin, ymin, x, y, z, g_t)
    g_vol = gv[:, :, :WL * C].reshape(D, H, WL, C)[:, :, :W]

    from .interp import grid_sample_3d
    _, vjp_ndc = jax.vjp(lambda nd: grid_sample_3d(volume, nd * 2.0 - 1.0),
                         ndc)
    g_ndc = vjp_ndc(g)[0]
    return g_vol, g_ndc


sample_volume_pallas2.defvjp(_fwd_rule, _bwd_rule)


# ------------------------------------------------------- sorted wrapper ---


def sort_rays_by_y(ndc):
    """Permutation sorting rays by their mid-column y (and its inverse).

    One order for all columns: along a ray y drifts only a little, so
    sorting by the middle sample keeps per-block y spans tight."""
    s_mid = ndc.shape[1] // 2
    order = jnp.argsort(ndc[:, s_mid, 1])
    inv = jnp.argsort(order)
    return order, inv


def sample_volume_sorted(volume, ndc, band_k: int = 4, hb: int = 48,
                         nb: int = 256, interpret: bool | None = None,
                         compute_dtype=jnp.bfloat16,
                         kernel_band_k: int | None = None):
    # hb=48/nb=256: device-swept winner (scripts/diag_volgather2.py,
    # round 4): fwd+bwd 7.61 ms vs banded 9.78 at the fine-tune shape;
    # nb must divide the ray count — falls back to banded otherwise.
    """sample_volume_train drop-in: sort rays by y, run the v2 kernel when
    the (z, y) band contracts hold on this batch, else fall back to the
    XLA banded path — all under jit (lax.cond picks per batch).

    `kernel_band_k` lets the KERNEL run a tighter z band than the
    fallback: the kernel's band is validated per batch by
    `volgather2_fits` on the actual coordinates (exact whenever taken),
    while the banded fallback keeps the caller's analytically safe
    `band_k` — so an optimistic kernel band can never corrupt results,
    it only risks falling back."""
    from .volume_grad import sample_volume_train

    kb = band_k if kernel_band_k is None else min(kernel_band_k, band_k)
    n = ndc.shape[0]
    while nb > 8 and n % nb:
        nb //= 2
    if n % nb or nb % 8 or volume.shape[-1] & (volume.shape[-1] - 1) \
            or volume.shape[0] < kb + 1 or volume.shape[1] < hb:
        return sample_volume_train(volume, ndc, band_k)

    order, inv = sort_rays_by_y(ndc)
    ndc_s = jnp.take(ndc, order, axis=0)
    fits = volgather2_fits(ndc_s, volume.shape, kb, hb, nb)

    def fast(vol, nd):
        out = sample_volume_pallas2(vol, nd, kb, hb, nb, interpret,
                                    compute_dtype)
        return jnp.take(out, inv, axis=0)

    def slow(vol, nd):
        del nd
        return sample_volume_train(vol, ndc, band_k)

    return jax.lax.cond(fits, fast, slow, volume, ndc_s)
