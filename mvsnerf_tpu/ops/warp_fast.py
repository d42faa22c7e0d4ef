"""Banded dense bilinear warping for the plane sweep.

The plane-sweep warp (ops/homography.py) resamples each source feature map
at D x H_pad x W_pad affine-projected coordinates. XLA lowers that to corner
gathers whose cost scales with the index count: at DTU resolution the sweep
costs ~550 ms of the MVSNet forward on v5e, and its scatter backward is
worse. But an affine warp has structure: for a block of output rows, the
source y coordinates span a narrow band (the homography is near-rectified
for ranked MVS view pairs). Within a block the bilinear resample factors
into dense matmuls

    T[m, (band, c)] = A_xw[m, w] @ V_band[w, band * c]      (MXU)
    out[m, c]       = sum_band A_yw[m, band] * T[m, band, c] (VPU)

with A_xw/A_yw the two-nonzero interpolation matrices built by broadcast
comparison. All row blocks evaluate in parallel (vmap — a sequential
lax.map was launch-bound at ~0.3 ms/block); if ANY block's y-span exceeds
the band the whole call falls back to the exact gather via lax.cond, so the
result equals grid_sample_2d for arbitrary grids.

`bilinear_warp_banded` is a custom-VJP op: the backward wrt the source map
runs the transposed matmuls per block and one slab-row scatter-add,
replacing the pathological per-sample scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .interp import grid_sample_2d
from .precision import INTERP
from .volume_grad import _axis_onehot


def _axis_parts(coord, size):
    c0 = jnp.floor(coord)
    frac = coord - c0
    c0i = c0.astype(jnp.int32)
    m0 = (c0i >= 0) & (c0i <= size - 1)
    m1 = (c0i + 1 >= 0) & (c0i + 1 <= size - 1)
    return c0i, frac, m0, m1


def _prep(grid, src_shape, row_block, band):
    """Flatten grid to row blocks; per-block y-band origins + global fit."""
    h, w, C = src_shape
    lead = grid.shape[:-1]
    w_out = grid.shape[-2]
    rows = 1
    for s in lead[:-1]:
        rows *= s
    grid_rows = grid.reshape(rows, w_out, 2)
    rb = min(row_block, rows)
    pad = (-rows) % rb
    if pad:
        grid_rows = jnp.pad(grid_rows, ((0, pad), (0, 0), (0, 0)),
                            constant_values=-2.0)
    blocks = grid_rows.reshape(-1, rb, w_out, 2)  # (nb, rb, w_out, 2)
    band_c = min(band, h)

    y = (blocks[..., 1] + 1.0) * 0.5 * (h - 1)       # (nb, rb, w_out)
    y0 = jnp.floor(y).astype(jnp.int32)
    valid = (y0 >= -1) & (y0 <= h - 1)
    ymin = jnp.min(jnp.where(valid, y0, h), axis=(1, 2))
    ymin = jnp.clip(ymin, 0, max(h - band_c, 0))     # (nb,)
    ymax = jnp.max(jnp.where(valid, y0 + 1, 0), axis=(1, 2))
    fits_all = jnp.all(ymax - ymin < band_c)
    return blocks, ymin, fits_all, rows, band_c, rb, w_out, lead


def _block_factors(gblk, ymin, src_shape, band_c):
    """One-hot-with-weights factors for one block."""
    h, w, C = src_shape
    x = ((gblk[..., 0] + 1.0) * 0.5 * (w - 1)).reshape(-1)
    y = ((gblk[..., 1] + 1.0) * 0.5 * (h - 1)).reshape(-1)
    x0, fx, mx0, mx1 = _axis_parts(x, w)
    y0, fy, my0, my1 = _axis_parts(y, h)
    axw = _axis_onehot(x0, fx, mx0, mx1, w)              # (m, w)
    ayw = _axis_onehot(y0 - ymin, fy, my0, my1, band_c)  # (m, band)
    return axw, ayw


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def bilinear_warp_banded(src, grid, row_block: int = 16, band: int = 24,
                         compute_dtype=jnp.float32,
                         grid_grad: bool = False,
                         fwd_mode: str = "banded"):
    """Bilinear zeros-padded warp, align_corners=True; equals
    grid_sample_2d(src, grid, 'zeros') for any grid.

    Args:
        src: (h, w, C) source map.
        grid: (..., W_out, 2) normalized coords; the second-to-last axis is
              contiguous output rows (blocked by `row_block`).
        row_block: output rows per block (static).
        band: source-row band height (static); if any block's span exceeds
              it, the whole call uses the exact gather fallback.
        compute_dtype: matmul multiply dtype (f32 or bf16; accumulate f32).
        grid_grad: compute the exact grid cotangent in the backward (an
            extra gather pass). The sweep grid is camera geometry — no
            training path differentiates it — so the default returns zeros;
            enable for camera-optimization research.
        fwd_mode: 'banded' (dense matmuls) or 'packed' (corner-packed
            gather — one index per sample; pack the small source map once).
            The backward is the banded splat either way.
    """
    if fwd_mode == "packed":
        from .interp import grid_sample_2d_packed, pack_corners_2d
        return grid_sample_2d_packed(pack_corners_2d(src), grid, "zeros")
    return _warp_fwd_impl(src, grid, row_block, band, compute_dtype)


def _warp_fwd_impl(src, grid, row_block, band, compute_dtype=jnp.float32):
    h, w, C = src.shape
    blocks, ymins, fits_all, rows, band_c, rb, w_out, lead = _prep(
        grid, src.shape, row_block, band)

    def banded(_):
        # one flat row-take: nb*band indices of contiguous (w, C) rows
        row_idx = (ymins[:, None] +
                   jnp.arange(band_c)[None, :]).reshape(-1)
        vbands = jnp.take(src, row_idx, axis=0).reshape(
            -1, band_c, w, C)

        def one(gblk, ymin, vband):
            axw, ayw = _block_factors(gblk, ymin, src.shape, band_c)
            vband = vband.transpose(1, 0, 2).reshape(w, band_c * C)
            prec = INTERP if compute_dtype == jnp.float32 else None
            t = jnp.dot(axw.astype(compute_dtype),
                        vband.astype(compute_dtype), precision=prec,
                        preferred_element_type=jnp.float32)
            t = t.reshape(-1, band_c, C)
            return jnp.sum(ayw[..., None] * t, axis=1)   # (m, C)

        return jax.vmap(one)(blocks, ymins, vbands)

    def fallback(_):
        return grid_sample_2d(src, blocks, "zeros").reshape(
            blocks.shape[0], -1, C)

    out = jax.lax.cond(fits_all, banded, fallback, None)
    out = out.reshape(-1, w_out, C)[:rows]
    return out.reshape(*lead, C)


def _warp_fwd(src, grid, row_block, band, compute_dtype, grid_grad,
              fwd_mode):
    return (bilinear_warp_banded(src, grid, row_block, band, compute_dtype,
                                 grid_grad, fwd_mode),
            (src, grid))


def _warp_bwd(row_block, band, compute_dtype, grid_grad, fwd_mode,
              res, g):
    src, grid = res
    h, w, C = src.shape
    blocks, ymins, fits_all, rows, band_c, rb, w_out, lead = _prep(
        grid, src.shape, row_block, band)

    if grid_grad:
        # exact grid cotangent: gathers only, via autodiff
        _, vjp_grid = jax.vjp(lambda n: grid_sample_2d(src, n, "zeros"),
                              grid)
        g_grid = vjp_grid(g)[0]
    else:
        g_grid = jnp.zeros_like(grid)

    g_rows = g.reshape(rows, w_out, C)
    pad = (-rows) % rb
    if pad:
        g_rows = jnp.pad(g_rows, ((0, pad), (0, 0), (0, 0)))
    gblocks = g_rows.reshape(-1, rb * w_out, C)

    def banded(_):
        def one(gblk, ymin, gc):
            axw, ayw = _block_factors(gblk, ymin, src.shape, band_c)
            u = (ayw[:, :, None] * gc[:, None, :]).reshape(-1, band_c * C)
            prec = INTERP if compute_dtype == jnp.float32 else None
            gband = jnp.dot(axw.T.astype(compute_dtype),
                            u.astype(compute_dtype), precision=prec,
                            preferred_element_type=jnp.float32)
            return gband.reshape(w, band_c, C).transpose(1, 0, 2)

        gbands = jax.vmap(one)(blocks, ymins, gblocks)   # (nb, band, w, C)
        # slab-row scatter-add: nb*band row indices, contiguous (w, C) rows
        row_idx = (ymins[:, None] +
                   jnp.arange(band_c)[None, :]).reshape(-1)
        g_src = jnp.zeros_like(src) + 0.0 * g.reshape(-1)[0]
        return g_src.at[row_idx].add(gbands.reshape(-1, w, C))

    def fallback(_):
        _, vjp_src = jax.vjp(
            lambda s: grid_sample_2d(s, blocks, "zeros"), src)
        return vjp_src(gblocks.reshape(blocks.shape[0], rb, w_out, C))[0] + \
            0.0 * g.reshape(-1)[0]

    g_src = jax.lax.cond(fits_all, banded, fallback, None)
    return g_src, g_grid


bilinear_warp_banded.defvjp(_warp_fwd, _warp_bwd)
