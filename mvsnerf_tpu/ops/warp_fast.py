"""Banded dense bilinear warping for the plane sweep.

The plane-sweep warp (ops/homography.py) resamples each source feature map
at D x H_pad x W_pad affine-projected coordinates. XLA lowers that to corner
gathers whose cost scales with the index count: at DTU resolution the sweep
costs ~600 ms of the 711 ms MVSNet forward on v5e, and its backward
(scatter-add into the feature maps) breaks outright. But an affine warp has
structure: for a block of output rows, the source y coordinates span a
narrow band (the homography is near-rectified for ranked MVS view pairs).
Within a block the bilinear resample therefore factors into dense matmuls

    T[m, (band, c)] = A_xw[m, w] @ V_band[w, band * c]      (MXU)
    out[m, c]       = sum_band A_yw[m, band] * T[m, band, c] (VPU)

with A_xw/A_yw the two-nonzero interpolation matrices built by broadcast
comparison. Blocks whose y-span exceeds the band fall back to the exact
gather path via lax.cond, so the result equals grid_sample_2d everywhere.

`bilinear_warp_banded` is a custom-VJP op: the backward wrt the source map
runs the transposed matmuls (a banded splat), replacing the pathological
scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .interp import grid_sample_2d
from .volume_grad import _axis_onehot


def _block_coords(grid_block, h, w):
    """Unnormalize one (RB, W_out, 2) grid block to pixel coords (flat)."""
    x = ((grid_block[..., 0] + 1.0) * 0.5 * (w - 1)).reshape(-1)
    y = ((grid_block[..., 1] + 1.0) * 0.5 * (h - 1)).reshape(-1)
    return x, y


def _axis_parts(coord, size):
    c0 = jnp.floor(coord)
    frac = coord - c0
    c0i = c0.astype(jnp.int32)
    m0 = (c0i >= 0) & (c0i <= size - 1)
    m1 = (c0i + 1 >= 0) & (c0i + 1 <= size - 1)
    return c0i, frac, m0, m1


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def bilinear_warp_banded(src, grid, row_block: int = 16, band: int = 32,
                         compute_dtype=jnp.float32):
    """Bilinear zeros-padded warp, align_corners=True; equals
    grid_sample_2d(src, grid, 'zeros').

    Args:
        src: (h, w, C) source map.
        grid: (..., W_out, 2) normalized coords; the second-to-last axis is
              contiguous output rows (blocked by `row_block`; the leading
              axes are flattened into the row stream).
        row_block: output rows per block (static).
        band: source-row band height (static); blocks with a wider y-span
              use the exact gather fallback.
    """
    return _warp_fwd_impl(src, grid, row_block, band, compute_dtype)


def _warp_fwd_impl(src, grid, row_block, band, compute_dtype=jnp.float32):
    h, w, C = src.shape
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
    blocks = grid_rows.reshape(-1, rb, w_out, 2)
    band_c = min(band, h)

    def per_block(gblk):
        x, y = _block_coords(gblk, h, w)          # (m,)
        m = x.shape[0]
        x0, fx, mx0, mx1 = _axis_parts(x, w)
        y0, fy, my0, my1 = _axis_parts(y, h)
        ymin = jnp.clip(jnp.min(jnp.where(my0 | my1, y0, h)), 0,
                        max(h - band_c, 0))
        ymax = jnp.max(jnp.where(my0 | my1, y0 + 1, 0))
        fits = ymax - ymin < band_c

        def banded(_):
            axw = _axis_onehot(x0, fx, mx0, mx1, w)            # (m, w)
            vband = jax.lax.dynamic_slice(src, (ymin, 0, 0),
                                          (band_c, w, C))
            vband = vband.transpose(1, 0, 2).reshape(w, band_c * C)
            t = jnp.dot(axw.astype(compute_dtype),
                        vband.astype(compute_dtype),
                        preferred_element_type=jnp.float32)    # (m, band*C)
            t = t.reshape(m, band_c, C)
            ayw = _axis_onehot(y0 - ymin, fy, my0, my1, band_c)
            return jnp.sum(ayw[..., None] * t, axis=1)

        def fallback(_):
            return grid_sample_2d(src, gblk.reshape(m, 2), "zeros")

        out = jax.lax.cond(fits, banded, fallback, None)
        return out.reshape(rb, w_out, C)

    out = jax.lax.map(per_block, blocks)
    out = out.reshape(-1, w_out, C)[:rows]
    return out.reshape(*lead, C)


def _warp_fwd(src, grid, row_block, band, compute_dtype):
    return (_warp_fwd_impl(src, grid, row_block, band, compute_dtype),
            (src, grid))


def _warp_bwd(row_block, band, compute_dtype, res, g):
    src, grid = res
    h, w, C = src.shape
    lead = grid.shape[:-1]
    w_out = grid.shape[-2]
    rows = 1
    for s in lead[:-1]:
        rows *= s

    # grid cotangent: gathers only — autodiff, DCE'd when grid is constant.
    _, vjp_grid = jax.vjp(lambda n: grid_sample_2d(src, n, "zeros"), grid)
    g_grid = vjp_grid(g)[0]

    grid_rows = grid.reshape(rows, w_out, 2)
    g_rows = g.reshape(rows, w_out, C)
    rb = min(row_block, rows)
    pad = (-rows) % rb
    if pad:
        grid_rows = jnp.pad(grid_rows, ((0, pad), (0, 0), (0, 0)),
                            constant_values=-2.0)
        g_rows = jnp.pad(g_rows, ((0, pad), (0, 0), (0, 0)))
    blocks = grid_rows.reshape(-1, rb, w_out, 2)
    gblocks = g_rows.reshape(-1, rb, w_out, C)
    band_c = min(band, h)

    def per_block(g_src, inputs):
        gblk, gcot = inputs
        x, y = _block_coords(gblk, h, w)
        m = x.shape[0]
        gc = gcot.reshape(m, C)
        x0, fx, mx0, mx1 = _axis_parts(x, w)
        y0, fy, my0, my1 = _axis_parts(y, h)
        ymin = jnp.clip(jnp.min(jnp.where(my0 | my1, y0, h)), 0,
                        max(h - band_c, 0))
        ymax = jnp.max(jnp.where(my0 | my1, y0 + 1, 0))
        fits = ymax - ymin < band_c

        def banded(gs):
            axw = _axis_onehot(x0, fx, mx0, mx1, w)            # (m, w)
            ayw = _axis_onehot(y0 - ymin, fy, my0, my1, band_c)  # (m, band)
            # u[m, (band, c)] = ayw ⊗ g
            u = (ayw[:, :, None] * gc[:, None, :]).reshape(m, band_c * C)
            gband = jnp.dot(axw.T.astype(compute_dtype),
                            u.astype(compute_dtype),
                            preferred_element_type=jnp.float32)  # (w, band*C)
            gband = gband.reshape(w, band_c, C).transpose(1, 0, 2)
            cur = jax.lax.dynamic_slice(gs, (ymin, 0, 0), (band_c, w, C))
            return jax.lax.dynamic_update_slice(gs, cur + gband,
                                                (ymin, 0, 0))

        def fallback(gs):
            _, vjp_src = jax.vjp(
                lambda s: grid_sample_2d(s, gblk.reshape(m, 2), "zeros"),
                src)
            return gs + vjp_src(gc)[0]

        return jax.lax.cond(fits, banded, fallback, g_src), None

    g_src = jnp.zeros_like(src) + 0.0 * g.reshape(-1)[0]
    g_src, _ = jax.lax.scan(per_block, g_src, (blocks, gblocks))
    return g_src, g_grid


bilinear_warp_banded.defvjp(_warp_fwd, _warp_bwd)
