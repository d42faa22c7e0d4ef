"""Fused Pallas TPU kernel for the plane-sweep bilinear warp.

The banded-matmul warp (ops/warp_fast.py) is exact and fast on the MXU, but
under XLA its per-block intermediate T[m, band*C] round-trips HBM (~42 GB
per source view at DTU resolution — reductions do not fuse into dot
outputs), leaving the sweep HBM-bound. This kernel keeps T in VMEM.

Layout (chosen so every in-kernel reshape is tile-preserving, i.e. free):

    source   V  : (h, Cp, w)  channel-major, Cp = channels padded to 8
    coords  x,y : (1, N)      source-pixel coordinates per output sample,
                              N = rows * w_out flattened row-major
    output      : (Cp, N)     channel-major warped features

Per grid step (one block of RB output rows = m = RB * w_out samples):

    V_band = V[ymin : ymin+band]            # (band, Cp, w) dynamic slice
    A_xw^T = onehot(x)                       # (w, m)   iota compare, VPU
    T^T    = V_band.reshape(band*Cp, w) @ A_xw^T          # MXU, stays VMEM
    out    = sum_k  A_yw^T[k] * T^T.view(band, Cp, m)[k]  # VPU band sum

The backward w.r.t. the source accumulates
    gV[ymin:ymin+band] += (A_yw ⊗ g).reshape(band*Cp, m) @ A_xw  (MXU)
directly into the (h, Cp, w) output ref across all grid steps — the whole
source-gradient lives in VMEM, so the backward's HBM traffic is just the
incoming cotangent.

Band contract: every block's source-y span must fit in `band` rows
(callers check `sweep_fits_band` and fall back to the exact gather warp —
same contract as ops/warp_fast.py). Out-of-range corners get zero weight
(zeros padding, align_corners=True), matching grid_sample_2d.

Reference semantics: utils.py:580-630 (homo_warp) — this is the TPU-native
replacement for its F.grid_sample plane sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .interp import grid_sample_2d
from .precision import INTERP


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_row_block(rows_per_plane: int, w_out: int,
                    target: int = 16, max_rows: int = 64):
    """Row-block size for the kernel: must divide rows_per_plane (blocks
    must not straddle planes — the y-band assumption holds only within one
    plane) AND give a lane count m = rb * w_out divisible by 128 (Mosaic
    block constraint). Prefers the divisor nearest `target`; returns None
    when no legal block exists (callers fall back to the gather warp)."""
    candidates = [b for b in range(1, min(rows_per_plane, max_rows) + 1)
                  if rows_per_plane % b == 0 and (b * w_out) % 128 == 0]
    if not candidates:
        return None
    return min(candidates, key=lambda b: (abs(b - target), b))


# --------------------------------------------------------------- forward ---


def _fwd_kernel(x_ref, y_ref, v_ref, out_ref, *, h, w, band, cp):
    xs = x_ref[0, :]                                   # (m,)
    ys = y_ref[0, :]
    m = xs.shape[0]

    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fx = xs - x0f
    fy = ys - y0f
    x0 = jnp.clip(x0f, -2.0, w + 1.0).astype(jnp.int32)
    y0 = jnp.clip(y0f, -2.0, h + 1.0).astype(jnp.int32)

    in_x0 = (x0 >= 0) & (x0 <= w - 1)
    in_x1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    in_y0 = (y0 >= 0) & (y0 <= h - 1)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)

    ymin = jnp.min(jnp.where(in_y0, y0, jnp.where(in_y1, y0 + 1, h)))
    ymin = jnp.clip(ymin, 0, max(h - band, 0))

    # A_xw^T (w, m): two-nonzero-per-column interpolation matrix
    xw = jax.lax.broadcasted_iota(jnp.int32, (w, m), 0)
    wx0 = jnp.where(in_x0, 1.0 - fx, 0.0)[None, :]
    wx1 = jnp.where(in_x1, fx, 0.0)[None, :]
    axw_t = (jnp.where(xw == x0[None, :], wx0, 0.0)
             + jnp.where(xw == x0[None, :] + 1, wx1, 0.0))

    # A_yw^T (band, m) relative to ymin
    off = y0 - ymin
    karr = jax.lax.broadcasted_iota(jnp.int32, (band, m), 0)
    wy0 = jnp.where(in_y0, 1.0 - fy, 0.0)[None, :]
    wy1 = jnp.where(in_y1, fy, 0.0)[None, :]
    ayw_t = (jnp.where(karr == off[None, :], wy0, 0.0)
             + jnp.where(karr == off[None, :] + 1, wy1, 0.0))

    vband = v_ref[pl.ds(ymin, band)]                   # (band, cp, w)
    t = jax.lax.dot_general(
        vband.reshape(band * cp, w), axw_t,
        (((1,), (0,)), ((), ())),
        precision=INTERP, preferred_element_type=jnp.float32)
    out_ref[:, :] = jnp.sum(t.reshape(band, cp, m) * ayw_t[:, None, :],
                            axis=0)


def _sweep_fwd_pallas(src_cw, xs, ys, band: int, m: int,
                      interpret: bool = False):
    """src_cw (h, cp, w); xs/ys (1, N) source-pixel coords; -> (cp, N)."""
    h, cp, w = src_cw.shape
    n = xs.shape[1]
    assert n % m == 0, (n, m)
    grid = (n // m,)

    kern = functools.partial(_fwd_kernel, h=h, w=w, band=band, cp=cp)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, cp, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cp, m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs, ys, src_cw)


# -------------------------------------------------------------- backward ---


def _bwd_kernel(x_ref, y_ref, g_ref, gv_ref, *, h, w, band, cp):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gv_ref[:, :, :] = jnp.zeros_like(gv_ref)

    xs = x_ref[0, :]
    ys = y_ref[0, :]
    m = xs.shape[0]

    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fx = xs - x0f
    fy = ys - y0f
    x0 = jnp.clip(x0f, -2.0, w + 1.0).astype(jnp.int32)
    y0 = jnp.clip(y0f, -2.0, h + 1.0).astype(jnp.int32)

    in_x0 = (x0 >= 0) & (x0 <= w - 1)
    in_x1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    in_y0 = (y0 >= 0) & (y0 <= h - 1)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)

    ymin = jnp.min(jnp.where(in_y0, y0, jnp.where(in_y1, y0 + 1, h)))
    ymin = jnp.clip(ymin, 0, max(h - band, 0))

    xw = jax.lax.broadcasted_iota(jnp.int32, (w, m), 0)
    wx0 = jnp.where(in_x0, 1.0 - fx, 0.0)[None, :]
    wx1 = jnp.where(in_x1, fx, 0.0)[None, :]
    axw_t = (jnp.where(xw == x0[None, :], wx0, 0.0)
             + jnp.where(xw == x0[None, :] + 1, wx1, 0.0))

    off = y0 - ymin
    karr = jax.lax.broadcasted_iota(jnp.int32, (band, m), 0)
    wy0 = jnp.where(in_y0, 1.0 - fy, 0.0)[None, :]
    wy1 = jnp.where(in_y1, fy, 0.0)[None, :]
    ayw_t = (jnp.where(karr == off[None, :], wy0, 0.0)
             + jnp.where(karr == off[None, :] + 1, wy1, 0.0))

    g = g_ref[:, :]                                    # (cp, m)
    gt = (ayw_t[:, None, :] * g[None, :, :]).reshape(band * cp, m)
    gband = jax.lax.dot_general(
        gt, axw_t, (((1,), (1,)), ((), ())),
        precision=INTERP, preferred_element_type=jnp.float32)
    gv_ref[pl.ds(ymin, band)] += gband.reshape(band, cp, w)


def _sweep_bwd_pallas(g_cw, xs, ys, h: int, w: int, band: int, m: int,
                      interpret: bool = False):
    """g_cw (cp, N) cotangent; -> grad src (h, cp, w)."""
    cp, n = g_cw.shape
    assert n % m == 0, (n, m)
    grid = (n // m,)

    kern = functools.partial(_bwd_kernel, h=h, w=w, band=band, cp=cp)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, m), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, cp, w), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, cp, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xs, ys, g_cw)


# ------------------------------------------------------------ public API ---


def sweep_fits_band(grid, h: int, row_block: int, band: int):
    """Whether every row_block-row block's source-y span fits the band
    (same contract as ops/warp_fast._prep). grid: (..., w_out, 2)
    normalized coords; blocks are consecutive output rows."""
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    return sweep_fits_band_pix(y, h, y.shape[-1], row_block, band)


def sweep_fits_band_pix(ys_pix, h: int, w_out: int, row_block: int,
                        band: int):
    """sweep_fits_band on flat source-PIXEL y coords (1, D*rows*w_out) —
    the no-(..., 2)-tensor path (plane_sweep_pix_coords)."""
    rows = ys_pix.reshape(-1, w_out)
    blocks = rows.reshape(-1, row_block, w_out)
    y0 = jnp.floor(jnp.clip(blocks, -2.0, h + 1.0)).astype(jnp.int32)
    in_y0 = (y0 >= 0) & (y0 <= h - 1)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    # rows actually read: y0 where its corner is in range, y0+1 likewise
    needed_min = jnp.where(in_y0, y0, jnp.where(in_y1, y0 + 1, h))
    needed_max = jnp.where(in_y1, y0 + 1, jnp.where(in_y0, y0, -1))
    ymin = jnp.clip(jnp.min(needed_min, axis=(1, 2)), 0, max(h - band, 0))
    ymax = jnp.max(needed_max, axis=(1, 2))
    return jnp.all(ymax - ymin < band)


def _auto_interpret(interpret):
    """interpret=None -> interpret automatically off-TPU so the same code
    runs in CPU tests and the CPU-mesh multichip dryrun."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def bilinear_warp_pallas(src, grid, row_block: int = 16, band: int = 32,
                         interpret: bool | None = None):
    """Bilinear zeros-padded warp (align_corners=True) as one fused Pallas
    kernel; equals grid_sample_2d(src, grid, 'zeros') whenever the band
    contract holds (callers must check `sweep_fits_band` / know the
    geometry; the kernel clamps silently otherwise).

    Args:
        src: (h, w, C) channel-last source map.
        grid: (..., w_out, 2) normalized coords; second-to-last axis is
              contiguous output rows. The number of rows per plane
              (= prod of leading dims except the last) must be divisible
              by row_block.
        row_block: output rows per kernel block.
        band: source-row band height (static).

    Returns:
        (..., C) warped features (float32).

    The backward wrt `src` runs the transposed kernel (grid cotangent is
    zeros — camera geometry is not trained, cf. warp_fast grid_grad).
    """
    return _warp_fwd_impl(src, grid, row_block, band, interpret)


def _pix_coords(grid, h, w):
    """Flat (1, N) source-pixel coordinate arrays. Kept 2-D with the sample
    axis in lanes: a (..., 2)-shaped residual would be tile-padded 2->128
    lanes by XLA when saved for the backward (measured 2.4 GB per view at
    DTU resolution)."""
    xy = grid.reshape(1, -1, 2)
    xs = (xy[..., 0] + 1.0) * 0.5 * (w - 1)
    ys = (xy[..., 1] + 1.0) * 0.5 * (h - 1)
    return xs, ys


def _warp_fwd_impl(src, grid, row_block, band, interpret):
    h, w, c = src.shape
    lead = grid.shape[:-1]
    w_out = grid.shape[-2]
    cp = _round_up(c, 8)
    src_cw = jnp.pad(src, ((0, 0), (0, 0), (0, cp - c))).transpose(0, 2, 1)

    xs, ys = _pix_coords(grid, h, w)
    m = row_block * w_out
    out = _sweep_fwd_pallas(src_cw, xs, ys, band, m,
                            _auto_interpret(interpret))   # (cp, N)
    return out[:c].T.reshape(*lead, c)


def _warp_fwd_rule(src, grid, row_block, band, interpret):
    h, w, _ = src.shape
    xs, ys = _pix_coords(grid, h, w)
    out = _warp_fwd_impl(src, grid, row_block, band, interpret)
    # residuals avoid the (..., 2) grid layout (see _pix_coords)
    return out, (src, xs, ys)


def _warp_bwd_rule(row_block, band, interpret, res, g):
    src, xs, ys = res
    h, w, c = src.shape
    # grid shape is the output's leading shape + a coordinate pair
    grid_shape = (*g.shape[:-1], 2)
    w_out = grid_shape[-2]
    cp = _round_up(c, 8)
    g_cw = jnp.pad(g.reshape(-1, c).T, ((0, cp - c), (0, 0)))
    m = row_block * w_out
    gv = _sweep_bwd_pallas(g_cw, xs, ys, h, w, band, m,
                           _auto_interpret(interpret))
    g_src = gv.transpose(0, 2, 1)[:, :, :c]
    return g_src, jnp.zeros(grid_shape, xs.dtype)


bilinear_warp_pallas.defvjp(_warp_fwd_rule, _warp_bwd_rule)


# ----------------------------------------------- fused variance sweep ------
#
# The full cost-volume forward (models.py:839-893) in ONE kernel: per block
# of m = rb * wp samples (rb output rows of one sweep plane), warp every
# source view's [feat | rgb] with the banded one-hot matmuls above, keep the
# warped features in VMEM, accumulate the masked cross-view mean/variance,
# and write the 41-channel cost block. Nothing per-view ever touches HBM —
# the separate-warp + XLA-assembly formulation round-trips ~4 GB of warped
# tensors per direction at DTU resolution.
#
# The reference view contributes its own (unwarped, zero-padded) features at
# every plane; its rows enter as a VMEM-resident (bpp, cp, m) repack indexed
# by the block's row position. Backward recomputes the warps in-kernel
# (2 extra MXU passes, far cheaper than saving them), applies the variance
# chain rule, and splat-transposes per-view gradients into VMEM-resident
# accumulators (same contract as _bwd_kernel).


def _warp_block(xs, ys, v_ref, h, w, band, cp):
    """Shared banded warp for one block: (cp, m) warped values + the pieces
    the backward reuses (axw_t, ayw_t, ymin)."""
    m = xs.shape[0]
    y0 = jnp.clip(jnp.floor(ys), -2.0, h + 1.0).astype(jnp.int32)
    in_y0 = (y0 >= 0) & (y0 <= h - 1)
    in_y1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)

    ymin = jnp.min(jnp.where(in_y0, y0, jnp.where(in_y1, y0 + 1, h)))
    ymin = jnp.clip(ymin, 0, max(h - band, 0))

    # Triangle-hat interpolation matrices: weight(row i, sample j) =
    # max(0, 1 - |i - x_j|) equals the floor/frac bilinear weights exactly
    # (same subtractions on the same floats) and gives zeros-padding for
    # free: rows outside the image simply don't exist, and the hat already
    # vanishes beyond 1 px. ~40% fewer VPU ops than compare+select one-hot
    # builds, which cost ~22 ms/step at DTU scale (measured by stubbing).
    xw = jax.lax.broadcasted_iota(jnp.int32, (w, m), 0).astype(jnp.float32)
    axw_t = jnp.maximum(0.0, 1.0 - jnp.abs(xw - xs[None, :]))

    karr = jax.lax.broadcasted_iota(jnp.int32, (band, m), 0).astype(
        jnp.float32)
    ayw_t = jnp.maximum(
        0.0, 1.0 - jnp.abs(karr - (ys - ymin.astype(jnp.float32))[None, :]))

    vband = v_ref[pl.ds(ymin, band)]                  # (band, cp, w)
    t = jax.lax.dot_general(
        vband.reshape(band * cp, w), axw_t,
        (((1,), (0,)), ((), ())),
        precision=INTERP, preferred_element_type=jnp.float32)
    warped = jnp.sum(t.reshape(band, cp, m) * ayw_t[:, None, :], axis=0)
    return warped, axw_t, ayw_t, ymin


def _mask_block(xs, ys, h, w):
    """Strict in-bounds mask from source-pixel coords — equals
    in_bounds_mask(grid) (models.py:874-877): grid in (-1, 1) exclusive."""
    return ((xs > 0.0) & (xs < w - 1.0)
            & (ys > 0.0) & (ys < h - 1.0)).astype(jnp.float32)


def _fused_fwd_kernel(x_ref, y_ref, refb_ref, *rest, h, w, band, cp,
                      n_src, bpp, c_feat, c_img):
    src_refs = rest[:n_src]
    out_ref = rest[n_src]
    i = pl.program_id(0)
    rowblock = jax.lax.rem(i, bpp)

    ref_cm = refb_ref[pl.ds(rowblock, 1)].reshape(refb_ref.shape[1],
                                                  refb_ref.shape[2])
    vsum = ref_cm[:c_feat]
    vsq = ref_cm[:c_feat] ** 2
    m = x_ref.shape[2]
    count = jnp.ones((1, m), jnp.float32)

    wimgs = []
    for v in range(n_src):
        xs = x_ref[v, 0, :]
        ys = y_ref[v, 0, :]
        warped, _, _, _ = _warp_block(xs, ys, src_refs[v], h, w, band, cp)
        vsum = vsum + warped[:c_feat]
        vsq = vsq + warped[:c_feat] ** 2
        wimgs.append(warped[c_feat:c_feat + c_img])
        count = count + _mask_block(xs, ys, h, w)[None, :]

    invc = 1.0 / count
    mean = vsum * invc
    var = vsq * invc - mean * mean

    out_ref[0:c_img, :] = ref_cm[c_feat:c_feat + c_img]
    for v in range(n_src):
        out_ref[c_img * (1 + v):c_img * (2 + v), :] = wimgs[v]
    base = c_img * (1 + n_src)
    out_ref[base:base + c_feat, :] = var
    cc = out_ref.shape[0]
    if cc > base + c_feat:
        out_ref[base + c_feat:, :] = jnp.zeros((cc - base - c_feat, m),
                                               jnp.float32)


def _fused_bwd_kernel(x_ref, y_ref, refb_ref, *rest, h, w, band, cp,
                      n_src, bpp, c_feat, c_img, bpg=None):
    src_refs = rest[:n_src]
    g_ref = rest[n_src]
    gsrc_refs = rest[n_src + 1:2 * n_src + 1]
    grefb_ref = rest[2 * n_src + 1]
    if bpg is None:                       # 1-D grid: one global accumulator
        i = pl.program_id(0)
        first = i == 0
    else:                                 # 2-D grid: (group, block-in-group)
        i = pl.program_id(0) * bpg + pl.program_id(1)
        first = pl.program_id(1) == 0
    rowblock = jax.lax.rem(i, bpp)

    @pl.when(first)
    def _():
        for v in range(n_src):
            gsrc_refs[v][...] = jnp.zeros_like(gsrc_refs[v])
        grefb_ref[...] = jnp.zeros_like(grefb_ref)

    ref_cm = refb_ref[pl.ds(rowblock, 1)].reshape(refb_ref.shape[1],
                                                  refb_ref.shape[2])
    m = x_ref.shape[2]

    # recompute the forward accumulation
    vsum = ref_cm[:c_feat]
    count = jnp.ones((1, m), jnp.float32)
    warps = []
    for v in range(n_src):
        xs = x_ref[v, 0, :]
        ys = y_ref[v, 0, :]
        warped, axw_t, ayw_t, ymin = _warp_block(xs, ys, src_refs[v],
                                                 h, w, band, cp)
        warps.append((warped, axw_t, ayw_t, ymin))
        vsum = vsum + warped[:c_feat]
        count = count + _mask_block(xs, ys, h, w)[None, :]
    invc = 1.0 / count
    mean = vsum * invc

    base = c_img * (1 + n_src)
    g_var = g_ref[base:base + c_feat, :]              # (c_feat, m)
    two_invc = 2.0 * invc

    for v in range(n_src):
        warped, axw_t, ayw_t, ymin = warps[v]
        g_feat = g_var * (two_invc * (warped[:c_feat] - mean))
        g_img = g_ref[c_img * (1 + v):c_img * (2 + v), :]
        g_cat = jnp.concatenate(
            [g_feat, g_img,
             jnp.zeros((cp - c_feat - c_img, m), jnp.float32)], axis=0)
        gt = (ayw_t[:, None, :] * g_cat[None, :, :]).reshape(band * cp, m)
        gband = jax.lax.dot_general(
            gt, axw_t, (((1,), (1,)), ((), ())),
            precision=INTERP, preferred_element_type=jnp.float32)
        upd = gband.reshape(band, cp, w)
        if bpg is None:
            gsrc_refs[v][pl.ds(ymin, band)] += upd
        else:
            gsrc_refs[v][0, pl.ds(ymin, band)] += upd

    g_ref_feat = g_var * (two_invc * (ref_cm[:c_feat] - mean))
    g_ref_img = g_ref[0:c_img, :]
    g_ref_cat = jnp.concatenate(
        [g_ref_feat, g_ref_img,
         jnp.zeros((cp - c_feat - c_img, m), jnp.float32)], axis=0)
    if bpg is None:
        grefb_ref[pl.ds(rowblock, 1)] += g_ref_cat[None]
    else:
        grefb_ref[0, pl.ds(rowblock, 1)] += g_ref_cat[None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def cost_volume_fused_pallas(srcs_cw, refb, xs, ys, static,
                             interpret: bool | None = None):
    """Fused plane-sweep + cross-view-variance cost volume.

    Args:
        srcs_cw: (V-1, h, cp, w) channel-major per-view [feat(32) | rgb(3)]
                 sources, cp padded to a multiple of 8.
        refb: (bpp, cp, m) reference [feat | rgb] repacked by output row
              block (bpp = hp / rb row blocks, m = rb * wp samples).
        xs, ys: (V-1, 1, N) source-pixel coords, N = D * hp * wp flattened
                plane-major.
        static: dict(band=, m=, bpp=, c_feat=, c_img=, cc=) — hashable via
                tuple(sorted(...)) wrapper below.

    Returns:
        cost (cc, N): channels [ref rgb, per-view warped rgb, variance,
        zero pad], matching models.py:858-860 ordering.
    """
    return _fused_fwd_impl(srcs_cw, refb, xs, ys, static, interpret)


class _Static(dict):
    """Hashable static-config dict for custom_vjp nondiff args."""

    def __hash__(self):
        return hash(tuple(sorted(self.items())))

    def __eq__(self, other):
        return dict.__eq__(self, other)


def _fused_common_specs(srcs_cw, refb, m):
    n_src, h, cp, w = srcs_cw.shape
    return [
        pl.BlockSpec((n_src, 1, m), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_src, 1, m), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(refb.shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((h, cp, w), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(n_src)
    ]


def _fused_fwd_impl(srcs_cw, refb, xs, ys, static, interpret):
    n_src, h, cp, w = srcs_cw.shape
    n = xs.shape[2]
    m = static["m"]
    cc = static["cc"]
    kern = functools.partial(
        _fused_fwd_kernel, h=h, w=w, band=static["band"], cp=cp,
        n_src=n_src, bpp=static["bpp"], c_feat=static["c_feat"],
        c_img=static["c_img"])
    return pl.pallas_call(
        kern,
        grid=(n // m,),
        in_specs=_fused_common_specs(srcs_cw, refb, m),
        out_specs=pl.BlockSpec((cc, m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cc, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # fwd blocks are independent -> let Mosaic pipeline freely
            dimension_semantics=("parallel",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(xs, ys, refb, *[srcs_cw[v] for v in range(n_src)])


def _fused_fwd_rule(srcs_cw, refb, xs, ys, static, interpret):
    out = _fused_fwd_impl(srcs_cw, refb, xs, ys, static, interpret)
    return out, (srcs_cw, refb, xs, ys)


def _fused_bwd_rule(static, interpret, res, g):
    srcs_cw, refb, xs, ys = res
    n_src, h, cp, w = srcs_cw.shape
    n = xs.shape[2]
    m = static["m"]
    groups = static.get("bwd_groups", 1)
    nblk = n // m
    kernel_kw = dict(h=h, w=w, band=static["band"], cp=cp, n_src=n_src,
                     bpp=static["bpp"], c_feat=static["c_feat"],
                     c_img=static["c_img"])
    if groups > 1:
        # Per-group partial accumulators over a parallel leading grid axis:
        # the single shared accumulator chains every block sequentially
        # ("arbitrary" semantics); G independent accumulators let Mosaic
        # overlap the finished group's output DMA with the next group's
        # compute. The G partials are summed in XLA afterwards.
        assert nblk % groups == 0, (nblk, groups)
        bpg = nblk // groups
        out_shapes = tuple(
            [jax.ShapeDtypeStruct((groups, h, cp, w), jnp.float32)] * n_src
            + [jax.ShapeDtypeStruct((groups,) + refb.shape, jnp.float32)])
        out_specs = tuple(
            [pl.BlockSpec((1, h, cp, w), lambda gi, j: (gi, 0, 0, 0),
                          memory_space=pltpu.VMEM)] * n_src
            + [pl.BlockSpec((1,) + refb.shape,
                            lambda gi, j: (gi, 0, 0, 0),
                            memory_space=pltpu.VMEM)])
        blk = lambda gi, j: gi * bpg + j  # noqa: E731
        in_specs = [
            pl.BlockSpec((n_src, 1, m), lambda gi, j: (0, 0, blk(gi, j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_src, 1, m), lambda gi, j: (0, 0, blk(gi, j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(refb.shape, lambda gi, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((h, cp, w), lambda gi, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_src)
        ] + [
            pl.BlockSpec((static["cc"], m), lambda gi, j: (0, blk(gi, j)),
                         memory_space=pltpu.VMEM),
        ]
        grid = (groups, bpg)
        semantics = ("parallel", "arbitrary")
        kernel_kw["bpg"] = bpg
    else:
        out_shapes = tuple(
            [jax.ShapeDtypeStruct((h, cp, w), jnp.float32)] * n_src
            + [jax.ShapeDtypeStruct(refb.shape, jnp.float32)])
        out_specs = tuple(
            [pl.BlockSpec((h, cp, w), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)] * n_src
            + [pl.BlockSpec(refb.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)])
        in_specs = _fused_common_specs(srcs_cw, refb, m) + [
            pl.BlockSpec((static["cc"], m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        grid = (nblk,)
        semantics = ("arbitrary",)
    kernel = functools.partial(_fused_bwd_kernel, **kernel_kw)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(xs, ys, refb, *[srcs_cw[v] for v in range(n_src)], g)
    if groups > 1:
        outs = [o.sum(axis=0) for o in outs]
    g_srcs = jnp.stack(outs[:n_src], axis=0)
    g_refb = outs[n_src]
    return (g_srcs, g_refb, jnp.zeros_like(xs), jnp.zeros_like(ys))


cost_volume_fused_pallas.defvjp(_fused_fwd_rule, _fused_bwd_rule)
