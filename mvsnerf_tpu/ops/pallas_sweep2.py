"""x-windowed fused plane-sweep cost volume (v2 of ops/pallas_sweep.py).

Why a v2: the v1 fused kernel's warp matmul contracts a one-hot over the
FULL source width — per sample per view 2*band*cp*w FLOPs (2*16*40*160 =
819k at DTU scale), which puts the whole cost-volume build at ~114 ms
fwd+bwd, MXU-COMPUTE-BOUND at essentially peak (round-3/4 profiles; the
FLOP estimate 2*band*cp*w*N/197e12 reproduces the measured time). The only
way down is fewer FLOPs, not better overlap.

The v2 exploits X locality the way ops/pallas_volgather2.py exploits Y
locality: output samples are repacked into (8 row x 16 col) = 128-sample
tiles, and each tile's bilinear taps fall in a narrow source window
(near-rectified plane-sweep homographies are ~affine: 16 output columns
span ~18 source columns). Per tile the kernel

    1. slices the source window  V[ymin : ymin+bandp, xmin8 : xmin8+wb, :]
       -- y on dim0 (unconstrained dynamic offset), x on SUBLANES
       (8-aligned via floor8), cp on lanes; the (bandp, wb, cp) window
       reshapes FREE to B (bandp*wb, cp) in (y, x)-major row order;
    2. builds the JOINT bilinear weight matrix
       W2[j, s] = hat(yj(j) - ys[s]) * hat(xj(j) - xs[s]),
       j = y*wb + x (wb = 32 a power of two so yj = j >> 5, xj = j & 31
       are shift/mask VPU ops on a 2-D iota);
    3. one dot contracts the composite (y, x) axis:
       warped[cp, s] = sum_j B[j, cp] * W2[j, s]
       -- both bilinear directions inside ONE matmul, output directly
       channel-major (no in-kernel transposes anywhere).

Per-sample FLOPs: 2*bandp*wb*cp = 2*16*32*40 = 41k logical (~3.1x fewer
MXU-equivalent than v1 after the cp=40-lane padding of the output M dim).
The backward is the transposed dot, gB = W2 @ g^T accumulated into the
same (dim0, sublane8) window of the source-gradient ref.

Cross-view variance, masks, channel ordering and zeros-padding semantics
are identical to v1 (reference models.py:839-893 build_volume_costvar_img;
utils.py:580-630 homo_warp). Callers check `xband_fits` host-side and
lax.cond-fall back to the v1 kernel when a tile violates the window
contract (same pattern as the v1 -> gather fallback).

Tile order: callers repack coords/ref lanes with `tile_lanes` and un-tile
the (cc, N) output with `untile_lanes` (pure XLA transposes, ~2 ms at DTU
scale against ~65 ms of MXU savings).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweep import _Static, _auto_interpret
from .precision import INTERP

TR, TC, MC = 8, 16, 128      # tile rows x cols = samples (one lane group)


# ------------------------------------------------------------ packing -----


def tile_lanes(x, wp: int, tr: int = TR, tc: int = TC):
    """Repack the last axis from row-band-row-major to tile-major order.

    x: (..., N) with N = nband * tr * wp, each row band laid out
    row-major (tr, wp). Returns the same shape with each band's lanes
    reordered to (wp // tc, tr, tc) tile-major."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    nct = wp // tc
    xb = x.reshape(*lead, n // (tr * wp), tr, nct, tc)
    xb = jnp.swapaxes(xb, -3, -2)            # (..., nband, nct, tr, tc)
    return xb.reshape(*lead, n)


def untile_lanes(x, wp: int, tr: int = TR, tc: int = TC):
    """Inverse of tile_lanes."""
    lead = x.shape[:-1]
    n = x.shape[-1]
    nct = wp // tc
    xb = x.reshape(*lead, n // (tr * wp), nct, tr, tc)
    xb = jnp.swapaxes(xb, -3, -2)
    return xb.reshape(*lead, n)


def xband_shape_ok(hp: int, wp: int, h: int, w: int,
                   wb: int = 32, bandp: int = 16) -> bool:
    """Static shape gate for the xband kernel."""
    return (hp % TR == 0 and wp % TC == 0 and wb >= 16 and wb % 8 == 0
            and w >= wb and h >= bandp
            and (w - wb) % 8 == 0)        # xmin clip bound stays 8-aligned


def _tile_mins(cx, cy, h, w, wb, bandp):
    """Per-tile window starts exactly as the kernel computes them.

    cx, cy: (..., MC) clipped source-pixel coords, tile on last axis.
    Returns (xmin8, ymin) int32 of shape (...,)."""
    xmin = jnp.clip(jnp.floor(jnp.min(cx, -1)), 0.0, w - wb)
    xmin8 = (xmin.astype(jnp.int32) // 8) * 8
    ymin = jnp.clip(jnp.floor(jnp.min(cy, -1)), 0.0, h - bandp)
    return xmin8, ymin.astype(jnp.int32)


def xband_fits(xs, ys, h: int, w: int, wb: int = 32,
               bandp: int = 16) -> jnp.ndarray:
    """True iff EVERY tile's in-image bilinear taps fit its (wb, bandp)
    window (callers lax.cond to the v1 kernel otherwise).

    xs, ys: (V-1, 1, N) TILE-MAJOR source-pixel coords."""
    v = xs.shape[0]
    cx = jnp.clip(xs, -2.0, w + 1.0).reshape(v, -1, MC)
    cy = jnp.clip(ys, -2.0, h + 1.0).reshape(v, -1, MC)
    xmin8, ymin = _tile_mins(cx, cy, h, w, wb, bandp)
    # highest in-image tap column/row actually needed by any sample
    xhi = jnp.min(jnp.stack([jnp.max(jnp.floor(cx), -1) + 1.0,
                             jnp.full(cx.shape[:-1], w - 1.0)]), 0)
    yhi = jnp.min(jnp.stack([jnp.max(jnp.floor(cy), -1) + 1.0,
                             jnp.full(cy.shape[:-1], h - 1.0)]), 0)
    ok_x = xhi <= xmin8.astype(jnp.float32) + wb - 1
    ok_y = yhi <= ymin.astype(jnp.float32) + bandp - 1
    return jnp.all(ok_x & ok_y)


# ------------------------------------------------------------- kernels ----


def _xb_warp_tile(xs, ys, v_ref, h, w, cp, wb, bandp):
    """One (cp, MC) warped tile + the pieces the backward reuses.

    The joint weight matrix is built as a broadcast PRODUCT of the two
    small per-axis hat matrices — wx (1, wb, MC) x wy (bandp, 1, MC) —
    instead of hat-evaluating a (bandp*wb, MC) iota twice: ~2.5x fewer
    large-vector VPU ops (the v5e VPU, not the MXU, limits this kernel)."""
    mc = xs.shape[0]
    cx = jnp.clip(xs, -2.0, w + 1.0)
    cy = jnp.clip(ys, -2.0, h + 1.0)
    xmin = jnp.clip(jnp.floor(jnp.min(cx)), 0.0, float(w - wb))
    xmin8 = (xmin.astype(jnp.int32) // 8) * 8
    ymin = jnp.clip(jnp.floor(jnp.min(cy)), 0.0,
                    float(h - bandp)).astype(jnp.int32)

    vwin = v_ref[pl.ds(ymin, bandp), pl.ds(xmin8, wb), :]
    b = vwin.reshape(bandp * wb, cp)                  # (y, x)-major rows

    # triangle-hat bilinear weights vs ABSOLUTE tap coords: rows outside
    # the image don't exist in the window => zeros padding for free
    xi = jax.lax.broadcasted_iota(jnp.int32, (1, wb, mc), 1).astype(
        jnp.float32)
    yi = jax.lax.broadcasted_iota(jnp.int32, (bandp, 1, mc), 0).astype(
        jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(
        xi + xmin8.astype(jnp.float32) - cx[None, None, :]))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(
        yi + ymin.astype(jnp.float32) - cy[None, None, :]))
    w2 = (wy * wx).reshape(bandp * wb, mc)            # (bandp*wb, MC)

    warped = jax.lax.dot_general(
        b, w2, (((0,), (0,)), ((), ())),
        precision=INTERP, preferred_element_type=jnp.float32)  # (cp, MC)
    return warped, w2, xmin8, ymin


def _mask_tile(xs, ys, h, w):
    """Strict in-bounds mask (grid in (-1, 1) exclusive, models.py:874-877)."""
    return ((xs > 0.0) & (xs < w - 1.0)
            & (ys > 0.0) & (ys < h - 1.0)).astype(jnp.float32)


def _xb_fwd_kernel(x_ref, y_ref, refb_ref, *rest, h, w, cp, n_src, bpp,
                   c_feat, c_img, wb, bandp, nct):
    src_refs = rest[:n_src]
    out_ref = rest[n_src]
    i = pl.program_id(0)
    rowblock = jax.lax.rem(i, bpp)
    ref_cm = refb_ref[pl.ds(rowblock, 1)].reshape(refb_ref.shape[1],
                                                  refb_ref.shape[2])
    cc = out_ref.shape[0]
    for t in range(nct):
        sl = slice(t * MC, (t + 1) * MC)              # static lane slice
        ref_t = ref_cm[:, sl]
        vsum = ref_t[:c_feat]
        vsq = ref_t[:c_feat] ** 2
        count = jnp.ones((1, MC), jnp.float32)
        wimgs = []
        for v in range(n_src):
            xs = x_ref[v, 0, sl]
            ys = y_ref[v, 0, sl]
            warped, _, _, _ = _xb_warp_tile(xs, ys, src_refs[v], h, w,
                                            cp, wb, bandp)
            vsum = vsum + warped[:c_feat]
            vsq = vsq + warped[:c_feat] ** 2
            wimgs.append(warped[c_feat:c_feat + c_img])
            count = count + _mask_tile(xs, ys, h, w)[None, :]
        invc = 1.0 / count
        mean = vsum * invc
        var = vsq * invc - mean * mean

        out_ref[0:c_img, sl] = ref_t[c_feat:c_feat + c_img]
        for v in range(n_src):
            out_ref[c_img * (1 + v):c_img * (2 + v), sl] = wimgs[v]
        base = c_img * (1 + n_src)
        out_ref[base:base + c_feat, sl] = var
        if cc > base + c_feat:
            out_ref[base + c_feat:, sl] = jnp.zeros(
                (cc - base - c_feat, MC), jnp.float32)


def _xb_bwd_kernel(x_ref, y_ref, refb_ref, *rest, h, w, cp, n_src, bpp,
                   c_feat, c_img, wb, bandp, nct):
    src_refs = rest[:n_src]
    g_ref = rest[n_src]
    gsrc_refs = rest[n_src + 1:2 * n_src + 1]
    grefb_ref = rest[2 * n_src + 1]
    i = pl.program_id(0)
    rowblock = jax.lax.rem(i, bpp)

    @pl.when(i == 0)
    def _():
        for v in range(n_src):
            gsrc_refs[v][...] = jnp.zeros_like(gsrc_refs[v])
        grefb_ref[...] = jnp.zeros_like(grefb_ref)

    ref_cm = refb_ref[pl.ds(rowblock, 1)].reshape(refb_ref.shape[1],
                                                  refb_ref.shape[2])
    base = c_img * (1 + n_src)
    for t in range(nct):
        sl = slice(t * MC, (t + 1) * MC)
        ref_t = ref_cm[:, sl]
        # recompute the forward accumulation for this tile
        vsum = ref_t[:c_feat]
        count = jnp.ones((1, MC), jnp.float32)
        warps = []
        for v in range(n_src):
            xs = x_ref[v, 0, sl]
            ys = y_ref[v, 0, sl]
            warped, w2, xmin8, ymin = _xb_warp_tile(
                xs, ys, src_refs[v], h, w, cp, wb, bandp)
            warps.append((warped, w2, xmin8, ymin))
            vsum = vsum + warped[:c_feat]
            count = count + _mask_tile(xs, ys, h, w)[None, :]
        invc = 1.0 / count
        mean = vsum * invc
        g_var = g_ref[base:base + c_feat, sl]
        two_invc = 2.0 * invc

        for v in range(n_src):
            warped, w2, xmin8, ymin = warps[v]
            g_feat = g_var * (two_invc * (warped[:c_feat] - mean))
            g_img = g_ref[c_img * (1 + v):c_img * (2 + v), sl]
            g_cat = jnp.concatenate(
                [g_feat, g_img,
                 jnp.zeros((cp - c_feat - c_img, MC), jnp.float32)],
                axis=0)                               # (cp, MC)
            gb = jax.lax.dot_general(
                w2, g_cat, (((1,), (1,)), ((), ())),
                precision=INTERP,
                preferred_element_type=jnp.float32)   # (bandp*wb, cp)
            gsrc_refs[v][pl.ds(ymin, bandp),
                         pl.ds(xmin8, wb), :] += gb.reshape(bandp, wb, cp)

        g_ref_feat = g_var * (two_invc * (ref_t[:c_feat] - mean))
        g_ref_img = g_ref[0:c_img, sl]
        pad_rows = refb_ref.shape[1] - c_feat - c_img
        g_ref_cat = jnp.concatenate(
            [g_ref_feat, g_ref_img,
             jnp.zeros((pad_rows, MC), jnp.float32)], axis=0)
        grefb_ref[pl.ds(rowblock, 1), :, sl] += g_ref_cat[None]


# ----------------------------------------------------------- custom VJP ---


def _xb_specs(srcs_hwc, refb, m):
    n_src, h, w, cp = srcs_hwc.shape
    return [
        pl.BlockSpec((n_src, 1, m), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_src, 1, m), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(refb.shape, lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((h, w, cp), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(n_src)
    ]


def _xb_fwd_impl(srcs_hwc, refb, xs, ys, static, interpret):
    n_src, h, w, cp = srcs_hwc.shape
    n = xs.shape[2]
    m = static["m"]
    cc = static["cc"]
    kern = functools.partial(
        _xb_fwd_kernel, h=h, w=w, cp=cp, n_src=n_src, bpp=static["bpp"],
        c_feat=static["c_feat"], c_img=static["c_img"], wb=static["wb"],
        bandp=static["bandp"], nct=m // MC)
    return pl.pallas_call(
        kern,
        grid=(n // m,),
        in_specs=_xb_specs(srcs_hwc, refb, m),
        out_specs=pl.BlockSpec((cc, m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cc, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(xs, ys, refb, *[srcs_hwc[v] for v in range(n_src)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def cost_volume_xband_pallas(srcs_hwc, refb, xs, ys, static,
                             interpret: bool | None = None):
    """x-windowed fused plane-sweep + cross-view-variance cost volume.

    Args:
        srcs_hwc: (V-1, h, w, cp) CHANNEL-LAST per-view [feat | rgb]
            sources, cp a multiple of 8 (natural layout — no transpose).
        refb: (bpp, cp, m) reference repacked by row band with TILE-MAJOR
            lanes (tile_lanes), m = TR * wp samples per band.
        xs, ys: (V-1, 1, N) TILE-MAJOR source-pixel coords.
        static: _Static(band unused, m=, bpp=, c_feat=, c_img=, cc=,
            wb=, bandp=).

    Returns:
        cost (cc, N) TILE-MAJOR: channels [ref rgb, per-view warped rgb,
        variance, zero pad] (models.py:858-860 ordering); callers
        untile_lanes it back to row-major.
    """
    return _xb_fwd_impl(srcs_hwc, refb, xs, ys, static, interpret)


def _xb_fwd_rule(srcs_hwc, refb, xs, ys, static, interpret):
    out = _xb_fwd_impl(srcs_hwc, refb, xs, ys, static, interpret)
    return out, (srcs_hwc, refb, xs, ys)


def _xb_bwd_rule(static, interpret, res, g):
    srcs_hwc, refb, xs, ys = res
    n_src, h, w, cp = srcs_hwc.shape
    n = xs.shape[2]
    m = static["m"]
    kern = functools.partial(
        _xb_bwd_kernel, h=h, w=w, cp=cp, n_src=n_src, bpp=static["bpp"],
        c_feat=static["c_feat"], c_img=static["c_img"], wb=static["wb"],
        bandp=static["bandp"], nct=m // MC)
    out_shapes = tuple(
        [jax.ShapeDtypeStruct((h, w, cp), jnp.float32)] * n_src
        + [jax.ShapeDtypeStruct(refb.shape, jnp.float32)])
    out_specs = tuple(
        [pl.BlockSpec((h, w, cp), lambda i: (0, 0, 0),
                      memory_space=pltpu.VMEM)] * n_src
        + [pl.BlockSpec(refb.shape, lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)])
    in_specs = _xb_specs(srcs_hwc, refb, m) + [
        pl.BlockSpec((static["cc"], m), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    outs = pl.pallas_call(
        kern,
        grid=(n // m,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(xs, ys, refb, *[srcs_hwc[v] for v in range(n_src)], g)
    g_srcs = jnp.stack(outs[:n_src], axis=0)
    g_refb = outs[n_src]
    return (g_srcs, g_refb, jnp.zeros_like(xs), jnp.zeros_like(ys))


cost_volume_xband_pallas.defvjp(_xb_fwd_rule, _xb_bwd_rule)


# ------------------------------------------------- packed16 repack kernel --


def _pack16_kernel(in_ref, out_ref, *, ct, nct, cc, m, q):
    """One (plane-group, q row-bands) block: 16 planes' (cc, m)
    channel-major tile-major slabs -> the packed16 (q*TR, wp, 16*ct)
    spatial block.

    The XLA formulation of this permutation moves 16-lane units and costs
    ~15 ms per direction at DTU scale (scripts/probe_xband_overhead.py);
    here the relayout happens in VMEM: one (cc, m) transpose per plane,
    free sublane splits, and masked channel-slot inserts."""
    for p in range(16):
        for b2 in range(q):
            v = in_ref[:, 0, p, b2 * m:(b2 + 1) * m]  # (cc, m)
            vt = v.T                                  # (m, cc)
            s = vt.reshape(nct, TR * TC, cc)          # free leading split
            for t in range(nct):
                blk = s[t].reshape(TR, TC, cc)        # free sublane split
                out_ref[0, 0, b2 * TR:(b2 + 1) * TR,
                        t * TC:(t + 1) * TC,
                        p * ct:(p + 1) * ct] = blk[:, :, :ct]


def _pack16_xla(cost_t, d, hp, wp, ct, cc):
    """Reference XLA formulation (also the custom-vjp backward via AD)."""
    cm7 = cost_t.reshape(cc, d // 16, 16, hp // TR, wp // TC, TR, TC)
    parts = [cm7[:ct, :, p].transpose(1, 2, 4, 3, 5, 0)
             for p in range(16)]
    return jnp.concatenate(
        [p.reshape(d // 16, hp, wp, ct) for p in parts],
        axis=-1).reshape(1, d // 16, hp, wp, 16 * ct)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def pack16_from_tiles(cost_t, d: int, hp: int, wp: int, ct: int,
                      interpret: bool | None = None):
    """Tile-major (cc, N) xband cost volume -> packed16
    (1, D/16, hp, wp, 16*ct) via a Pallas repack kernel; backward is the
    XLA inverse permutation (exact)."""
    cc, n = cost_t.shape
    bpp = hp // TR
    nct = wp // TC
    m = TR * wp
    # q row-bands per grid step: the in block's LAST TWO dims must be
    # (equal-to-array, 128-multiple), so bands stay folded into the flat
    # minor axis (free reshape of (cc, N) — no relayout)
    q = 2 if bpp % 2 == 0 else 1
    cm4 = cost_t.reshape(cc, d // 16, 16, bpp * m)
    kern = functools.partial(_pack16_kernel, ct=ct, nct=nct, cc=cc, m=m,
                             q=q)
    out = pl.pallas_call(
        kern,
        grid=(d // 16, bpp // q),
        in_specs=[pl.BlockSpec((cc, 1, 16, q * m),
                               lambda i, j: (0, i, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, q * TR, wp, 16 * ct),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d // 16, bpp // q, q * TR, wp,
                                        16 * ct), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(cm4)
    return out.reshape(1, d // 16, hp, wp, 16 * ct)


def _pack16_fwd(cost_t, d, hp, wp, ct, interpret):
    return pack16_from_tiles(cost_t, d, hp, wp, ct, interpret), \
        cost_t.shape


def _pack16_bwd(d, hp, wp, ct, interpret, res, g):
    cc, n = res
    return (unpack16_to_tiles(g, cc, d, hp, wp, ct, interpret),)


pack16_from_tiles.defvjp(_pack16_fwd, _pack16_bwd)


def _unpack16_kernel(g_ref, out_ref, *, ct, nct, cc, m, q):
    """Inverse of _pack16_kernel: packed16 spatial cotangent block ->
    16 planes' channel-major tile-major (cc, m) slabs (ct->cc rows
    zero-padded — the kernel's pad channels carry no gradient)."""
    for p in range(16):
        for b2 in range(q):
            tiles = []
            for t in range(nct):
                blk = g_ref[0, 0, b2 * TR:(b2 + 1) * TR,
                            t * TC:(t + 1) * TC,
                            p * ct:(p + 1) * ct]      # (TR, TC, ct)
                tiles.append(blk.reshape(TR * TC, ct))
            sm = jnp.concatenate(tiles, axis=0)       # (m, ct)
            cm = sm.T                                 # (ct, m)
            out_ref[:ct, 0, p, b2 * m:(b2 + 1) * m] = cm
            if cc > ct:
                out_ref[ct:, 0, p, b2 * m:(b2 + 1) * m] = jnp.zeros(
                    (cc - ct, m), jnp.float32)


def unpack16_to_tiles(g, cc: int, d: int, hp: int, wp: int, ct: int,
                      interpret: bool | None = None):
    """packed16 (1, D/16, hp, wp, 16*ct) -> tile-major (cc, N)."""
    bpp = hp // TR
    nct = wp // TC
    m = TR * wp
    q = 2 if bpp % 2 == 0 else 1
    g5 = g.reshape(d // 16, bpp // q, q * TR, wp, 16 * ct)
    kern = functools.partial(_unpack16_kernel, ct=ct, nct=nct, cc=cc,
                             m=m, q=q)
    out = pl.pallas_call(
        kern,
        grid=(d // 16, bpp // q),
        in_specs=[pl.BlockSpec((1, 1, q * TR, wp, 16 * ct),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cc, 1, 16, q * m),
                               lambda i, j: (0, i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cc, d // 16, 16, bpp * m),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the unrolled 16x2 plane/band loop keeps ~30 MB of (m, ct)
            # temporaries live on the kernel stack
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(g5)
    return out.reshape(cc, d * hp * wp)
