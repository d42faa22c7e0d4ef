"""Fused tiled full-image render kernel (TPU, inference path).

The headline render workload (BASELINE configs 1-2: 640x512 novel-view
render at N_samples=128, renderer.ipynb chunk loop) is, per sample, a
trilinear fetch from the encoding volume + the v0 NeRF MLP + alpha
compositing. The XLA chunked path (render/renderer.py) pays HBM round
trips for every intermediate; this kernel exploits *image-tile locality*
instead: rays of a small image tile hit a small (y, x) window of the
reference-frustum volume, so the window can be DMA'd to VMEM once and all
of the tile's samples interpolated from it with MXU matmuls — no gathers,
no HBM intermediates. The MLP runs per sample column (2048 rays x 128
input channels — exact MXU shapes) and compositing is a streaming
front-to-back accumulation across columns, so neither the (R, S) weight
matrix nor any per-sample feature tensor ever exists in HBM.

Design points (kernel contract):
  * The volume is channel-packed in lanes: ``vol3 = (D, HP, WP * CP)``
    with CP = 32 (20 used: 8 encoding + V*4 color-volume channels,
    use_color_volume layout; reference renderer.py:134-135). CP = 32
    makes the dynamic x window offset (128-lane aligned) a multiple of 4
    voxels.
  * Per tile, a (D, YB, XB*CP) window is DMA'd HBM->VMEM at dynamic
    8-aligned y / 128-lane-aligned x offsets.
  * Per sample column, the (z, y) trilinear factor is ONE one-hot matmul
    with contraction dim KB*YB == 128 (no MXU padding waste), and the x
    factor folds via a lane roll-tree (VPU), avoiding a second matmul.
  * Sample coords arrive packed as (T, S//COLS_PER_BLOCK, R, 128) — 32
    columns x 4 values (ndc x, y, z, metric z) in lanes; the inner loop
    reads lanes 0:4 and rotates the block by 4 lanes per column (a VPU
    lane roll — no in-kernel transposes, no unrolled column bodies,
    which would blow up Mosaic compile time).
  * Novel views far from the reference view (e.g. Blender 360-degree
    paths) break tile locality; `render_image_tiled` detects this per
    image (window coverage + z-band validity) and falls back to the
    exact XLA path. White background is post-composited from `acc`
    outside the kernel (raw2outputs semantics, renderer.py:90-91).

Numerics: interpolation weights and the window are bf16 (same policy as
ops/precision.INTERP 'default'); the MLP runs at `mlp_precision` —
'high' (default; manual 3-pass bf16 split emulation, since Mosaic does
not lower lax HIGH inside kernels — measured on device: error identical
to 'highest' because bf16 interpolation dominates, 1.5x faster),
'highest' (full f32) or 'default' (bf16, ~5e-2 rgb error). The
exact-parity path remains render/renderer.py.

Reference behaviour covered: renderer.ipynb cells 4-18 render loop;
renderer.py:138-165 `rendering`; utils.py:357-383 `index_point_feature`
(align_corners=True, zeros padding) — quirks preserved: raw2alpha with
no delta-t (renderer.py:18-26), 1e-10 transmittance epsilon.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _WEIGHT_ORDER, pack_v0_weights

CP = 32               # lane-packed channel stride (>= used channels)
COLS_PER_BLOCK = 32   # sample columns per 128-lane coord block (4 vals each)


def pack_v0_weights_padded(mlp_params, feat_ch: int = 20,
                           feat_pad: int = CP, in_ch_pts: int = 63):
    """pack_v0_weights with the feature-facing pts_bias kernel zero-padded
    from `feat_ch` to `feat_pad` rows, so in-kernel features can stay in
    their CP-lane packing (the pad lanes multiply zero rows)."""
    w = pack_v0_weights(mlp_params, in_ch_pts)
    i = _WEIGHT_ORDER.index("bias_k")
    bias_k = w[i]
    assert bias_k.shape[0] == feat_ch, bias_k.shape
    w[i] = jnp.pad(bias_k, ((0, feat_pad - feat_ch), (0, 0)))
    return w


def _split_dot(a, b):
    """3-pass bf16 emulation of float32 matmul (lax.Precision.HIGH, which
    Mosaic does not lower inside kernels): split both operands into
    bf16 hi + bf16 residual, drop the lo*lo term."""
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))


def _plain_dot(a, b):
    return a @ b


def _mlp_cols(xyz, feats, dv, w, dot=_plain_dot):
    """v0 NeRF MLP for one sample column: xyz (R, 3) ndc, feats (R, CP)
    (pad lanes zeroed by the padded bias_k / masked interp), dv (R, 64)
    precomputed viewdir head contribution. Same split-matmul decomposition
    as pallas_kernels._mlp_rows (models.py:145-222)."""
    sc = dot(xyz, w["pe_f"])
    sin_sc = jnp.sin(sc)
    cos_sc = jnp.cos(sc)
    bias = dot(feats, w["bias_k"]) + w["bias_b"]

    h = (dot(xyz, w["k0_x"]) + dot(sin_sc, w["k0_s"])
         + dot(cos_sc, w["k0_c"]) + w["b0"])
    h = jax.nn.relu(h * bias)
    for i in (1, 2, 3, 4):
        h = dot(h, w[f"k{i}"]) + w[f"b{i}"]
        h = jax.nn.relu(h * bias)
    h = (dot(xyz, w["k5_x"]) + dot(sin_sc, w["k5_s"])
         + dot(cos_sc, w["k5_c"]) + dot(h, w["k5_bot"]) + w["b5"])
    h = jax.nn.relu(h * bias)

    sigma = jax.nn.relu(dot(h, w["ak"]) + w["ab"])            # (R, 1)
    feature = dot(h, w["fk"]) + w["fb"]
    hv = jax.nn.relu(dot(feature, w["vk_top"]) + dv + w["vb"])
    rgb = jax.nn.sigmoid(dot(hv, w["rk"]) + w["rb"])          # (R, 3)
    return rgb, sigma


def _pair_weights(frac, lo_ok, hi_ok, idx, rel0):
    """One-hot pair weights on an iota map `idx` (R, L): (1-frac) where
    idx == rel0, frac where idx == rel0 + 1, masked by in-volume bounds."""
    w0 = jnp.where(lo_ok, 1.0 - frac, 0.0)
    w1 = jnp.where(hi_ok, frac, 0.0)
    return (jnp.where(idx == rel0, w0, 0.0)
            + jnp.where(idx == rel0 + 1, w1, 0.0))


def _make_kernel(dims, shp, mlp_precision, interp_dtype, unroll,
                 early_stop, stream_colors: bool = False):
    D, HP, WP = dims
    (T, R, S, YB, XB, KB) = shp
    n_sblk = S // COLS_PER_BLOCK
    XC = XB * CP
    UNROLL = unroll
    EARLY_STOP = early_stop
    assert not stream_colors or UNROLL % 4 == 0, UNROLL

    def kernel(oy_ref, oxc_ref, coords_ref, dirs_ref, *rest):
        if stream_colors:
            colors_ref, rest = rest[0], rest[1:]
        else:
            colors_ref = None
        w_refs = rest[:len(_WEIGHT_ORDER)]
        vol_ref, out_ref = rest[len(_WEIGHT_ORDER)], rest[-3]
        box, sem = rest[-2], rest[-1]

        if mlp_precision == "high":
            # manual 3-pass bf16 emulation; Mosaic has no HIGH lowering
            _body(oy_ref, oxc_ref, coords_ref, dirs_ref, colors_ref,
                  w_refs, vol_ref, out_ref, box, sem, _split_dot)
        else:
            with jax.default_matmul_precision(mlp_precision):
                _body(oy_ref, oxc_ref, coords_ref, dirs_ref, colors_ref,
                      w_refs, vol_ref, out_ref, box, sem, _plain_dot)

    def _body(oy_ref, oxc_ref, coords_ref, dirs_ref, colors_ref,
              w_refs, vol_ref, out_ref, box, sem, dot):
        t = pl.program_id(0)
        oy = pl.multiple_of(oy_ref[t], 8)
        oxc = pl.multiple_of(oxc_ref[t], 128)
        dma = pltpu.make_async_copy(
            vol_ref.at[:, pl.ds(oy, YB), pl.ds(oxc, XC)], box, sem)
        dma.start()

        w = {name: ref[:] for name, ref in zip(_WEIGHT_ORDER, w_refs)}
        dirs = dirs_ref[0]                                    # (R, 3)
        dv = dot(dirs, w["vk_bot"])                           # (R, 64)

        ky = jax.lax.broadcasted_iota(jnp.int32, (R, KB * YB), 1)
        kz_row = ky // YB
        ky_row = ky % YB
        kx = jax.lax.broadcasted_iota(jnp.int32, (R, XC), 1) // CP

        dma.wait()

        def col_compute(col, ccol=None):
            """Interp + MLP for one column — independent of the
            compositing carry, so UNROLL columns can overlap MXU/VPU.
            `ccol` (R, CP) streams exact per-sample colors (lanes 8:20,
            the use_color_volume layout) to be ADDED to the interp
            output — the volume then carries only the 8 encoding
            channels and the render is exact-color."""
            x = col[:, 0:1] * (WP - 1.0)
            y = col[:, 1:2] * (HP - 1.0)
            z = col[:, 2:3] * (D - 1.0)
            # per-column z band start, same derivation as plan_tiles
            # (granularity 1) so its coverage guarantee carries over
            zm = jnp.maximum(jnp.minimum(
                jnp.min(jnp.clip(jnp.floor(z).astype(jnp.int32), 0, D - 1)),
                D - KB), 0)

            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            z0 = jnp.floor(z)
            fx, fy, fz = x - x0, y - y0, z - z0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            z0i = z0.astype(jnp.int32)

            # (z, y) one-hot, contraction KB*YB; masks give zeros padding
            az = _pair_weights(fz, (z0i >= 0) & (z0i <= D - 1),
                               (z0i + 1 >= 0) & (z0i + 1 <= D - 1),
                               kz_row, z0i - zm)
            ay = _pair_weights(fy, (y0i >= 0) & (y0i <= HP - 1),
                               (y0i + 1 >= 0) & (y0i + 1 <= HP - 1),
                               ky_row, y0i - oy)
            a_zy = (az * ay).astype(interp_dtype)             # (R, KB*YB)

            band = box[pl.ds(zm, KB)].reshape(KB * YB, XC)
            # native-dtype dot (bf16 operands reject the fp32 contract
            # precision the surrounding mlp_precision context would set)
            out1 = jnp.dot(a_zy, band,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)  # (R, XC)

            ax = _pair_weights(fx, (x0i >= 0) & (x0i <= WP - 1),
                               (x0i + 1 >= 0) & (x0i + 1 <= WP - 1),
                               kx, x0i - (oxc // CP))
            prod = out1 * ax
            # Narrowing lane roll-tree x fold: slice after each roll so
            # VPU work is ~2*XC, not log2(XB)*XC. Stop narrowing at 128
            # lanes (sub-128 lane rolls are not reliably lowered), then
            # finish with full-width rolls. left-roll s == right-roll
            # width - s on the current array.
            width = XC
            while width > 128:
                half = width // 2
                prod = (prod + pltpu.roll(prod, width - half, 1))[:, :half]
                width = half
            shift = width // 2
            while shift >= CP:
                prod = prod + pltpu.roll(prod, width - shift, 1)
                shift //= 2
            feats = prod[:, :CP]                               # (R, CP)
            if ccol is not None:
                feats = feats + ccol.astype(jnp.float32)

            rgb, sigma = _mlp_cols(col[:, 0:3], feats, dv, w, dot)
            alpha = 1.0 - jnp.exp(-sigma)                      # (R, 1)
            return rgb, alpha, col[:, 3:4]

        def s_block(sb, carry):
            # A dynamic inner loop with a 4*UNROLL-lane rotation per
            # iteration — NOT a 32-wide unroll, which blows up Mosaic
            # compile time. UNROLL > 1 computes that many independent
            # columns per iteration (interp+MLP have no cross-column
            # dependency) before the ordered compositing update, giving
            # the scheduler MXU/VPU overlap across columns.
            blk = coords_ref[0, sb]                            # (R, 128)

            def inner(j, c):
                blk, t_c, rgb_a, dep_a, acc_a = c
                # streamed colors are read per 4-column 128-lane group at
                # a DYNAMIC leading-axis index (Mosaic-supported, unlike
                # lane rotation of bf16 vectors); UNROLL % 4 == 0 keeps
                # the within-group lane slice static
                cgrp = {}
                if colors_ref is not None:
                    for g in range(UNROLL // 4):
                        cgrp[g] = colors_ref[
                            0, sb * (COLS_PER_BLOCK // 4)
                            + j * (UNROLL // 4) + g]           # (R, 4*CP)
                outs = []
                for u in range(UNROLL):
                    col = blk[:, 4 * u:4 * (u + 1)]
                    if colors_ref is not None:
                        r = u % 4
                        outs.append(col_compute(
                            col, cgrp[u // 4][:, CP * r:CP * (r + 1)]))
                    else:
                        outs.append(col_compute(col))
                for rgb, alpha, zval in outs:   # ordered compositing
                    wgt = alpha * t_c
                    t_c = t_c * (1.0 - alpha + 1e-10)
                    rgb_a = rgb_a + wgt * rgb
                    dep_a = dep_a + wgt * zval
                    acc_a = acc_a + wgt
                return (pltpu.roll(blk, 128 - 4 * UNROLL, 1),
                        t_c, rgb_a, dep_a, acc_a)

            body = lambda c: jax.lax.fori_loop(  # noqa: E731
                0, COLS_PER_BLOCK // UNROLL, inner, (blk,) + c)[1:]
            if EARLY_STOP <= 0.0:
                return body(carry)
            # transmittance early-out: once EVERY ray in the tile is
            # saturated, remaining sample blocks contribute at most
            # EARLY_STOP to every output — skip their interp+MLP work
            # entirely (the ordered compositing makes this exact up to
            # the bound; front-to-back z ordering is the marcher's)
            return jax.lax.cond(jnp.max(carry[0]) > EARLY_STOP,
                                body, lambda c: c, carry)

        zeros1 = jnp.zeros((R, 1), jnp.float32)
        t_c, rgb_c, dep_c, acc_c = jax.lax.fori_loop(
            0, n_sblk, s_block,
            (jnp.ones((R, 1), jnp.float32), jnp.zeros((R, 3), jnp.float32),
             zeros1, zeros1))
        out_ref[0] = jnp.concatenate(
            [rgb_c, dep_c, acc_c, jnp.zeros((R, 3), jnp.float32)], axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("dims", "tile_shape", "yb", "xb", "kb",
                              "mlp_precision", "interp_dtype", "unroll",
                              "early_stop", "interpret"))
def tiled_render_v0(weights_list, vol3, coords, dirs, oy, oxc, *,
                    dims, tile_shape, yb: int = 32, xb: int = 32,
                    kb: int = 4, mlp_precision: str = "high",
                    interp_dtype: str = "bfloat16", unroll: int = 1,
                    early_stop: float = 1e-4,
                    interpret: bool = False, colors=None):
    """Run the fused tiled render kernel.

    Args:
        weights_list: pack_v0_weights_padded(mlp_params).
        vol3: (D, HP, WP*CP) encoding+color volume, channel-lane-packed
            (bf16 recommended).
        coords: (T, S//32, R, 128) packed per-column sample values
            (ndc x, ndc y, ndc z, metric z) — see module doc.
        dirs: (T, R, 3) unit view dirs in the reference frame.
        oy/oxc: (T,) int32 window origins (8-aligned voxels /
            128-aligned lanes), scalar-prefetched to SMEM. The per-column
            z-band start is recomputed inside the kernel (identical to
            plan_tiles's derivation, whose `ok` guarantees coverage).
        dims: static (D, HP, WP).
        tile_shape: static (T, R, S).
        colors: optional (T, S//4, R, 4*CP) pack_color_tiles output —
            EXACT per-sample colors streamed into MLP feature lanes 8:20;
            vol3 must then carry only the 8 encoding channels (the
            streamed lanes add onto the interp result). This is the
            exact-quality hybrid path: windowed-MXU volume interp + MLP +
            compositing fused, colors computed exactly outside. Forces
            unroll up to a multiple of 4 (4 columns share each 128-lane
            group; the group index is dynamic, the lane slice static —
            Mosaic cannot lane-rotate bf16 vectors, so no roll carry).

    Returns:
        (T, R, 8) float32: rgb[3], depth, acc, zero-pad[3].
    """
    T, R, S = tile_shape
    D, HP, WP = dims
    assert S % COLS_PER_BLOCK == 0, (S, COLS_PER_BLOCK)
    assert yb * kb == 128, (yb, kb)  # (z, y) one-hot contraction = one MXU pass
    assert xb & (xb - 1) == 0 and xb >= 4, xb  # roll-tree: pow2, XC >= 128
    if colors is not None and unroll % 4:
        unroll = 4                      # streamed-color group granularity
    assert COLS_PER_BLOCK % unroll == 0, unroll
    kernel = _make_kernel(dims, (T, R, S, yb, xb, kb), mlp_precision,
                          jnp.dtype(interp_dtype), unroll, early_stop,
                          stream_colors=colors is not None)

    vmem = lambda shape: pl.BlockSpec(
        shape, lambda t, *_: (t,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)
               for _ in _WEIGHT_ORDER]

    color_in = []
    color_specs = []
    if colors is not None:
        assert colors.shape == (T, S // 4, R, 4 * CP), colors.shape
        color_in = [colors]
        color_specs = [vmem((1, S // 4, R, 4 * CP))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[vmem((1, S // COLS_PER_BLOCK, R, 128)),
                  vmem((1, R, 3))] + color_specs + w_specs
                 + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=vmem((1, R, 8)),
        scratch_shapes=[pltpu.VMEM((D, yb, xb * CP), vol3.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, R, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(oy, oxc, coords, dirs, *color_in, *weights_list, vol3)


# ------------------------------------------------------------ wrapper -----


def _align_down(v, m):
    return (v // m) * m


@functools.partial(
    jax.jit, static_argnames=("dims", "tile_shape", "yb", "xb", "kb"))
def plan_tiles(xyz_ndc_t, *, dims, tile_shape, yb, xb, kb):
    """Per-tile window origins + validity from tiled ndc coords
    (T, R, S, 3). Returns (oy, oxc, zmin, ok) — `ok` is a scalar bool:
    every in-volume sample corner of every tile falls inside its window
    and z band (out-of-volume corners carry zero weight regardless)."""
    D, HP, WP = dims
    T, R, S = tile_shape
    vx = xyz_ndc_t[..., 0] * (WP - 1.0)
    vy = xyz_ndc_t[..., 1] * (HP - 1.0)
    vz = xyz_ndc_t[..., 2] * (D - 1.0)

    def axis_window(v, size, win, gran, axes):
        lo_c = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, size - 1)
        hi_c = jnp.clip(jnp.floor(v).astype(jnp.int32) + 1, 0, size - 1)
        lo = jnp.min(lo_c, axis=axes)
        hi = jnp.max(hi_c, axis=axes)
        org = jnp.minimum(_align_down(lo, gran), size - win)
        org = jnp.maximum(org, 0)
        ok = hi <= org + win - 1
        return org, ok

    oy, ok_y = axis_window(vy, HP, yb, 8, (1, 2))            # (T,)
    ox, ok_x = axis_window(vx, WP, xb, 128 // CP, (1, 2))    # (T,)
    zmin, ok_z = axis_window(vz, D, kb, 1, (1,))             # (T, S)
    ok = jnp.all(ok_y) & jnp.all(ok_x) & jnp.all(ok_z)
    ok = ok & jnp.array(HP >= yb) & jnp.array(WP >= xb) & jnp.array(D >= kb)
    return oy.astype(jnp.int32), (ox * CP).astype(jnp.int32), \
        zmin.astype(jnp.int32), ok


@functools.partial(jax.jit, static_argnames=("tile_hw", "image_hw"))
def pack_tiles(xyz_ndc, dirs, z_vals, *, image_hw, tile_hw):
    """Reorder row-major image rays into kernel tile layout.

    Args:
        xyz_ndc: (H*W, S, 3); dirs: (H*W, 3); z_vals: (H*W, S).
    Returns:
        xyz_t (T, R, S, 3) [for plan_tiles], coords (T, S//32, R, 128),
        dirs_t (T, R, 3).
    """
    H, W = image_hw
    th, tw = tile_hw
    S = xyz_ndc.shape[1]

    def tiles(a):
        a = a.reshape(H // th, th, W // tw, tw, *a.shape[1:])
        a = jnp.moveaxis(a, 2, 1)
        return a.reshape(-1, th * tw, *a.shape[4:])

    xyz_t = tiles(xyz_ndc)                                   # (T, R, S, 3)
    zv_t = tiles(z_vals)                                     # (T, R, S)
    vals = jnp.concatenate([xyz_t, zv_t[..., None]], -1)     # (T, R, S, 4)
    T, R = vals.shape[:2]
    coords = vals.reshape(T, R, S // COLS_PER_BLOCK, COLS_PER_BLOCK * 4)
    coords = jnp.swapaxes(coords, 1, 2)                      # (T, S//32, R, 128)
    return xyz_t, coords, tiles(dirs)


@functools.partial(jax.jit,
                   static_argnames=("tile_hw", "image_hw", "dtype"))
def pack_color_tiles(colors, *, image_hw, tile_hw,
                     dtype=jnp.bfloat16):
    """Exact per-sample colors (H*W, S, 12) -> the kernel's streamed
    layout (T, S//4, R, 4*CP): 4 sample columns per 128-lane group, each
    column CP lanes with the 12 color channels at lanes 8:20
    (use_color_volume layout) so the kernel can ADD them to the
    8-channel volume interp output."""
    H, W = image_hw
    th, tw = tile_hw
    S, cc = colors.shape[1:]
    # cast FIRST, pad channels LAST: the 12 -> CP(32) zero pad is a 2.7x
    # data blowup, so running the tile shuffle on padded f32 moved 1.3 GB
    # per DTU slab where 250 MB of bf16 carries the same information
    # (measured as the dominant cost of the hybrid producer, round 4).
    c = colors.astype(dtype)                                  # (HW, S, 12)
    c = c.reshape(H // th, th, W // tw, tw, S, cc)
    c = jnp.moveaxis(c, 2, 1).reshape(-1, th * tw, S, cc)     # (T, R, S, cc)
    T, R = c.shape[:2]
    c = jnp.pad(c, ((0, 0), (0, 0), (0, 0), (8, CP - 8 - cc)))
    c = c.reshape(T, R, S // 4, 4 * CP)
    return jnp.swapaxes(c, 1, 2)


def untile_image(out, image_hw, tile_hw):
    """(T, R, 8) kernel output -> row-major (H*W, 8)."""
    H, W = image_hw
    th, tw = tile_hw
    out = out.reshape(H // th, W // tw, th, tw, 8)
    out = jnp.moveaxis(out, 1, 2)
    return out.reshape(H * W, 8)


def prepare_volume(volume20, used_ch: int | None = None,
                   dtype=jnp.bfloat16):
    """(D, HP, WP, used) channel-last volume -> (D, HP, WP*CP) lane-packed
    kernel layout (pad channels zero; bf16 by default). used = 20 for the
    color-baked volume, 8 for the hybrid streamed-colors path."""
    d, hp, wp, c = volume20.shape
    assert c == (used_ch or c) and c <= CP, volume20.shape
    v = jnp.pad(volume20, ((0, 0),) * 3 + ((0, CP - c),))
    return v.reshape(d, hp, wp * CP).astype(dtype)


def render_image_tiled(mlp_params, vol3, xyz_ndc, dirs, z_vals, *,
                       image_hw, dims, tile_hw=(32, 64), yb: int = 32,
                       xb: int = 32, kb: int = 4,
                       mlp_precision: str = "high",
                       interp_dtype: str = "bfloat16", unroll: int = 1,
                       early_stop: float = 1e-4,
                       white_bkgd: bool = False,
                       fallback_fn=None, weights_list=None,
                       interpret: bool = False, sample_colors=None,
                       packed_colors=None):
    """Full-image fused tiled render with automatic exact-path fallback.

    Args:
        mlp_params: v0 MLP pytree (ignored if weights_list given).
        vol3: prepare_volume(volume20) kernel-layout volume.
        xyz_ndc (H*W, S, 3), dirs (H*W, 3), z_vals (H*W, S): row-major
            ray/sample data (same conventions as render/renderer.py).
        image_hw: (H, W). tile_hw: image pixels per tile.
        fallback_fn: () -> dict, invoked when tile locality does not hold
            (far-from-reference views) or the image does not tile.
        sample_colors: (H*W, S, 12) exact per-sample colors (hybrid
            path); packed here. `packed_colors` is the same already in
            pack_color_tiles layout — callers that build colors per
            row-slab (full-image f32 colors are GBs at DTU scale) pass
            this instead.

    Returns:
        dict rgb (H*W, 3), depth (H*W,), acc (H*W,).
    """
    H, W = image_hw
    th, tw = tile_hw
    if H % th or W % tw:
        if fallback_fn is None:
            raise ValueError(f"image {image_hw} does not tile by {tile_hw}")
        return fallback_fn()

    xyz_t, coords, dirs_t = pack_tiles(xyz_ndc, dirs, z_vals,
                                       image_hw=image_hw, tile_hw=tile_hw)
    T, R, S = xyz_t.shape[:3]
    oy, oxc, zmin, ok = plan_tiles(xyz_t, dims=dims, tile_shape=(T, R, S),
                                   yb=yb, xb=xb, kb=kb)
    if not bool(ok):                 # host sync: one bool per image
        if fallback_fn is None:
            raise ValueError("tile locality violated and no fallback given")
        return fallback_fn()

    if weights_list is None:
        weights_list = pack_v0_weights_padded(mlp_params)
    colors_t = packed_colors
    if colors_t is None and sample_colors is not None:
        colors_t = pack_color_tiles(
            sample_colors, image_hw=image_hw, tile_hw=tile_hw,
            dtype=jnp.float32 if interp_dtype == "float32"
            else jnp.bfloat16)
    out = tiled_render_v0(weights_list, vol3, coords, dirs_t, oy, oxc,
                          dims=dims, tile_shape=(T, R, S), yb=yb,
                          xb=xb, kb=kb, mlp_precision=mlp_precision,
                          interp_dtype=interp_dtype, unroll=unroll,
                          early_stop=early_stop, interpret=interpret,
                          colors=colors_t)
    flat = untile_image(out, image_hw, tile_hw)
    rgb, depth, acc = flat[:, 0:3], flat[:, 3], flat[:, 4]
    if white_bkgd:
        rgb = rgb + (1.0 - acc[:, None])
    return {"rgb": rgb, "depth": depth, "acc": acc}
