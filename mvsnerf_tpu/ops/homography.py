"""Plane-sweep homography warping and the cross-view variance cost volume.

TPU-native redesign of the reference's `homo_warp` (utils.py:580-630) and
`MVSNet.build_volume_costvar_img` (models.py:839-893). Rather than looping
over source views with per-view materialized warps, the sweep is expressed as
one batched gather over (V-1, D, H_pad, W_pad) that XLA fuses with the
running mean/variance accumulation.

Geometry: for reference pixel (x, y) on depth plane d, the source-view pixel
is  p_src ∝ R @ [x, y, 1]^T + T / d  with  [R | T] = src_proj @ ref_proj_inv
(a 3x4 matrix at the stride-4 feature scale). Coordinates are normalized to
[-1, 1] by the *unpadded* feature extent (W-1)/2, (H-1)/2 and sampled with
zeros padding, align_corners=True — exactly the reference semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interp import grid_sample_2d
from .precision import matmul_f32


def plane_sweep_grid(proj_mat, depth_values, h: int, w: int, pad: int = 0):
    """Normalized source-view sampling grid for every (depth, ref-pixel).

    Args:
        proj_mat: (3, 4) = src_proj @ ref_proj_inv at feature scale.
        depth_values: (D,) depth of each sweep plane.
        h, w: unpadded feature height/width.
        pad: symmetric ref-grid padding in feature pixels.

    Returns:
        grid: (D, h + 2*pad, w + 2*pad, 2) normalized (x, y) in src view.
    """
    hp, wp = h + 2 * pad, w + 2 * pad
    xs = jnp.arange(wp, dtype=jnp.float32) - pad
    ys = jnp.arange(hp, dtype=jnp.float32) - pad
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # (hp, wp)
    ref = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=0).reshape(3, -1)

    rot = matmul_f32(proj_mat[:, :3], ref)  # (3, hp*wp)
    trans = proj_mat[:, 3:]      # (3, 1)
    # (D, 3, hp*wp): R@p + T/d per plane.
    src = rot[None] + trans[None] / depth_values[:, None, None]
    xy = src[:, :2] / src[:, 2:3]
    gx = xy[:, 0] / ((w - 1) / 2.0) - 1.0
    gy = xy[:, 1] / ((h - 1) / 2.0) - 1.0
    return jnp.stack([gx, gy], axis=-1).reshape(-1, hp, wp, 2)


def plane_sweep_pix_coords(proj_mat, depth_values, h: int, w: int,
                           pad: int = 0, lane_perm=None):
    """Source-PIXEL sweep coordinates as two flat (1, D*hp*wp) arrays.

    Same math as plane_sweep_grid + _pix_coords composed, but never
    materializes a (..., 2)-trailing tensor: XLA tiles the 2-wide lane axis
    up to 128 (~613 MB per view at DTU resolution), and the (D,hp,wp,2) ->
    (1,N,2) reshape relayouts it again. Keeping the flat sample axis in
    lanes end-to-end removes ~2/3 of the fused-sweep forward's wall time
    (the kernel itself is ~18 ms; the grid detour cost ~37 ms)."""
    hp, wp = h + 2 * pad, w + 2 * pad
    xs = jnp.arange(wp, dtype=jnp.float32) - pad
    ys = jnp.arange(hp, dtype=jnp.float32) - pad
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    ref = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=0).reshape(3, -1)
    if lane_perm is not None:
        # permute the per-plane base grid BEFORE the projection: the
        # coords then come out in the caller's lane order (e.g. the
        # xband kernel's tile-major order) for free — permuting the
        # (1, D*hp*wp) result after the fact is a 16-lane-granularity
        # XLA relayout that measured 2.5 ms per array at DTU scale.
        ref = ref[:, jnp.asarray(lane_perm)]
    rot = matmul_f32(proj_mat[:, :3], ref)          # (3, hp*wp)
    src = rot[None] + proj_mat[:, 3:][None] / \
        depth_values[:, None, None]                 # (D, 3, hp*wp)
    inv_z = 1.0 / src[:, 2]
    return ((src[:, 0] * inv_z).reshape(1, -1),
            (src[:, 1] * inv_z).reshape(1, -1))


def homo_warp(src_feat, proj_mat, depth_values, pad: int = 0, grid=None):
    """Warp one source feature map onto D fronto-parallel planes.

    Args:
        src_feat: (h, w, C) channel-last source features.
        proj_mat: (3, 4).
        depth_values: (D,).
        grid: optional precomputed plane_sweep_grid (shared between the
              feature warp and the RGB warp, cf. models.py:872).

    Returns:
        (warped (D, hp, wp, C), grid (D, hp, wp, 2)).
    """
    h, w = src_feat.shape[:2]
    if grid is None:
        grid = plane_sweep_grid(proj_mat, depth_values, h, w, pad)
    warped = grid_sample_2d(src_feat, grid, padding_mode="zeros")
    return warped, grid


def in_bounds_mask(grid):
    """Per-sample strictly-in-bounds mask (models.py:874-877)."""
    ok = (grid > -1.0) & (grid < 1.0)
    return (ok[..., 0] & ok[..., 1]).astype(jnp.float32)


def _plane_block_size(d: int, target: int = 16) -> int:
    """Largest divisor of d that is <= target (static blocking factor)."""
    for b in range(min(target, d), 0, -1):
        if d % b == 0:
            return b
    return 1


def build_cost_volume(imgs, feats, proj_mats, depth_values, pad: int = 0,
                      plane_block: int | None = None,
                      fast_warp: bool = True, warp_row_block: int = 16,
                      warp_band: int = 32, warp_dtype=None,
                      sweep_remat: bool = False,
                      warp_fwd_mode: str = "packed",
                      cost_layout: str = "dense"):
    """Cross-view variance cost volume with warped source RGB
    (models.py:839-893, `build_volume_costvar_img`).

    The sweep is blocked over depth planes with `lax.map` so peak memory is
    O(V * plane_block * hp * wp * C) regardless of D — at 640x512/pad 24 the
    unblocked warp would materialize ~5 GB of gather intermediates per view.

    Args:
        imgs:  (V, H, W, 3) source images at full resolution (view 0 = ref).
        feats: (V, h, w, C) stride-4 feature maps (C = 32).
        proj_mats: (V, 3, 4) relative projections (view 0 is identity-like,
                   only views 1: are used, models.py:852).
        depth_values: (D,).
        pad: feature-grid padding.
        plane_block: depth planes per block (must divide D; default: largest
                     divisor of D <= 16).

    Returns:
        cost: (D, hp, wp, 3V + C) channel-last; channels ordered
              [ref RGB(3), warped src RGB(3(V-1)), variance(C)] to match the
              reference layout (models.py:858-860) so the CostRegNet
              checkpoint weights apply unchanged. With
              `cost_layout="packed16"`: (1, D/16, hp, wp, 16*(3V+C)), the
              depth-packed layout of models/costreg_packed.py (packed
              channel = p*(3V+C) + c), produced WITHOUT materializing the
              dense tensor — the dense full-res small-channel layout costs
              ~3x in XLA lane padding at DTU scale.
        in_masks: (V, D, hp, wp) in-bound masks (mask 0 == all ones).
        colors: (V, D, hp, wp, 4) per-view (RGB, mask) for return_color
                consumers (models.py:925-926).
    """
    V, h, w, C = feats.shape
    D = depth_values.shape[0]
    hp, wp = h + 2 * pad, w + 2 * pad
    assert cost_layout in ("dense", "packed16", "cmajor")
    if cost_layout == "packed16":
        assert D % 16 == 0, D
    if plane_block is None:
        plane_block = _plane_block_size(D)
    assert D % plane_block == 0, (D, plane_block)

    # Downscale images to feature resolution (models.py:859,
    # align_corners=False).
    from .interp import interpolate_bilinear_resize
    imgs_l = jax.vmap(lambda im: interpolate_bilinear_resize(im, h, w))(imgs)

    # Reference view contributes unwarped (zero-padded) features and image.
    ref_feat = jnp.pad(feats[0], ((pad, pad), (pad, pad), (0, 0)))
    ref_img = jnp.pad(imgs_l[0], ((pad, pad), (pad, pad), (0, 0)))

    if warp_fwd_mode == "pallas":
        from .pallas_sweep import _pick_row_block
        if _pick_row_block(hp, wp) is not None:
            return _build_cost_volume_pallas(
                imgs_l, feats, proj_mats, depth_values, pad, ref_feat,
                ref_img, plane_block, warp_band, cost_layout)
        # no legal Mosaic row block at this shape -> packed gather path
        warp_fwd_mode = "packed"

    def process_block(depth_block):
        """depth_block: (plane_block,) -> per-block cost/masks/colors."""
        def warp_one(feat, img, pm):
            grid = plane_sweep_grid(pm, depth_block, h, w, pad)
            if fast_warp:
                # one banded dense warp over [feat | rgb] (ops/warp_fast.py)
                from .warp_fast import bilinear_warp_banded
                dtype = warp_dtype if warp_dtype is not None else jnp.float32
                both = bilinear_warp_banded(
                    jnp.concatenate([feat, img], axis=-1), grid,
                    warp_row_block, warp_band, dtype, False, warp_fwd_mode)
                wfeat, wimg = both[..., :C], both[..., C:]
            else:
                wfeat = grid_sample_2d(feat, grid, padding_mode="zeros")
                wimg = grid_sample_2d(img, grid, padding_mode="zeros")
            return wfeat, wimg, in_bounds_mask(grid)

        # Unrolled over the (static, small) source views: vmap would turn
        # the warp's internal lax.cond into a select that executes BOTH the
        # banded path and its gather fallback.
        per_view = [warp_one(feats[i], imgs_l[i], proj_mats[i])
                    for i in range(1, V)]
        wfeats = jnp.stack([p[0] for p in per_view])
        wimgs = jnp.stack([p[1] for p in per_view])
        masks = jnp.stack([p[2] for p in per_view])
        B = depth_block.shape[0]
        volume_sum = ref_feat[None] + jnp.sum(wfeats, axis=0)
        volume_sq_sum = (ref_feat ** 2)[None] + jnp.sum(wfeats ** 2, axis=0)
        ones = jnp.ones((1, B, hp, wp), jnp.float32)
        in_masks = jnp.concatenate([ones, masks], axis=0)  # (V, B, hp, wp)
        count = 1.0 / jnp.sum(in_masks, axis=0)[..., None]
        variance = volume_sq_sum * count - (volume_sum * count) ** 2

        ref_rgb = jnp.broadcast_to(ref_img[None], (B, hp, wp, 3))
        cost = jnp.concatenate(
            [ref_rgb] + [wimgs[i] for i in range(V - 1)] + [variance],
            axis=-1)
        colors = jnp.concatenate(
            [jnp.concatenate([ref_rgb[None], wimgs], axis=0),
             in_masks[..., None]], axis=-1)
        return cost, in_masks, colors

    blocks = depth_values.reshape(-1, plane_block)
    # rematerialize per block: saving every block's warped volumes as
    # backward residuals costs multiple GB at DTU resolution; recomputing
    # the warp in the backward is ~free next to its banded-splat transpose
    # sweep_remat trades the ~180 ms backward recompute for ~1.5 GB of
    # saved warp residuals; the default (off) fits DTU resolution in 16 GB —
    # enable it for larger volumes.
    block_fn = jax.checkpoint(process_block) if sweep_remat \
        else process_block
    cost_b, masks_b, colors_b = jax.lax.map(block_fn, blocks)
    # (nb, B, hp, wp, C') -> (D, hp, wp, C'); (nb, V, B, ...) -> (V, D, ...)
    cost = cost_b.reshape(D, hp, wp, cost_b.shape[-1])
    in_masks = masks_b.transpose(1, 0, 2, 3, 4).reshape(V, D, hp, wp)
    colors = colors_b.transpose(1, 0, 2, 3, 4, 5).reshape(V, D, hp, wp, 4)
    if cost_layout == "packed16":
        from ..models.costreg_packed import pack_volume
        cost = pack_volume(cost[None], 16)
    elif cost_layout == "cmajor":
        cost = cost.transpose(3, 0, 1, 2)
    return cost, in_masks, colors


def _build_cost_volume_pallas(imgs_l, feats, proj_mats, depth_values, pad,
                              ref_feat, ref_img, plane_block, warp_band,
                              cost_layout="dense"):
    """Whole-volume sweep + variance in ONE fused Pallas kernel
    (ops/pallas_sweep.py `cost_volume_fused_pallas`): every source view's
    [feat | rgb] is warped in-VMEM and the masked cross-view mean/variance
    accumulated per block, so no per-view warped tensor ever reaches HBM
    (the separate-warp formulation round-trips ~4 GB/direction at DTU
    resolution). A plane-blocked exact gather + XLA assembly is the
    lax.cond fallback when the y-band contract fails.

    `in_masks` / `colors` are assembled from DCE-able XLA ops — no caller
    of the training path consumes them (they exist for return_color
    consumers, models.py:925-926, which run once per scene at most)."""
    from .pallas_sweep import (_pick_row_block, cost_volume_fused_pallas,
                               _Static, sweep_fits_band_pix)

    V, h, w, C = feats.shape
    Ci = imgs_l.shape[-1]
    D = depth_values.shape[0]
    hp, wp = h + 2 * pad, w + 2 * pad
    cp = -(-(C + Ci) // 8) * 8
    cc = -(-(Ci * V + C) // 8) * 8

    # The warp matmul cost is linear in `band`: prefer a narrow band with
    # small row blocks (near-rectified geometry: y-span per 8 rows ~= 10,
    # fits band 16) over the wide default. A second, wide-band kernel level
    # would cost ~100 MB of HBM we don't have at DTU resolution — geometry
    # that violates the narrow band takes the exact-gather cond fallback.
    import os as _os
    _rb_env = _os.environ.get("MVSNERF_SWEEP_RB")  # debug/tuning override
    small_rb = _pick_row_block(hp, wp, target=8)
    if _rb_env:
        # Validate the override here with a clear error: a bad value would
        # otherwise surface later as an opaque Mosaic failure, and traced
        # functions bake the env value in at first compilation.
        rb = int(_rb_env)
        if rb <= 0 or hp % rb or (rb * wp) % 128:
            raise ValueError(
                f"MVSNERF_SWEEP_RB={rb} invalid for padded shape "
                f"({hp}, {wp}): need rb > 0, hp % rb == 0 and "
                f"(rb * wp) % 128 == 0")
        candidates = [(rb, warp_band)]
    elif small_rb is not None and small_rb * 2 <= warp_band:
        candidates = [(small_rb, warp_band // 2)]
    else:
        candidates = [(_pick_row_block(hp, wp), warp_band)]

    # Pixel coords straight from the projection (no (..., 2) grid tensor —
    # see plane_sweep_pix_coords). The normalized grids below exist ONLY
    # for the masks/colors side outputs and are DCE'd in the train path.
    coords = [plane_sweep_pix_coords(proj_mats[i], depth_values, h, w, pad)
              for i in range(1, V)]
    xs = jnp.stack([c[0] for c in coords])              # (V-1, 1, N)
    ys = jnp.stack([c[1] for c in coords])

    def pack_src(feat, img):
        cat = jnp.concatenate([feat, img], axis=-1)     # (h, w, C+Ci)
        return jnp.pad(cat, ((0, 0), (0, 0),
                             (0, cp - C - Ci))).transpose(0, 2, 1)

    srcs_cw = jnp.stack([pack_src(feats[i], imgs_l[i])
                         for i in range(1, V)])         # (V-1, h, cp, w)
    ref_cat = jnp.concatenate([ref_feat, ref_img], axis=-1)  # (hp, wp, .)
    ref_p = jnp.pad(ref_cat, ((0, 0), (0, 0), (0, cp - C - Ci)))

    # Backward accumulation grouping (ops/pallas_sweep._fused_bwd_rule):
    # 1 = single shared VMEM accumulator (sequential chain); G > 1 splits
    # the grid into G independent partial accumulators (parallel axis,
    # summed in XLA). Tuning override, validated here like SWEEP_RB.
    _grp_env = _os.environ.get("MVSNERF_SWEEP_BWD_GROUPS")
    bwd_groups = int(_grp_env) if _grp_env else 1
    if bwd_groups < 1:
        raise ValueError(
            f"MVSNERF_SWEEP_BWD_GROUPS={bwd_groups} must be >= 1")

    def make_branch(rb, band):
        bpp = hp // rb
        m = rb * wp
        nblk = D * bpp
        if bwd_groups > 1 and nblk % bwd_groups:
            raise ValueError(
                f"MVSNERF_SWEEP_BWD_GROUPS={bwd_groups} must divide the "
                f"block count {nblk} (= D {D} * row blocks {bpp})")
        refb = ref_p.reshape(bpp, rb, wp, cp).transpose(0, 3, 1, 2)
        refb = refb.reshape(bpp, cp, m)
        static = _Static(band=band, m=m, bpp=bpp, c_feat=C, c_img=Ci,
                         cc=cc, bwd_groups=bwd_groups)

        def branch(srcs_cw, xs, ys):
            cost_cm = cost_volume_fused_pallas(srcs_cw, refb, xs, ys,
                                               static)
            ct = Ci * V + C
            if cost_layout == "packed16":
                # (cc, D*hp*wp) -> (1, D/16, hp, wp, 16*ct) without ever
                # materializing the lane-padded dense layout. Formulated as
                # 16 per-plane transposes + one lane concat: the single 5-D
                # transpose costs ~30 ms at DTU scale (lane-crossing move
                # of 900 MB in 4-byte units); this form measures ~10 ms.
                cm5 = cost_cm.reshape(cc, D // 16, 16, hp * wp)
                parts = [cm5[:ct, :, p].transpose(1, 2, 0)
                         for p in range(16)]
                pk = jnp.concatenate(parts, axis=-1)
                return pk.reshape(1, D // 16, hp, wp, 16 * ct)
            if cost_layout == "cmajor":
                # the kernel's NATIVE layout — zero relayout (the dband
                # U-Net consumes it directly, ops/pallas_costreg.py)
                return cost_cm.reshape(cc, D, hp, wp)[:ct]
            return cost_cm.reshape(cc, D, hp, wp).transpose(1, 2, 3, 0)[
                ..., :ct]

        fits = jnp.all(jnp.stack(
            [sweep_fits_band_pix(c[1], h, wp, rb, band) for c in coords]))
        return fits, branch

    # checkpoint: the fallback's gather residuals (corner indices/weights
    # with trailing-1 dims, tile-padded 128x) are allocated even when the
    # cond never takes this branch — measured 4x 2.2 GB at DTU resolution.
    @jax.checkpoint
    def gather_fallback(srcs_cw, xs, ys):
        # Surface the silent perf cliff: this branch is ~3x slower than the
        # fused kernel, and with the narrow-band candidate active it is the
        # only alternative (a second wide-band kernel level would cost
        # ~100 MB HBM we don't have at DTU resolution). Opt-in because the
        # axon TPU PJRT does not support host callbacks (debug.print would
        # fail to compile even when this branch is never taken).
        if _os.environ.get("MVSNERF_SWEEP_DEBUG"):
            jax.debug.print(
                "mvsnerf_tpu: plane-sweep y-band contract violated - using "
                "the exact-gather fallback (slower). Consider "
                "MVSNERF_SWEEP_RB or a wider warp_band.")
        wboth = []
        for i in range(V - 1):
            cat = srcs_cw[i].transpose(0, 2, 1)[:, :, :C + Ci]
            grid_i = jnp.stack(
                [xs[i, 0] / ((w - 1) / 2.0) - 1.0,
                 ys[i, 0] / ((h - 1) / 2.0) - 1.0],
                axis=-1).reshape(D, hp, wp, 2)
            blocks = grid_i.reshape(-1, plane_block, hp, wp, 2)
            out = jax.lax.map(
                lambda g: grid_sample_2d(cat, g, padding_mode="zeros"),
                blocks)
            wboth.append(out.reshape(D, hp, wp, C + Ci))
        volume_sum = ref_feat[None] + sum(b[..., :C] for b in wboth)
        volume_sq_sum = (ref_feat ** 2)[None] + \
            sum(b[..., :C] ** 2 for b in wboth)
        count = jnp.ones((D, hp, wp), jnp.float32)
        for i in range(V - 1):
            gx = xs[i, 0].reshape(D, hp, wp)
            gy = ys[i, 0].reshape(D, hp, wp)
            count = count + ((gx > 0) & (gx < w - 1)
                             & (gy > 0) & (gy < h - 1)).astype(jnp.float32)
        inv = (1.0 / count)[..., None]
        variance = volume_sq_sum * inv - (volume_sum * inv) ** 2
        ref_rgb = jnp.broadcast_to(ref_img[None], (D, hp, wp, Ci))
        dense = jnp.concatenate(
            [ref_rgb] + [b[..., C:] for b in wboth] + [variance], axis=-1)
        if cost_layout == "packed16":
            from ..models.costreg_packed import pack_volume
            return pack_volume(dense[None], 16)
        if cost_layout == "cmajor":
            return dense.transpose(3, 0, 1, 2)
        return dense

    def make_xband_branch(wb, bandp):
        """v2 x-windowed kernel (ops/pallas_sweep2.py): ~3x fewer MXU
        FLOPs than the v1 full-width one-hot contraction. Preferred when
        every (8x16)-sample tile's taps fit a (bandp, wb) source window."""
        from .pallas_sweep2 import (TC, TR, cost_volume_xband_pallas,
                                    tile_lanes, untile_lanes, xband_fits)

        import numpy as _np
        perm = _np.arange(hp * wp).reshape(
            hp // TR, TR, wp // TC, TC).transpose(0, 2, 1, 3).ravel()
        coords_t = [plane_sweep_pix_coords(proj_mats[i], depth_values, h,
                                           w, pad, lane_perm=perm)
                    for i in range(1, V)]
        xs_t = jnp.stack([c[0] for c in coords_t])
        ys_t = jnp.stack([c[1] for c in coords_t])
        static = _Static(band=0, m=TR * wp, bpp=hp // TR, c_feat=C,
                         c_img=Ci, cc=cc, wb=wb, bandp=bandp)

        def branch(srcs_cw, xs_unused, ys_unused):
            from .pallas_sweep2 import TC
            srcs_hwc = srcs_cw.transpose(0, 1, 3, 2)   # (V-1, h, w, cp)
            refb_t = tile_lanes(
                ref_p.reshape(hp // TR, TR * wp, cp).transpose(0, 2, 1),
                wp)
            cost_t = cost_volume_xband_pallas(srcs_hwc, refb_t, xs_t,
                                              ys_t, static)
            ct = Ci * V + C
            if cost_layout == "packed16" and \
                    _os.environ.get("MVSNERF_XBAND_PACK", "kernel") \
                    != "xla":
                # Pallas repack/unpack kernels (bit-exact): the XLA
                # permutation costs ~15 ms per direction IN CONTEXT (8.3
                # isolated); the kernels cut the full build fwd+bwd
                # 72.8 -> 32.4 ms (scripts/probe_xband_overhead.py, r5)
                from .pallas_sweep2 import pack16_from_tiles
                return pack16_from_tiles(cost_t, D, hp, wp, ct)
            if cost_layout == "packed16":
                # tile-unpack FUSED into the packed16 relayout: one
                # transpose pass instead of untile_lanes + pack (the
                # separate untile measured +9 ms/direction at DTU scale,
                # scripts/decompose_sweep2_device.py)
                # lanes within a band are (tile, row, col); target rows
                # (bpp, TR) and cols (nct, TC)
                cm7 = cost_t.reshape(cc, D // 16, 16, hp // TR,
                                     wp // TC, TR, TC)
                parts = [cm7[:ct, :, p].transpose(1, 2, 4, 3, 5, 0)
                         for p in range(16)]
                pk = jnp.concatenate(
                    [p.reshape(D // 16, hp, wp, ct) for p in parts],
                    axis=-1)
                return pk.reshape(1, D // 16, hp, wp, 16 * ct)
            cost_cm = untile_lanes(cost_t, wp)
            if cost_layout == "cmajor":
                return cost_cm.reshape(cc, D, hp, wp)[:ct]
            return cost_cm.reshape(cc, D, hp, wp).transpose(1, 2, 3, 0)[
                ..., :ct]

        return xband_fits(xs_t, ys_t, h, w, wb, bandp), branch

    cost_fn = gather_fallback
    for rb, band in reversed(candidates):
        fits, branch = make_branch(rb, band)
        cost_fn = (lambda fits, branch, nxt:
                   lambda s, x, y: jax.lax.cond(fits, branch, nxt, s, x, y)
                   )(fits, branch, cost_fn)
    from .pallas_sweep2 import xband_shape_ok
    impl_env = _os.environ.get("MVSNERF_SWEEP_IMPL", "auto")
    # window tuning override, e.g. MVSNERF_XBAND=32,16 (wb, bandp).
    # Default bandp=12: DTU-geometry tile y-spans measure 7.5 + 2 tap
    # rows (validate_sweep2_tpu.py round 5) and the per-batch fits cond
    # falls back to the v1 kernel for geometries that need more.
    _xb_env = _os.environ.get("MVSNERF_XBAND", "32,12")
    _wb, _bandp = (int(s) for s in _xb_env.split(","))
    if impl_env != "fused" and xband_shape_ok(hp, wp, h, w, _wb, _bandp):
        fits, branch = make_xband_branch(wb=_wb, bandp=_bandp)
        cost_fn = (lambda fits, branch, nxt:
                   lambda s, x, y: jax.lax.cond(fits, branch, nxt, s, x, y)
                   )(fits, branch, cost_fn)
    cost = cost_fn(srcs_cw, xs, ys)

    # side outputs for return_color consumers — DCE'd when unused (the
    # normalized grids are built here, NOT in the hot path above)
    grids = [plane_sweep_grid(proj_mats[i], depth_values, h, w, pad)
             for i in range(1, V)]
    masks = jnp.stack([in_bounds_mask(g) for g in grids])
    in_masks = jnp.concatenate(
        [jnp.ones((1, D, hp, wp), jnp.float32), masks], axis=0)
    ref_rgb = jnp.broadcast_to(ref_img[None], (D, hp, wp, Ci))
    wimgs = jnp.stack([
        jax.lax.map(
            lambda g: grid_sample_2d(imgs_l[i + 1], g,
                                     padding_mode="zeros"),
            grids[i].reshape(-1, plane_block, hp, wp, 2)
        ).reshape(D, hp, wp, Ci)
        for i in range(V - 1)])
    colors = jnp.concatenate(
        [jnp.concatenate([ref_rgb[None], wimgs], axis=0),
         in_masks[..., None]], axis=-1)
    return cost, in_masks, colors


def build_cost_volume_feat(feats, proj_mats, depth_values, pad: int = 0):
    """Feature-only variance volume (models.py:787-837, build_volume_costvar).

    Normalization quirk preserved: the mask count starts from ones
    (models.py:814), i.e. divides by 1 + sum(src masks) rather than the
    per-view-count of the img variant.

    Returns:
        (variance (D, hp, wp, C), in_masks (D, hp, wp)).
    """
    V, h, w, C = feats.shape
    D = depth_values.shape[0]
    hp, wp = h + 2 * pad, w + 2 * pad
    ref_feat = jnp.pad(feats[0], ((pad, pad), (pad, pad), (0, 0)))

    def warp_one(feat, pm):
        grid = plane_sweep_grid(pm, depth_values, h, w, pad)
        return (grid_sample_2d(feat, grid, padding_mode="zeros"),
                in_bounds_mask(grid))

    wfeats, masks = jax.vmap(warp_one)(feats[1:], proj_mats[1:])
    volume_sum = ref_feat[None] + jnp.sum(wfeats, axis=0)
    volume_sq_sum = (ref_feat ** 2)[None] + jnp.sum(wfeats ** 2, axis=0)
    in_masks = 1.0 + jnp.sum(masks, axis=0)  # (D, hp, wp)
    count = (1.0 / in_masks)[..., None]
    variance = volume_sq_sum * count - (volume_sum * count) ** 2
    return variance, in_masks
