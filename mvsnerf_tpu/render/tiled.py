"""Shared construction of the fused tiled full-image renderer
(ops/pallas_render_tiled.py) from a system's state: bake per-view colors
into the encoding volume (the reference's use_color_volume layout,
train_mvs_nerf_finetuning_pl.py:72-80), size the kernel windows to the
volume, and return a `fn(rays, H, W) -> dict | None` closure (None =
image doesn't tile / locality rejected; callers fall back to the exact
chunked path). Used by the eval CLI (--render_mode tiled) and the
fine-tune/video render path. v0-MLP only."""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp

from ..ops.geometry import get_ndc_coordinate
from ..ops.sampling import ray_marcher, ray_marcher_fine

log = logging.getLogger("mvsnerf_tpu.render")


def pick_tile(H, W, target=2048):
    """Largest (th, tw) image tile dividing (H, W) with th*tw <= target
    and tw >= th (lane-friendly); None when the image tiles too poorly
    for the fused kernel (tiny ragged sizes)."""
    best = None
    for th in (64, 32, 16, 8):
        if H % th:
            continue
        for tw in (128, 64, 32, 16, 8):
            if W % tw or th * tw > target or tw < th:
                continue
            r = th * tw
            if best is None or r > best[0]:
                best = (r, (th, tw))
            break
    if best is None or best[0] < 256:
        return None
    return best[1]


def bake_color_volume(volume, imgs, pose_source, near_far, pad):
    """Append per-view reprojected colors+masks to the encoding volume at
    every voxel center (the reference's use_color_volume layout,
    train_mvs_nerf_finetuning_pl.py:72-80): (D, hp, wp, 8) -> (..., 8+4V).
    The same construction FinetuneSystem._init_volume performs for
    use_color_volume — kept callable standalone for the eval/bench paths
    that never build a training system."""
    from .renderer import build_color_volume
    from ..train.finetune import frustum_point_volume

    d, hp, wp, _ = volume.shape
    intr_ref = pose_source["intrinsics"][0]
    nf = jnp.asarray(near_far, jnp.float32)
    intrinsic_s4 = intr_ref / jnp.asarray([[4.0], [4.0], [1.0]])
    c2ws = pose_source.get("c2ws")
    c2w_ref = c2ws[0] if c2ws is not None \
        else jnp.linalg.inv(pose_source["w2cs"][0])
    vox = frustum_point_volume(hp - 2 * pad, wp - 2 * pad, d, pad, nf,
                               intrinsic_s4, c2w_ref)
    color = build_color_volume(
        vox.reshape(d, -1, 3), pose_source["w2cs"],
        pose_source["intrinsics"], imgs, with_mask=True
    ).reshape(d, hp, wp, -1)
    return jnp.concatenate([volume, color], -1)


def _reject(reason: str):
    """None-producing closure for plans the fused kernel can't serve; the
    reason is logged once at plan time and kept on the closure so callers
    (eval CLI, tests) can report which path actually rendered."""
    log.info("tiled render path rejected: %s; falling back to the exact "
             "chunked path", reason)

    def fn(rays, H, W):
        return None
    fn.reject_reason = reason
    return fn


def make_tiled_renderer(args, mlp, volume, imgs, near_far, pose_source,
                        density_volume=None, bbox=None,
                        color_feature=None, exact_colors: bool = False):
    """Build the tiled-render closure, or a None-returning one when the
    configuration can't use the fused kernel (non-v0 MLP, sample count
    not a multiple of the kernel's column block, volume too small or
    misaligned, un-bakeable channel count).

    With `exact_colors` (render_mode='hybrid'): the volume carries only
    the 8 encoding channels; per-sample source colors are computed
    EXACTLY outside the kernel (build_color_volume, banded-MXU pallas
    path) and streamed into the kernel's MLP feature lanes — exact
    reference quality at fused-kernel speed.

    With `bbox` ((2, 3) world AABB) the volume coords are bbox-normalized
    instead of reference-view NDC — the fusion system's canonical-grid
    convention (train/fusion.py render_fn); the volume must then already
    carry the baked 20 channels. `color_feature` supplies pre-baked
    per-view colors (FinetuneSystem caches them for the density-volume
    path) so an 8-channel volume needn't be re-baked.

    NDC note: `inv_scale` comes from the SOURCE view dims (imgs) — the
    volume's feature grid is sized by them (utils.py:140-143 pad remap),
    independent of the render-target resolution.
    """
    from ..ops import pallas_render_tiled as prt

    n_total = args.N_samples + (
        args.N_importance if density_volume is not None else 0)
    if args.net_type != "v0":
        return _reject(f"MLP net_type {args.net_type!r} (kernel is v0-only)")
    if n_total % prt.COLS_PER_BLOCK:
        return _reject(f"N_samples {n_total} not a multiple of the kernel "
                       f"column block {prt.COLS_PER_BLOCK}")
    from .renderer import gen_dir_feature

    d, hp, wp, c = volume.shape
    if bbox is not None:
        assert c >= 20, "bbox mode requires the baked color volume"
        bbox = jnp.asarray(bbox, jnp.float32)
    # window sizes adapted to the volume (yb * kb == 128 contract); the
    # kernel's dynamic window offsets carry 8-sublane / 128-lane alignment
    # hints, so the volume dims must align (plan_tiles clamps origins to
    # size - window, which is only aligned when the size is)
    yb = 32 if hp >= 32 else (16 if hp >= 16 else 8)
    xb = 32
    while xb > max(wp, 4):
        xb //= 2
    if hp < 8 or wp < 4 or hp % 8 or wp % 4:
        return _reject(f"volume grid {hp}x{wp} misaligned (needs "
                       "hp % 8 == 0, wp % 4 == 0)")
    if exact_colors:
        if bbox is not None:
            return _reject("hybrid exact-colors path has no bbox mode")
        if imgs is None or imgs.shape[0] != 3:
            v = None if imgs is None else imgs.shape[0]
            return _reject(f"hybrid path needs 3 source views (V={v})")
        if c != 8:
            volume = volume[..., :8]
    elif c == 8:
        if color_feature is not None:
            volume = jnp.concatenate([volume, color_feature], -1)
        elif imgs is not None and imgs.shape[0] == 3:
            volume = bake_color_volume(volume, imgs, pose_source,
                                       near_far, args.pad)
        else:
            v = None if imgs is None else imgs.shape[0]
            return _reject(f"un-bakeable color volume (V={v} source views, "
                           "kernel needs 3)")
    if not exact_colors and volume.shape[-1] != 20:
        return _reject(f"volume has {volume.shape[-1]} channels (kernel "
                       "lane packing is 20-channel)")
    w2c_ref = pose_source["w2cs"][0]
    intr_ref = pose_source.get("intrinsics", [None])[0]
    nf = None if bbox is not None else jnp.asarray(near_far, jnp.float32)
    if bbox is None:
        # source-view extent, NOT the render target's (pad remap contract)
        src_h, src_w = imgs.shape[1:3]
        inv_scale = jnp.asarray([src_w - 1.0, src_h - 1.0])
    vol3 = prt.prepare_volume(volume)
    weights = prt.pack_v0_weights_padded(mlp)

    @jax.jit
    def prep(r):
        pts, _, rays_d, z_vals = ray_marcher(
            jax.random.PRNGKey(0), r, args.N_samples, perturb=0.0,
            lindisp=args.use_disp, bbox_3d=bbox)

        def ndc(p):
            if bbox is not None:
                return (p - bbox[0]) / (bbox[1] - bbox[0])
            return get_ndc_coordinate(w2c_ref, intr_ref, p, inv_scale,
                                      near=nf[0], far=nf[1], pad=args.pad,
                                      lindisp=args.use_disp)

        pts_ndc = ndc(pts)
        if density_volume is not None and args.N_importance > 0:
            pts, _, rays_d, z_vals = ray_marcher_fine(
                jax.random.PRNGKey(1), r, density_volume, z_vals, pts_ndc,
                args.N_importance)
            pts_ndc = ndc(pts)
        cos = jnp.linalg.norm(rays_d, axis=-1)
        angle = gen_dir_feature(w2c_ref, rays_d / cos[..., None])
        return pts_ndc, angle, z_vals, (pts if exact_colors else None)

    @functools.partial(jax.jit, static_argnames=("image_hw", "tile_hw",
                                                 "n_slab"))
    def packed_colors(pts, *, image_hw, tile_hw, n_slab):
        """Exact per-sample colors in the kernel's streamed layout,
        computed per row-slab (full-image f32 colors are ~2 GB at DTU
        scale; slabs bound the HBM temporaries) via the banded-MXU warp
        (ops/pallas_sweep.py — 10x the corner-packed gather on device)."""
        from .renderer import build_color_volume
        ih, iw = image_hw
        p = pts.reshape(n_slab, (ih // n_slab) * iw, *pts.shape[1:])

        def one(p1):
            # rb=32: consecutive full-image rays share source rows, and
            # the device A/B (round 4) measured rb=32 ~7% faster e2e than
            # rb=8; the in-kernel fits check falls back per view if a
            # wide-baseline slab breaks the y-band contract.
            c = build_color_volume(p1, pose_source["w2cs"],
                                   pose_source["intrinsics"], imgs,
                                   row_block=32)
            return prt.pack_color_tiles(c, image_hw=(ih // n_slab, iw),
                                        tile_hw=tile_hw)

        ct = jax.lax.map(one, p)
        return ct.reshape(-1, *ct.shape[2:])

    def pick_slabs(H, W, S, th):
        # smallest slab count (dividing the tile rows) bounding the f32
        # per-slab color tensor to ~256 MB
        tile_rows = H // th
        for n in range(1, tile_rows + 1):
            if tile_rows % n == 0 and (H // n) * W * S * 48 <= 256 * 2**20:
                return n
        return tile_rows

    def render(rays, H, W):
        tile = pick_tile(H, W)
        if tile is None:
            log.info("tiled render path rejected: image %dx%d tiles too "
                     "poorly; falling back to the exact chunked path", H, W)
            return None
        pts_ndc, angle, z_vals, pts = prep(jnp.asarray(rays))
        colors_t = None
        if exact_colors:
            colors_t = packed_colors(
                pts, image_hw=(H, W), tile_hw=tile,
                n_slab=pick_slabs(H, W, n_total, tile[0]))
        out = prt.render_image_tiled(
            mlp, vol3, pts_ndc, angle, z_vals, image_hw=(H, W),
            dims=(d, hp, wp), tile_hw=tile, yb=yb, kb=128 // yb,
            xb=xb, white_bkgd=args.white_bkgd, weights_list=weights,
            fallback_fn=lambda: None, packed_colors=colors_t,
            interpret=jax.default_backend() == "cpu")
        if out is None:
            log.info("tiled render path rejected: view breaks tile window "
                     "locality; falling back to the exact chunked path")
        return out

    return render


def cached_tiled_renderer(system, volume, imgs, near_far, pose_source,
                          density_volume=None, bbox=None,
                          color_feature=None):
    """make_tiled_renderer memoized on the system keyed by the live input
    arrays: per-frame video/validation calls reuse one closure (one jit
    trace, one color bake) until the volume/MLP actually change. Keys are
    weakrefs — identity is only trusted while the original arrays are
    alive (no id-reuse hazard), and stale entries don't pin HBM."""
    import weakref

    def refs():
        leaves = [volume, *jax.tree.leaves(system.params["mlp"])]
        if density_volume is not None:
            leaves.append(density_volume)
        return leaves

    cached = getattr(system, "_tiled_cache", None)
    if cached is not None:
        old_refs, fn = cached
        live = [r() for r in old_refs]
        now = refs()
        if len(live) == len(now) and \
                all(a is b and a is not None for a, b in zip(live, now)):
            return fn
    fn = make_tiled_renderer(system.args, system.params["mlp"], volume,
                             imgs, near_far, pose_source,
                             density_volume=density_volume, bbox=bbox,
                             color_feature=color_feature)
    system._tiled_cache = ([weakref.ref(a) for a in refs()], fn)
    return fn
