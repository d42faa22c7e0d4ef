"""The volume-rendering pipeline.

TPU-native re-design of reference renderer.py:28-176 + utils.py:300-332:
instead of Python `chunk`/`netchunk` loops (renderer.py:28-40), the whole
per-ray pipeline — trilinear volume fetch, per-view color reprojection,
positional encoding, MLP, compositing — is one jit-compiled function over
static (N_rays, N_samples) shapes. Full images are rendered by `lax.map`
over fixed-size ray chunks (render_image_chunked), and sharded across chips
by the ray axis (mvsnerf_tpu.parallel).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.compositing import raw2outputs
from ..ops.encoding import positional_encoding
from ..ops.geometry import get_ndc_coordinate
from ..ops.interp import grid_sample_2d, index_point_feature
from ..ops.precision import matmul_f32
from ..models.nerf_mlp import mlp_apply, mlp_apply_alpha


def build_color_volume(pts_world, w2cs, intrinsics, imgs, with_mask=True,
                       img_feats=None, mode: str = "auto",
                       row_block: int | None = None, band: int = 32):
    """Per-sample source-view colors + in-bounds masks (utils.py:300-332).

    Args:
        pts_world: (N_rays, N_samples, 3).
        w2cs: (V, 4, 4); intrinsics: (V, 3, 3); imgs: (V, H, W, 3).
        img_feats: optional (V, H, W, F) extra per-view features, sampled
                   with zeros padding (utils.py:322).
        mode: 'gather' = corner-packed XLA gather; 'pallas' = banded
            one-hot MXU warp (ops/pallas_sweep.py — the per-sample gather
            is the render path's second-largest cost, 1.0 s/image at
            640x512 measured device-looped; the MXU warp exploits the
            small source-y span of each ray's epipolar segment).
            'auto' = pallas on TPU for (N, S, 3) sample grids without
            img_feats, gather otherwise. The pallas path lax.cond-falls
            back to the gather per view when the y-band contract fails.
        row_block: rays per kernel block for the pallas path (default 1 —
            safe for random-ray training batches; full-image callers can
            raise it since consecutive rays share image rows).
        band: source-row band height for the pallas path.

    Returns:
        (N_rays, N_samples, V * (3 [+F] [+1])) features, per-view blocks of
        [RGB (border padding), feats, mask].
    """
    V, H, W, _ = imgs.shape
    inv_scale = jnp.array([W - 1, H - 1], jnp.float32)
    if mode == "auto":
        mode = "pallas" if (jax.default_backend() == "tpu"
                            and img_feats is None
                            and pts_world.ndim == 3
                            and pts_world.shape[1] % 128 == 0
                            and H > band) else "gather"

    def one_view(w2c, intr, img, feat):
        ndc = get_ndc_coordinate(w2c, intr, pts_world, inv_scale,
                                 near=1.0, far=2.0)  # z unused below
        grid = ndc[..., :2] * 2.0 - 1.0
        # corner-packed sampling: one gather per sample instead of four
        from ..ops.interp import grid_sample_2d_packed, pack_corners_2d
        parts = [grid_sample_2d_packed(pack_corners_2d(img), grid,
                                       padding_mode="border")]
        if feat is not None:
            parts.append(grid_sample_2d(feat, grid, padding_mode="zeros"))
        if with_mask:
            ok = (grid > -1.0) & (grid < 1.0)
            parts.append((ok[..., 0] & ok[..., 1]).astype(jnp.float32)[..., None])
        return jnp.concatenate(parts, axis=-1)

    def one_view_pallas(w2c, intr, img):
        from ..ops.pallas_sweep import (bilinear_warp_pallas,
                                        sweep_fits_band)
        ndc = get_ndc_coordinate(w2c, intr, pts_world, inv_scale,
                                 near=1.0, far=2.0)
        grid = ndc[..., :2] * 2.0 - 1.0
        # border padding == bilinear on coords clamped to the corner
        # pixel centers (align_corners=True)
        grid_c = jnp.clip(grid, -1.0, 1.0)
        rb = row_block or 1

        def warped(g):
            return bilinear_warp_pallas(img, g, rb, band)

        fits = sweep_fits_band(grid_c, H, rb, band)
        rgb = jax.lax.cond(
            fits, warped,
            lambda g: grid_sample_2d(img, g, padding_mode="zeros"),
            grid_c)
        if with_mask:
            ok = (grid > -1.0) & (grid < 1.0)
            rgb = jnp.concatenate(
                [rgb, (ok[..., 0] & ok[..., 1]).astype(
                    jnp.float32)[..., None]], axis=-1)
        return rgb

    if mode == "pallas":
        views = [one_view_pallas(w2cs[i], intrinsics[i], imgs[i])
                 for i in range(V)]
        return jnp.concatenate(views, axis=-1)
    if img_feats is None:
        views = jax.vmap(lambda w, k, im: one_view(w, k, im, None))(
            w2cs, intrinsics, imgs)
    else:
        views = jax.vmap(one_view)(w2cs, intrinsics, imgs, img_feats)
    # (V, N, S, C) -> (N, S, V*C), per-view blocks in view order.
    return jnp.concatenate([views[i] for i in range(V)], axis=-1)


def gen_dir_feature(w2c_ref, rays_dir):
    """View dirs rotated into the reference camera frame (renderer.py:111-122)."""
    return matmul_f32(rays_dir, w2c_ref[:3, :3].T)


def gen_angle_feature(c2ws, rays_pts, rays_dir):
    """Per-source-view angle cosines (renderer.py:96-109; unused by the
    main v0 path, provided for parity).

    Args:
        c2ws: (V, 4, 4); rays_pts: (N, S, 3); rays_dir: (N, 3).
    Returns:
        (N, S, V) cosines between sample->camera dirs and the ray dir.
    """
    n_rays, n_samples = rays_pts.shape[:2]
    cam_centers = c2ws[:, :3, 3]                       # (V, 3)
    dirs = rays_pts[:, :, None] - cam_centers[None, None]
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-7)
    return jnp.sum(dirs * rays_dir.reshape(n_rays, 1, 1, 3),
                   axis=-1).reshape(n_rays, n_samples, -1)


def resolve_volume_gather_impl(impl: str, volume_shape, n_rays: int,
                               band_k: int) -> str:
    """Resolve 'auto' for the trainable-volume gather and reject pallas
    configs the kernel cannot express (falls back to banded).

    The fused Pallas kernels (ops/pallas_volgather{,2}.py) require C a
    power of two <= 128 (the color-baked 20-channel volume is NOT),
    N % 8 == 0, and D >= band_k + 1.

    'auto' resolution (round-4/5 device A/Bs, docs/status.md):
      * v1 ('pallas') is a measured NEGATIVE — in-step 30.1 vs 23.8 ms;
        it pays the same dense one-hot matmul FLOPs as the banded path.
      * v2 ('pallas2', y-sorted blocks, ops/pallas_volgather2.py) WINS
        on TPU at TRAINING batch shapes (isolated fwd 4.1 vs banded
        5.8 ms at 1024x128) but LOSES at full-image render chunks
        (49.3 vs 42.9 ms at 16384x128 — the per-batch argsort grows
        with n and the y-band narrows less for structured rows), so
        'auto' is SHAPE-GATED to n_rays <= 4096
        (scripts/ab_gather_render_shape.py, round 5 — this gate is the
        fix for the r4 render regression 130.4k -> 117.0k rays/s). It
        still lax.cond-falls back per batch if the (z, y) band contract
        fails on the actual coordinates.
      * off-TPU 'auto' stays banded (the kernel would run in interpret
        mode — orders of magnitude slower than XLA on CPU)."""
    d, _, _, c = volume_shape
    fits = (c & (c - 1) == 0 and c <= 128 and n_rays % 8 == 0
            and d >= band_k + 1)
    if impl == "auto":
        return ("pallas2" if fits and n_rays <= 4096
                and jax.default_backend() == "tpu"
                else "banded")
    if impl in ("pallas", "pallas_bf16") and not fits:
        return "banded"
    if impl == "pallas2" and not fits:
        return "banded"  # pallas2 also lax.cond-falls back per batch
    return impl


def gen_pts_feats(volume, pts_ndc, pts_world=None, w2cs=None,
                  intrinsics=None, imgs=None, use_color_volume=False,
                  fast_volume_grad=False, volume_band_k=8,
                  volume_gather_impl="auto", color_warp_mode="auto"):
    """Per-sample MLP feature: 8ch encoding volume + 12ch color volume
    (renderer.py:124-136). With use_color_volume, everything is pre-baked
    into `volume` (renderer.py:134-135). `fast_volume_grad` routes the
    volume lookup through a banded custom VJP — use in training steps
    that differentiate wrt the volume; `volume_gather_impl` selects the
    XLA banded factorization (ops/volume_grad.py) or the fused Pallas
    gather/splat kernel (ops/pallas_volgather.py)."""
    if fast_volume_grad:
        impl = resolve_volume_gather_impl(
            volume_gather_impl, volume.shape, pts_ndc.shape[0],
            volume_band_k)
        if impl == "pallas2":
            from ..ops.pallas_volgather2 import sample_volume_sorted
            ray_feats = sample_volume_sorted(volume, pts_ndc,
                                             volume_band_k)
        elif impl in ("pallas", "pallas_bf16"):
            from ..ops.pallas_volgather import sample_volume_pallas
            dt = jnp.bfloat16 if impl == "pallas_bf16" else jnp.float32
            ray_feats = sample_volume_pallas(volume, pts_ndc,
                                             volume_band_k, None, dt)
        else:
            from ..ops.volume_grad import sample_volume_train
            ray_feats = sample_volume_train(volume, pts_ndc, volume_band_k)
    else:
        ray_feats = index_point_feature(volume, pts_ndc)
    if use_color_volume:
        return ray_feats
    colors = build_color_volume(pts_world, w2cs, intrinsics, imgs,
                                with_mask=True, mode=color_warp_mode)
    return jnp.concatenate([ray_feats, colors], axis=-1)


def resolve_mlp_impl(impl: str, training: bool = False) -> str:
    """Resolve --mlp_impl 'auto'.

    TRAINING steps on TPU use the fused Pallas v0 train kernel
    (ops/pallas_mlp.py) at 'default' (1-pass bf16 dots) precision.
    Evidence (docs/status.md round 5, measured on the PRODUCTION
    FinetuneSystem step via bench.py): in-step 43.8k rays/s (pallas)
    vs 40.9k (xla); 2000-step training-quality trajectories are
    statistically identical across xla/pallas/pallas_high
    (scripts/ab_mlp_quality.py — final losses 0.01718/0.01718/0.01717,
    val PSNR 18.72/18.73/18.74).

    Eval/render paths resolve to 'xla' — the exact HIGHEST-precision
    MLP — both for bit-parity with the reference protocol and because
    the kernel's input-gradient contract (zeros for pts_pe/viewdirs)
    is train-only."""
    if impl != "auto":
        return impl
    if training and jax.default_backend() == "tpu":
        return "pallas"
    return "xla"


def run_network(mlp_params, pts_ndc, viewdirs, feats, net_type="v0",
                multires=10, multires_views=0, mlp_impl="xla"):
    """PE + concat + MLP (renderer.py:42-63). viewdirs None => alpha-only.

    `mlp_impl='pallas'` routes v0 through the fused train kernel
    (ops/pallas_mlp.py) — TRAINING LOSSES ONLY: its input cotangent is
    exact for the feats slice (the volume/MVSNet path) and structurally
    zero for pts_pe/viewdirs (never trainable in either trainer)."""
    pts_pe = positional_encoding(pts_ndc, multires)
    x = jnp.concatenate([pts_pe, feats], axis=-1)
    in_ch_pts = pts_pe.shape[-1]
    if viewdirs is None:
        return mlp_apply_alpha(mlp_params, x, net_type, in_ch_pts)
    if viewdirs.ndim != pts_ndc.ndim:
        viewdirs = jnp.broadcast_to(viewdirs[:, None],
                                    (*pts_ndc.shape[:-1], viewdirs.shape[-1]))
    if multires_views > 0:
        viewdirs = positional_encoding(viewdirs, multires_views)
    x = jnp.concatenate([x, viewdirs], axis=-1)
    if mlp_impl in ("pallas", "pallas_high") and net_type == "v0":
        import math

        from ..ops.pallas_mlp import mlp_v0_fits, mlp_v0_train
        if mlp_v0_fits(mlp_params, x) and \
                math.prod(x.shape[:-1]) % 8 == 0:
            prec = "high" if mlp_impl == "pallas_high" else "default"
            return mlp_v0_train(mlp_params, x, prec)
    return mlp_apply(mlp_params, x, net_type, in_ch_pts,
                     viewdirs.shape[-1])


def render_rays(mlp_params, volume, pts_world, pts_ndc, z_vals, rays_dir,
                w2c_ref=None, w2cs=None, intrinsics=None, imgs=None,
                net_type: str = "v0", multires: int = 10,
                multires_views: int = 0, use_color_volume: bool = False,
                white_bkgd: bool = False, fast_volume_grad: bool = False,
                volume_band_k: int = 8, volume_gather_impl: str = "auto",
                color_warp_mode: str = "auto", mlp_impl: str = "auto"):
    """The render entry (renderer.py:138-165).

    Args:
        mlp_params: renderer MLP pytree.
        volume: (D, h, w, C) encoding volume (C=8, or 20 when color-baked).
        pts_world/pts_ndc: (N, S, 3); z_vals: (N, S); rays_dir: (N, 3).
        w2c_ref: reference-view world-to-camera (for the view-dir feature).
        w2cs/intrinsics/imgs: source views for color reprojection.

    Returns:
        dict: rgb, depth, acc, disp, weights, alpha, feats.
    """
    cos_angle = jnp.linalg.norm(rays_dir, axis=-1)
    unit_dirs = rays_dir / cos_angle[..., None]
    angle = gen_dir_feature(w2c_ref, unit_dirs) if w2c_ref is not None \
        else unit_dirs

    feats = gen_pts_feats(volume, pts_ndc, pts_world, w2cs, intrinsics, imgs,
                          use_color_volume=use_color_volume,
                          fast_volume_grad=fast_volume_grad,
                          volume_band_k=volume_band_k,
                          volume_gather_impl=volume_gather_impl,
                          color_warp_mode=color_warp_mode)
    # render_rays resolves 'auto' as an EVAL path (training=False); a
    # trainer that wants the fused train kernel resolves training=True
    # itself and passes the result in. Currently the fine-tune trainer
    # does (train/finetune.py); generalizable/fusion pass 'auto' through
    # and therefore train on the XLA MLP (their steps are dominated by
    # the cost-volume build / fusion volume, and the kernel's quality
    # parity is A/B'd on the fine-tune schedule — see docs/status.md).
    mlp_impl = resolve_mlp_impl(mlp_impl, training=False)
    raw = run_network(mlp_params, pts_ndc, angle, feats, net_type=net_type,
                      multires=multires, multires_views=multires_views,
                      mlp_impl=mlp_impl)
    if raw.shape[-1] > 4:
        # v1 appends fused colors; fold them into the feature tensor
        # (renderer.py:157-158).
        feats = jnp.concatenate([feats[..., :8], raw[..., 4:]], axis=-1)
    out = raw2outputs(raw, z_vals, white_bkgd=white_bkgd)
    out["feats"] = feats
    return out


def render_density(mlp_params, pts_ndc, density_feats, net_type="v0",
                   multires=10):
    """Density-only evaluation for density-volume refresh
    (renderer.py:167-176)."""
    return run_network(mlp_params, pts_ndc, None, density_feats,
                       net_type=net_type, multires=multires)


def make_render_fn(net_type: str = "v0", multires: int = 10,
                   use_color_volume: bool = False, white_bkgd: bool = False):
    """jit-compiled render closure over the static configuration."""

    @jax.jit
    def fn(mlp_params, volume, pts_world, pts_ndc, z_vals, rays_dir,
           w2c_ref, w2cs, intrinsics, imgs):
        return render_rays(
            mlp_params, volume, pts_world, pts_ndc, z_vals, rays_dir,
            w2c_ref=w2c_ref, w2cs=w2cs, intrinsics=intrinsics, imgs=imgs,
            net_type=net_type, multires=multires,
            use_color_volume=use_color_volume, white_bkgd=white_bkgd)

    return fn


def render_image_chunked(render_chunk_fn, ray_args, n_rays: int,
                         chunk: int = 8192):
    """Render a full image by lax.map over fixed-size ray chunks.

    The TPU-native replacement for the reference's serial Python chunk loop
    (train_mvs_nerf_pl.py:198, notebooks chunk=5120): rays are padded to a
    multiple of `chunk`, reshaped to (n_chunks, chunk, ...), and scanned with
    one compiled program; the pad tail is dropped at the end.

    Args:
        render_chunk_fn: fn(*chunk_args) -> dict of (chunk, ...) arrays.
        ray_args: tuple of arrays with leading dim n_rays.
    """
    pad = (-n_rays) % chunk
    # Edge replication, NOT zeros: the banded volume gather
    # (ops/volume_grad.py) derives a per-sample-column z band from ALL
    # rays in a chunk — zero-padded rays (ndc z == 0) would drag zmin to
    # 0 and silently clamp the REAL rays' reads whenever
    # n_rays % chunk != 0. Replicated rays share real rays' locality.
    padded = [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                      mode="edge")
              for a in ray_args]
    chunked = [a.reshape(-1, chunk, *a.shape[1:]) for a in padded]
    out = jax.lax.map(lambda args: render_chunk_fn(*args), tuple(chunked))
    return jax.tree.map(
        lambda a: a.reshape(-1, *a.shape[2:])[:n_rays], out)
