"""No-finetune evaluation harness (reference renderer.ipynb cells 4-18).

For each validation image: pick the 3 nearest training views by camera
center, build the encoding volume once with MVSNet, render the full image in
fixed-size chunks, and compute PSNR / SSIM / LPIPS with the reference's
protocol quirks: Blender center-crops 80% (cell 11), DTU masks background
where GT depth == 0 and adds depth abs_err / acc@{0.01,0.05,0.1} (cell 16).
"""

from __future__ import annotations

import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..models import mvsnet_apply
from ..models.mvsnet import resolve_warp_mode
from ..ops.geometry import get_ndc_coordinate
from ..ops.sampling import ray_marcher
from ..render.renderer import render_image_chunked, render_rays
from ..train.common import unpreprocess_images
from ..utils.vis import visualize_depth, panel
from .metrics import psnr as psnr_fn, ssim as ssim_fn, abs_error, \
    acc_threshold


# re-exported for bench.py / tests (implementation moved to render/tiled.py)
from ..render.tiled import bake_color_volume  # noqa: F401,E402

log = logging.getLogger("mvsnerf_tpu.eval")


def nearest_source_views(tgt_c2w, train_c2ws, n: int = 3):
    """Nearest-3 selection by the L1 camera-center distance — the
    notebook protocol this CLI defaults to uses
    np.sum(np.abs(positions - pose)) (renderer.ipynb cell 11), NOT the
    L2 of utils.py:698-711 (which serves LLFF source pre-selection);
    the two can pick different source sets, so L1 keeps default eval
    metrics comparable to the published notebook numbers."""
    d = np.sum(np.abs(train_c2ws[:, :3, 3] - tgt_c2w[:3, 3]), axis=-1)
    return np.argsort(d)[:n]


class Evaluator:
    """Generalizable (no-finetune) evaluator over a per-scene dataset."""

    def __init__(self, args, dataset, mvsnet_params, mlp_params):
        self.args = args
        self.dataset = dataset
        self.mvsnet = mvsnet_params
        self.mlp = mlp_params
        self._chunk_fn_cache = {}

    def build_volume(self, pair_idx=None):
        imgs, proj_mats, near_far, pose_source = \
            self.dataset.read_source_views(pair_idx=pair_idx)
        imgs_norm = jnp.asarray(imgs)
        volume = jax.jit(
            lambda p, im: mvsnet_apply(
                p, im, jnp.asarray(proj_mats),
                jnp.asarray(near_far, jnp.float32), pad=self.args.pad,
                lindisp=self.args.use_disp,
                warp_mode=resolve_warp_mode(
                    getattr(self.args, "warp_mode", "auto")),
                costreg_impl=getattr(self.args, "costreg_impl", "auto"),
                featurenet_impl=getattr(self.args, "featurenet_impl",
                                        "auto"))[0]
        )(self.mvsnet, imgs_norm)
        pose_source = {k: jnp.asarray(v) for k, v in pose_source.items()}
        return volume, unpreprocess_images(imgs_norm), \
            np.asarray(near_far, np.float32), pose_source

    def render_rays_buffer(self, rays, volume, imgs, near_far, pose_source,
                           chunk: int = 5120):
        """Chunked full-image render from a flat (N, 8) ray buffer —
        the notebook loop (renderer.ipynb cell 11, chunk=5120) as one
        compiled lax.map."""
        args = self.args
        w2c_ref = pose_source["w2cs"][0]
        intrinsic_ref = pose_source["intrinsics"][0]
        H, W = imgs.shape[1:3]
        inv_scale = jnp.asarray([W - 1.0, H - 1.0])
        nf = jnp.asarray(near_far, jnp.float32)

        # 'fast' = banded-matmul gather forward: the plain XLA trilinear
        # gather serializes on TPU (221 vs 42.9 ms per 16384-ray chunk,
        # scripts/ab_gather_render_shape.py); PSNR parity vs 'exact'
        # recorded in docs/status.md round 5.
        mode = getattr(args, "eval_gather", "auto")
        fast = mode == "fast" or (mode == "auto"
                                  and jax.default_backend() == "tpu")

        def chunk_fn(r):
            pts, rays_o, rays_d, z_vals = ray_marcher(
                jax.random.PRNGKey(0), r, args.N_samples, perturb=0.0,
                lindisp=args.use_disp)
            pts_ndc = get_ndc_coordinate(w2c_ref, intrinsic_ref, pts,
                                         inv_scale, near=nf[0], far=nf[1],
                                         pad=args.pad,
                                         lindisp=args.use_disp)
            out = render_rays(
                self.mlp, volume, pts, pts_ndc, z_vals, rays_d,
                w2c_ref=w2c_ref, w2cs=pose_source["w2cs"],
                intrinsics=pose_source["intrinsics"], imgs=imgs,
                net_type=args.net_type, white_bkgd=args.white_bkgd,
                fast_volume_grad=fast, volume_band_k=4,
                volume_gather_impl="banded")
            return {"rgb": out["rgb"], "depth": out["depth"]}

        return render_image_chunked(chunk_fn, (jnp.asarray(rays),),
                                    rays.shape[0], chunk=chunk)

    def make_tiled_renderer(self, volume, imgs, near_far, pose_source,
                            exact_colors: bool = False):
        """Fast full-image render path: bake per-view colors into the
        encoding volume and render with the fused tiled Pallas kernel
        (or, with `exact_colors`, stream exact per-sample colors — the
        'hybrid' render mode, exact quality). Returns fn(rays, H, W) ->
        dict or None (None = tile locality failed; the caller falls back
        to the exact chunked path). Shared construction: render/tiled.py."""
        from ..render.tiled import make_tiled_renderer
        return make_tiled_renderer(self.args, self.mlp, volume, imgs,
                                   near_far, pose_source,
                                   exact_colors=exact_colors)

    def evaluate(self, max_images: int | None = None, lpips_fn=None,
                 save_dir: str | None = None, chunk: int = 5120,
                 per_image_sources: bool = False, train_c2ws=None,
                 train_indices=None, render_mode: str | None = None,
                 val_c2ws=None):
        """Run the full eval loop. Returns per-image + mean metrics.

        With `per_image_sources`, the 3 source views are re-selected per
        val image as the nearest training views by camera center and the
        encoding volume rebuilt (the notebook protocol, renderer.ipynb
        cell 11); `train_c2ws`/`train_indices` give the candidate poses and
        their dataset view ids. `val_c2ws` overrides the target poses
        (defaults to `dataset.poses`, which for LLFF holds ALL views, not
        the val split — the CLI passes split-correct poses).
        """
        args = self.args
        ds = self.dataset
        if render_mode is None:
            render_mode = getattr(args, "render_mode", "chunked")
        tiled_fn = None
        fast_mode = render_mode in ("tiled", "hybrid")
        if not per_image_sources:
            volume, imgs, near_far, pose_source = self.build_volume()
            if fast_mode:
                tiled_fn = self.make_tiled_renderer(
                    volume, imgs, near_far, pose_source,
                    exact_colors=render_mode == "hybrid")
        results = []
        n = len(ds)
        if max_images:
            n = min(n, max_images)
        for i in range(n):
            sample = ds[i]
            if per_image_sources:
                tgt_c2w = np.asarray(val_c2ws[i] if val_c2ws is not None
                                     else ds.poses[i])
                sel = nearest_source_views(tgt_c2w, np.asarray(train_c2ws),
                                           3)
                pair_idx = np.asarray(train_indices)[sel]
                volume, imgs, near_far, pose_source = \
                    self.build_volume(pair_idx=pair_idx)
                if fast_mode:
                    tiled_fn = self.make_tiled_renderer(
                        volume, imgs, near_far, pose_source,
                        exact_colors=render_mode == "hybrid")
            rays = sample["rays"]
            gt = np.asarray(sample["rgbs"])
            H, W = gt.shape[:2]
            out = tiled_fn(rays, H, W) if tiled_fn is not None else None
            path = render_mode
            if out is None:
                path = "chunked"
                out = self.render_rays_buffer(rays, volume, imgs, near_far,
                                              pose_source, chunk=chunk)
            if fast_mode:
                log.info("image %d rendered via the %s path", i, path)
            pred = np.clip(np.asarray(out["rgb"]).reshape(H, W, 3), 0, 1)
            depth = np.asarray(out["depth"]).reshape(H, W)

            row = {}
            if args.dataset_name == "blender":
                # center-crop 80% (renderer.ipynb cell 11)
                hc, wc = H // 10, W // 10
                p_, g_ = pred[hc:-hc, wc:-wc], gt[hc:-hc, wc:-wc]
                row["psnr"] = float(psnr_fn(p_, g_))
                row["ssim"] = float(ssim_fn(p_, g_))
                if lpips_fn is not None:
                    row["lpips"] = float(lpips_fn(p_ * 2 - 1, g_ * 2 - 1))
            elif "depth" in sample:
                # DTU: mask background where GT depth == 0 (cell 16)
                gt_depth = np.asarray(sample["depth"])
                mask = gt_depth > 0
                row["psnr"] = float(psnr_fn(pred, gt, jnp.asarray(mask)))
                row["ssim"] = float(ssim_fn(pred, gt))
                row["abs_err"] = float(
                    np.sum(np.asarray(abs_error(depth, gt_depth,
                                                mask))) / mask.sum())
                for t in (0.01, 0.05, 0.1):
                    row[f"acc_{t}"] = float(
                        acc_threshold(jnp.asarray(depth),
                                      jnp.asarray(gt_depth),
                                      jnp.asarray(mask), t))
                if lpips_fn is not None:
                    row["lpips"] = float(lpips_fn(pred * 2 - 1, gt * 2 - 1))
            else:
                row["psnr"] = float(psnr_fn(pred, gt))
                row["ssim"] = float(ssim_fn(pred, gt))
                if lpips_fn is not None:
                    row["lpips"] = float(lpips_fn(pred * 2 - 1, gt * 2 - 1))
            results.append(row)

            if save_dir:
                os.makedirs(save_dir, exist_ok=True)
                import imageio.v2 as imageio
                dvis, _ = visualize_depth(depth, near_far)
                strip = panel([gt, pred, dvis])
                imageio.imwrite(os.path.join(save_dir, f"{i:03d}.png"),
                                (np.clip(strip, 0, 1) * 255).astype("uint8"))

        mean = {k: float(np.mean([r[k] for r in results if k in r]))
                for k in results[0]}
        return {"per_image": results, "mean": mean}
