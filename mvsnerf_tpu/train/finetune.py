"""Per-scene fine-tuning (reference train_mvs_nerf_finetuning_pl.py).

The encoding volume is built once by MVSNet from 3 source views, then becomes
a trainable pytree leaf alongside the MLP. Rays come from the dataset's flat
buffers; each step is one jit-compiled program (sampling, NDC, render, MSE,
Adam). Optional baked color volume (use_color_volume) and density-volume
importance sampling (use_density_volume, refreshed every 200 steps).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..io.checkpoint import load_checkpoint, latest_checkpoint, save_checkpoint
from ..io.torch_ckpt import load_reference_checkpoint
from ..models import init_mlp, init_mvsnet, mvsnet_apply
from ..models.mvsnet import resolve_warp_mode
from ..ops.geometry import get_ndc_coordinate
from ..ops.precision import matmul_f32
from ..ops.sampling import ray_marcher, ray_marcher_fine
from ..render.renderer import (build_color_volume, render_density,
                               render_image_chunked, render_rays,
                               resolve_mlp_impl)
from ..utils.schedulers import make_lr_schedule
from .common import RayBatchIterator, unpreprocess_images


def frustum_point_volume(h, w, d, pad, near_far, intrinsic_s4, c2w):
    """Dense frustum voxel-center grid for color/density volume baking
    (reference utils.py:338-355 `get_ptsvolume`), channel-last (D, H, W, 3).
    `intrinsic_s4` is the stride-4 (feature-scale) intrinsic; h, w are
    UNPADDED feature dims."""
    near, far = near_far[0], near_far[1]
    corners = jnp.asarray([[-pad, -pad, 1.0], [w + pad, -pad, 1.0],
                           [-pad, h + pad, 1.0]], jnp.float32)
    corners = matmul_f32(corners, jnp.linalg.inv(intrinsic_s4).T)
    xs = jnp.linspace(corners[0, 0], corners[1, 0], w + 2 * pad)
    ys = jnp.linspace(corners[0, 1], corners[2, 1], h + 2 * pad)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    plane = jnp.stack([gx, gy, jnp.ones_like(gx)], -1)
    # z from near (t=1) to far (t=0) as in the reference linspace(1, 0)
    t = jnp.linspace(1.0, 0.0, d).reshape(d, 1, 1, 1)
    pts = t * plane * near + (1 - t) * plane * far
    pts = matmul_f32(pts.reshape(-1, 3), c2w[:3, :3].T) + c2w[:3, 3]
    return pts.reshape(d, h + 2 * pad, w + 2 * pad, 3)


class FinetuneSystem:
    """Functional fine-tuning system: build with args (config.config_parser),
    then call .fit(steps)."""

    def __init__(self, args, dataset_train, dataset_val=None):
        self.args = args
        self.train_dataset = dataset_train
        self.val_dataset = dataset_val
        self.net_type = args.net_type
        self.pad = args.pad

        # pretrained weights (.msgpack native snapshots are NOT loaded
        # here — callers restore() them after construction, e.g.
        # render_video.py)
        if args.ckpt and os.path.exists(args.ckpt) \
                and not args.ckpt.endswith(".msgpack"):
            ck = load_reference_checkpoint(args.ckpt, args.net_type)
            self.mlp = ck["mlp"]
            self.mvsnet = ck["mvsnet"]
            self.ckpt_volume = ck.get("volume")
        else:
            key = jax.random.PRNGKey(0)
            self.mlp = init_mlp(key, args.net_type, D=args.netdepth,
                                W=args.netwidth)
            self.mvsnet = init_mvsnet(jax.random.fold_in(key, 1))
            self.ckpt_volume = None

        self._init_volume()
        self._build_step()

    # ------------------------------------------------------------- setup ---

    def _init_volume(self):
        """Build the encoding volume once (reference finetuning:57-89)."""
        args = self.args
        imgs, proj_mats, near_far, pose_source = \
            self.train_dataset.read_source_views()
        self.imgs_norm = jnp.asarray(imgs)          # (V, H, W, 3) normalized
        self.proj_mats = jnp.asarray(proj_mats)
        self.near_far = jnp.asarray(near_far, jnp.float32)
        self.pose_source = {k: jnp.asarray(v) for k, v in
                            pose_source.items()}

        if self.ckpt_volume is not None:
            volume = jnp.asarray(self.ckpt_volume)
        else:
            volume = jax.jit(
                lambda p, im: mvsnet_apply(
                    p, im, self.proj_mats, self.near_far, pad=args.pad,
                    lindisp=args.use_disp,
                    warp_mode=resolve_warp_mode(
                        getattr(args, "warp_mode", "auto")),
                    costreg_impl=getattr(args, "costreg_impl", "auto"),
                    featurenet_impl=getattr(args, "featurenet_impl",
                                            "auto"))[0]
            )(self.mvsnet, self.imgs_norm)
        self.imgs = unpreprocess_images(self.imgs_norm)

        self.density_volume = None
        self.color_feature = None
        self.vox_pts = None
        if args.use_color_volume or args.use_density_volume:
            d, hp, wp, _ = volume.shape
            intrinsic_s4 = self.pose_source["intrinsics"][0] / \
                jnp.asarray([[4.0], [4.0], [1.0]])
            self.vox_pts = frustum_point_volume(
                hp - 2 * args.pad, wp - 2 * args.pad, d, args.pad,
                self.near_far, intrinsic_s4, self.pose_source["c2ws"][0])
            color = build_color_volume(
                self.vox_pts.reshape(d, -1, 3),
                self.pose_source["w2cs"], self.pose_source["intrinsics"],
                self.imgs, with_mask=True,
                mode=getattr(args, "color_warp_mode", "auto"))
            self.color_feature = color.reshape(d, hp, wp, -1)
            if args.use_color_volume:
                volume = jnp.concatenate([volume, self.color_feature], -1)

        self.params = {"mlp": self.mlp, "volume": volume}
        if not args.use_color_volume:
            # MVSNet stays in the optimizer like the reference (grads are
            # zero since it never runs in the step, but state is saved).
            self.params["mvsnet"] = self.mvsnet

    def _build_step(self):
        args = self.args
        w2c_ref = self.pose_source["w2cs"][0]
        intrinsic_ref = self.pose_source["intrinsics"][0]
        H, W = self.imgs.shape[1:3]
        inv_scale = jnp.asarray([W - 1.0, H - 1.0])
        n_samples = args.N_samples

        schedule = make_lr_schedule(
            args.lrate, args.lr_scheduler, args.decay_step, args.decay_gamma,
            num_steps=args.num_epochs * 10000 or 10000)
        self.optimizer = optax.adam(schedule, b1=0.9, b2=0.999)
        self.opt_state = self.optimizer.init(self.params)

        def ndc(pts):
            return get_ndc_coordinate(
                w2c_ref, intrinsic_ref, pts, inv_scale,
                near=self.near_far[0], far=self.near_far[1], pad=args.pad,
                lindisp=args.use_disp)

        band_k = 8
        try:
            from ..ops.volume_grad import volume_band_width
            band_k = volume_band_width(self.params["volume"].shape[0],
                                       n_samples, args.N_importance)
        except Exception:
            pass

        def render_fn(params, rays, key, density_volume, training=True):
            pts, rays_o, rays_d, z_vals = ray_marcher(
                key, rays, n_samples, perturb=args.perturb,
                lindisp=args.use_disp)
            pts_ndc = ndc(pts)
            if density_volume is not None and args.N_importance > 0:
                pts, rays_o, rays_d, z_vals = ray_marcher_fine(
                    jax.random.fold_in(key, 1), rays, density_volume,
                    z_vals, pts_ndc, args.N_importance)
                pts_ndc = ndc(pts)
            return render_rays(
                params["mlp"], params["volume"], pts, pts_ndc, z_vals,
                rays_d, w2c_ref=w2c_ref, w2cs=self.pose_source["w2cs"],
                intrinsics=self.pose_source["intrinsics"], imgs=self.imgs,
                net_type=args.net_type,
                use_color_volume=args.use_color_volume,
                white_bkgd=args.white_bkgd,
                fast_volume_grad=True, volume_band_k=band_k,
                volume_gather_impl=getattr(args, "volume_gather_impl",
                                           "auto"),
                color_warp_mode=getattr(args, "color_warp_mode", "auto"),
                mlp_impl=resolve_mlp_impl(
                    getattr(args, "mlp_impl", "auto"), training=training))

        def loss_fn(params, rays, rgbs, key, density_volume):
            out = render_fn(params, rays, key, density_volume)
            return jnp.mean((out["rgb"] - rgbs) ** 2)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, rays, rgbs, key):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, rays, rgbs, key, self.density_volume)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = step
        self._render_fn = render_fn

    # ----------------------------------------------------------- density ---

    def update_density_volume(self):
        """Refresh the baked density volume (reference finetuning:91-99)."""
        d, hp, wp = self.params["volume"].shape[:3]
        vol = self.params["volume"]
        if not self.args.use_color_volume:
            vol = jnp.concatenate([vol, self.color_feature], -1)
        feats = vol.reshape(d * hp * wp, -1)
        pts = self.vox_pts.reshape(d * hp * wp, 3)
        sigma = render_density(self.params["mlp"], pts, feats,
                               net_type=self.net_type)
        self.density_volume = sigma.reshape(d, hp, wp, 1)
        # density changed => step closure must see the new volume
        self._build_step_preserving_opt()

    def _build_step_preserving_opt(self):
        opt_state = self.opt_state
        self._build_step()
        self.opt_state = opt_state

    # -------------------------------------------------------------- train --

    def fit(self, num_steps: int = 10000, log_every: int = 100,
            logger=None, ckpt_dir: str | None = None, seed: int = 0,
            start_step: int = 0, val_every: int = 500):
        """Train for steps [start_step, num_steps). Every `val_every` steps a
        held-out view is rendered and logged (the reference validates during
        fine-tuning with val_check_interval=500,
        train_mvs_nerf_finetuning_pl.py:319); pass val_every=0 to disable."""
        args = self.args
        from .common import Prefetcher
        it = Prefetcher(RayBatchIterator(
            {"rays": self.train_dataset.all_rays,
             "rgbs": self.train_dataset.all_rgbs},
            args.batch_size, seed=seed))
        key = jax.random.PRNGKey(seed)
        losses = []
        for step_i in range(start_step, num_steps):
            if args.use_density_volume and step_i % 200 == 0:
                self.update_density_volume()
            batch = next(it)
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state,
                jnp.asarray(batch["rays"]), jnp.asarray(batch["rgbs"]),
                jax.random.fold_in(key, step_i))
            # keep the DEVICE scalar: float(loss) here would synchronize
            # every step, paying the remote tunnel's per-RPC latency
            # (100 ms+) 10k times over a full schedule; values are
            # fetched once in a stacked batch at return
            losses.append(loss)
            if logger is not None and step_i % log_every == 0:
                mse = float(loss)
                logger.log_scalars(step_i, {
                    "train/loss": mse,
                    "train/PSNR": -10 * np.log10(max(mse, 1e-10)),
                })
            # offset validation from the 200-step density refresh (the
            # shared cadence at val_every=500 made every other validation
            # step pay refresh + render, aliasing step-time/PSNR curves)
            val_phase = 100 if args.use_density_volume else 0
            if val_every and logger is not None and step_i > start_step \
                    and (step_i - val_phase) % val_every == 0:
                self.validate(step_i, logger)
            if ckpt_dir and (step_i + 1) % 5000 == 0:
                self.save(ckpt_dir, step_i + 1)
        it.close()
        if ckpt_dir:
            self.save(ckpt_dir, num_steps)
        # one stacked fetch instead of one RPC per step
        return (np.asarray(jnp.stack(losses)).tolist() if losses
                else losses)

    def validate(self, step_i: int, logger, chunk: int | None = None):
        """Render one held-out view (cycling through the val split) and log
        val/PSNR + an [gt | pred | depth] panel — the mid-training quality
        signal the reference's validation_step provides."""
        if self.val_dataset is None or len(self.val_dataset) == 0:
            return None
        from ..eval.metrics import psnr
        from ..utils.vis import panel, visualize_depth
        self._val_counter = getattr(self, "_val_counter", -1) + 1
        idx = self._val_counter % len(self.val_dataset)
        sample = self.val_dataset[idx]
        gt = np.asarray(sample["rgbs"])
        h, w = gt.shape[:2]
        out = self.render_image(sample["rays"],
                                chunk=chunk or self.args.chunk * 8,
                                image_hw=(h, w))
        pred = np.clip(np.asarray(out["rgb"]).reshape(h, w, 3), 0, 1)
        val_psnr = float(psnr(pred, gt))
        logger.log_scalars(step_i, {"val/PSNR": val_psnr})
        dvis, _ = visualize_depth(np.asarray(out["depth"]).reshape(h, w))
        logger.save_panel(step_i, f"val_{idx:02d}", panel([gt, pred, dvis]))
        return val_psnr

    # --------------------------------------------------------- rendering ---

    def render_image(self, rays, chunk: int = 8192, image_hw=None):
        """Full-image render from a flat (N, 8) ray buffer.

        With `--render_mode tiled` and a known image shape, the fused
        tiled Pallas kernel renders over the color-baked volume
        (render/tiled.py; ~13x the chunked path on TPU); the exact
        chunked path is the fallback."""
        if image_hw is not None and \
                getattr(self.args, "render_mode", "chunked") == "tiled":
            from ..render.tiled import cached_tiled_renderer
            out = cached_tiled_renderer(
                self, self.params["volume"], self.imgs, self.near_far,
                self.pose_source, density_volume=self.density_volume,
                color_feature=self.color_feature)(rays, *image_hw)
            if out is not None:
                return out
        n = rays.shape[0]
        key = jax.random.PRNGKey(0)

        args = self.args
        params = self.params
        density_volume = self.density_volume

        def chunk_fn(r):
            # validation/eval renders use the exact XLA MLP (training=False)
            out = self._render_fn(params, r, key, density_volume,
                                  training=False)
            return {"rgb": out["rgb"], "depth": out["depth"]}

        return render_image_chunked(chunk_fn, (jnp.asarray(rays),), n,
                                    chunk=chunk)

    # ------------------------------------------------------------- state ---

    def save(self, ckpt_dir: str, step: int):
        state = {"params": self.params, "opt_state": self.opt_state,
                 "global_step": step}
        return save_checkpoint(ckpt_dir, state, step)

    def restore(self, ckpt_path_or_dir: str, strict: bool = False):
        """Load a native snapshot. A `.msgpack` FILE path loads exactly that
        file; a directory loads its newest `ckpt_*` snapshot. Returns the
        restored global step, 0 if nothing was found (raises instead when
        `strict`, so callers like render_video.py never silently render from
        random weights)."""
        if os.path.isfile(ckpt_path_or_dir):
            path = ckpt_path_or_dir
        else:
            latest = latest_checkpoint(ckpt_path_or_dir)
            if latest is None:
                if strict:
                    raise FileNotFoundError(
                        f"no ckpt_*.msgpack snapshot in {ckpt_path_or_dir!r}")
                return 0
            _, path = latest
        state = load_checkpoint(path, {
            "params": self.params, "opt_state": self.opt_state,
            "global_step": 0})
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        return state["global_step"]
