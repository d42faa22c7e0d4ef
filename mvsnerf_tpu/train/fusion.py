"""Multi-volume fusion fine-tuning (reference
train_mvs_nerf_fusion_finetuning_pl.py): build a local encoding volume per
training view, render all its rays at 1/4 resolution, splat per-sample
(feature, alpha, weight) into a canonical 128³ voxel grid, and fine-tune the
fused grid directly (use_color_volume semantics; NDC = bbox normalization).

Deviations from the reference, on purpose:
  * `update_volume` (reference :35-76) computes the trilinear splat weight as
    |local - corner| (inverted — zero AT the corner) and swaps the x/z
    components of the corner shift when indexing. This implementation uses
    the standard trilinear weights prod(1 - |local - corner|) with aligned
    axes, expressed as one jnp scatter-add instead of 8 indexed in-place adds
    (sorted-scatter maps to XLA:TPU cleanly; this is an offline step).
  * The reference's density grid is evaluated at [-1, 1] coords while
    training feeds the MLP [0, 1] bbox-NDC (fusion :113-114 vs :263); here
    the density volume is evaluated at the same [0, 1] coords training uses.
  * The reference's training step passes N_importance/density_volume kwargs
    that its own ray_marcher does not accept (fusion :259-260 would raise at
    runtime); here importance sampling goes through ray_marcher_fine as the
    non-fusion fine-tuning does.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..io.checkpoint import save_checkpoint
from ..io.torch_ckpt import load_reference_checkpoint
from ..models import init_mlp, init_mvsnet, mvsnet_apply
from ..models.mvsnet import resolve_warp_mode
from ..ops.geometry import get_ndc_coordinate
from ..ops.sampling import ray_marcher, ray_marcher_fine
from ..render.renderer import (render_density, render_image_chunked,
                               render_rays, resolve_mlp_impl)
from ..utils.schedulers import make_lr_schedule
from .common import RayBatchIterator, unpreprocess_images
from ..data.dtu_ft import rays_for_pose


def splat_trilinear(volume, weights, pts_ndc, feats):
    """Scatter-add per-sample features into a voxel grid with trilinear
    weights.

    Args:
        volume:  (D, H, W, C) accumulator.
        weights: (D, H, W, 1) weight accumulator.
        pts_ndc: (N, 3) sample coords in [0, 1], ordered (x, y, z).
        feats:   (N, C) per-sample weighted features (already multiplied by
                 any per-sample scalar weight).

    Returns:
        (volume, weights) updated.
    """
    D, H, W, C = volume.shape
    dims = jnp.asarray([W - 1, H - 1, D - 1], jnp.float32)
    vox = pts_ndc * dims
    base = jnp.floor(vox)
    frac = vox - base
    base = base.astype(jnp.int32)

    in_bounds = jnp.all((base >= 0) & (base < jnp.asarray([W - 1, H - 1,
                                                           D - 1])), axis=-1)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = ((frac[:, 0] if dx else 1 - frac[:, 0])
                     * (frac[:, 1] if dy else 1 - frac[:, 1])
                     * (frac[:, 2] if dz else 1 - frac[:, 2]))
                w = jnp.where(in_bounds, w, 0.0)
                xi = jnp.clip(base[:, 0] + dx, 0, W - 1)
                yi = jnp.clip(base[:, 1] + dy, 0, H - 1)
                zi = jnp.clip(base[:, 2] + dz, 0, D - 1)
                volume = volume.at[zi, yi, xi].add(w[:, None] * feats)
                weights = weights.at[zi, yi, xi].add(w[:, None])
    return volume, weights


class FusionFinetuneSystem:
    """Fusion fine-tuning system (BASELINE config 5)."""

    VOLUME_DIM = (128, 128, 128)  # reference fusion :101

    def __init__(self, args, dataset_train, dataset_val=None):
        self.args = args
        self.train_dataset = dataset_train
        self.val_dataset = dataset_val
        args_ckpt = args.ckpt if args.ckpt and os.path.exists(args.ckpt) \
            else None
        if args_ckpt:
            ck = load_reference_checkpoint(args_ckpt, args.net_type)
            self.mlp, self.mvsnet = ck["mlp"], ck["mvsnet"]
        else:
            key = jax.random.PRNGKey(0)
            self.mlp = init_mlp(key, args.net_type)
            self.mvsnet = init_mvsnet(jax.random.fold_in(key, 1))

        self.near_far = np.asarray(dataset_train.near_far, np.float32)
        self.bbox_3d = jnp.asarray(dataset_train.bbox_3d)
        self.fuse_local_volumes()
        self._build_step()

    # ------------------------------------------------------------ fusion ---

    def _local_render_chunk(self, volume, pose_source, imgs, near_far):
        """Chunked 1/4-res render of one local volume, returning per-sample
        features/alpha/weights plus world points (fusion :156-177)."""
        args = self.args
        w2c_ref = pose_source["w2cs"][0]
        intrinsic_ref = pose_source["intrinsics"][0] * \
            jnp.asarray([[0.25], [0.25], [1.0]])

        def chunk_fn(rays):
            key = jax.random.PRNGKey(0)
            pts, rays_o, rays_d, z_vals = ray_marcher(key, rays, 128,
                                                      perturb=0.0)
            h4 = imgs.shape[1] // 4
            w4 = imgs.shape[2] // 4
            inv_scale = jnp.asarray([w4 - 1.0, h4 - 1.0])
            pts_ndc = get_ndc_coordinate(
                w2c_ref, intrinsic_ref, pts, inv_scale,
                near=near_far[0], far=near_far[1], pad=args.pad * 0.25)
            out = render_rays(
                self.mlp, volume, pts, pts_ndc, z_vals, rays_d,
                w2c_ref=w2c_ref, w2cs=pose_source["w2cs"],
                intrinsics=pose_source["intrinsics"], imgs=imgs,
                net_type=args.net_type)
            return {"feats": out["feats"], "alpha": out["alpha"],
                    "weights": out["weights"], "pts": pts}

        return jax.jit(chunk_fn)

    def fuse_local_volumes(self, chunk: int = 4096):
        """Build the canonical fused volume (reference fusion :117-203)."""
        args = self.args
        ds = self.train_dataset
        feat_dim = 8 + 12
        D, H, W = self.VOLUME_DIM

        volume = jnp.zeros((D, H, W, feat_dim))
        sigma = jnp.zeros((D, H, W, 1))
        weights = jnp.zeros((D, H, W, 1))

        pairs = np.asarray(ds.pair_idx[0])
        c2ws_all = ds.load_poses_all()
        c2w_render = c2ws_all[pairs]
        w_img, h_img = ds.img_wh
        h4, w4 = h_img // 4, w_img // 4
        focal4 = [f / 4.0 for f in ds.focal]

        self.pose_source_ref = None
        for i, c2w in enumerate(c2w_render):
            positions = c2w_render[:, :3, 3]
            dis = np.sum(np.abs(positions - c2w[:3, 3:].T), axis=-1)
            pair_idx = pairs[np.argsort(dis)[:3]]
            imgs_np, proj_mats, near_far, pose_source = \
                ds.read_source_views(pair_idx=pair_idx)
            imgs_norm = jnp.asarray(imgs_np)
            pose_source = {k: jnp.asarray(v) for k, v in pose_source.items()}
            local_volume = jax.jit(
                lambda p, im, pm: mvsnet_apply(
                    p, im, pm, jnp.asarray(near_far, jnp.float32),
                    pad=args.pad,
                    warp_mode=resolve_warp_mode(
                        getattr(args, "warp_mode", "auto")),
                    costreg_impl=getattr(args, "costreg_impl", "auto"),
                    featurenet_impl=getattr(args, "featurenet_impl",
                                            "auto"))[0]
            )(self.mvsnet, imgs_norm, jnp.asarray(proj_mats))
            imgs = unpreprocess_images(imgs_norm)
            if i == 0:
                self.pose_source_ref = pose_source
                self.imgs_ref = imgs

            rays = rays_for_pose(h4, w4, focal4, [w4 / 2, h4 / 2], c2w,
                                 near_far[0], near_far[1])
            chunk_fn = self._local_render_chunk(local_volume, pose_source,
                                                imgs,
                                                np.asarray(near_far))
            n = rays.shape[0]
            out = render_image_chunked(chunk_fn, (jnp.asarray(rays),), n,
                                       chunk=chunk)
            pts = out["pts"].reshape(-1, 3)
            pts_ndc = (pts - self.bbox_3d[0]) / (self.bbox_3d[1] -
                                                 self.bbox_3d[0])
            w = out["weights"].reshape(-1, 1)
            feats = out["feats"].reshape(-1, feat_dim) * w
            alph = out["alpha"].reshape(-1, 1) * w

            volume, _ = splat_trilinear(volume, jnp.zeros_like(weights),
                                        pts_ndc, feats)
            sigma, weights = splat_trilinear(sigma, weights, pts_ndc, alph)

        inv_w = 1.0 / (weights + 1e-6)
        self.volume = volume * inv_w
        self.density_volume = sigma * inv_w
        self.params = {"mlp": self.mlp, "volume": self.volume}

    # ------------------------------------------------------------- train ---

    def _build_step(self):
        args = self.args
        n_samples = args.N_samples
        bbox = self.bbox_3d

        schedule = make_lr_schedule(args.lrate, args.lr_scheduler,
                                    args.decay_step, args.decay_gamma)
        self.optimizer = optax.adam(schedule)
        if not hasattr(self, "opt_state") or self.opt_state is None:
            self.opt_state = self.optimizer.init(self.params)

        pose_ref = self.pose_source_ref
        from ..ops.volume_grad import volume_band_width
        band_k = volume_band_width(self.params["volume"].shape[0],
                                   n_samples, args.N_importance)

        def render_fn(params, rays, key, density_volume):
            pts, rays_o, rays_d, z_vals = ray_marcher(
                key, rays, n_samples, perturb=args.perturb,
                lindisp=args.use_disp, bbox_3d=bbox)
            pts_ndc = (pts - bbox[0]) / (bbox[1] - bbox[0])
            if density_volume is not None and args.N_importance > 0:
                pts, rays_o, rays_d, z_vals = ray_marcher_fine(
                    jax.random.fold_in(key, 1), rays, density_volume,
                    z_vals, pts_ndc, args.N_importance)
                pts_ndc = (pts - bbox[0]) / (bbox[1] - bbox[0])
            return render_rays(
                params["mlp"], params["volume"], pts, pts_ndc, z_vals,
                rays_d, w2c_ref=pose_ref["w2cs"][0],
                net_type=args.net_type, use_color_volume=True,
                white_bkgd=args.white_bkgd, fast_volume_grad=True,
                volume_band_k=band_k,
                volume_gather_impl=getattr(args, "volume_gather_impl",
                                           "auto"),
                color_warp_mode=getattr(args, "color_warp_mode", "auto"),
                # training=True: the fused v0 train kernel where it
                # applies (run_network falls back to xla for non-v0
                # nets / unfit shapes); quality parity recorded in
                # docs/status.md round 5
                mlp_impl=resolve_mlp_impl(
                    getattr(args, "mlp_impl", "auto"), training=True))

        def loss_fn(params, rays, rgbs, key, density_volume):
            out = render_fn(params, rays, key, density_volume)
            return jnp.mean((out["rgb"] - rgbs) ** 2)

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, rays, rgbs, key, density_volume):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, rays, rgbs, key, density_volume)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step
        self._render_fn = render_fn

    def update_density_volume(self):
        """Refresh density from the fused volume (fusion :205-213), at the
        same [0, 1] coords the training render uses."""
        d, hp, wp, c = self.params["volume"].shape
        xs = jnp.linspace(0, 1, wp)
        ys = jnp.linspace(0, 1, hp)
        zs = jnp.linspace(0, 1, d)
        gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        pts = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
        feats = self.params["volume"].reshape(-1, c)
        sigma = render_density(self.params["mlp"], pts, feats,
                               net_type=self.args.net_type)
        self.density_volume = sigma.reshape(d, hp, wp, 1)

    def fit(self, num_steps: int = 10000, logger=None,
            ckpt_dir: str | None = None, seed: int = 0,
            start_step: int = 0, ckpt_every: int = 5000,
            val_every: int = 500):
        """Train with periodic snapshots every `ckpt_every` steps (the
        reference checkpoints during training,
        train_mvs_nerf_finetuning_pl.py:279-291) and a held-out render every
        `val_every` steps when a val dataset and logger are present."""
        args = self.args
        from .common import Prefetcher
        it = Prefetcher(RayBatchIterator(
            {"rays": self.train_dataset.all_rays,
             "rgbs": self.train_dataset.all_rgbs},
            args.batch_size, seed=seed))
        key = jax.random.PRNGKey(seed)
        losses = []
        for step_i in range(start_step, num_steps):
            if args.N_importance and step_i % 500 == 0:
                self.update_density_volume()
            batch = next(it)
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, jnp.asarray(batch["rays"]),
                jnp.asarray(batch["rgbs"]),
                jax.random.fold_in(key, step_i),
                self.density_volume if args.N_importance else None)
            # device scalar: float(loss) per step would pay the remote
            # tunnel's per-RPC latency every step (see finetune.fit)
            losses.append(loss)
            if logger is not None and step_i % 100 == 0:
                mse = float(loss)
                logger.log_scalars(step_i, {
                    "train/loss": mse,
                    "train/PSNR": -10 * np.log10(max(mse, 1e-10))})
            # offset from the 500-step density refresh (cadence aliasing)
            val_phase = 100 if args.N_importance else 0
            if val_every and logger is not None and step_i > start_step \
                    and (step_i - val_phase) % val_every == 0:
                self.validate(step_i, logger)
            if ckpt_dir and (step_i + 1) % ckpt_every == 0:
                self.save(ckpt_dir, step_i + 1)
        it.close()
        if ckpt_dir:
            self.save(ckpt_dir, num_steps)
        # one stacked fetch instead of one RPC per step
        return (np.asarray(jnp.stack(losses)).tolist() if losses
                else losses)

    def validate(self, step_i: int, logger, chunk: int | None = None):
        """Render one held-out view (cycling) and log val/PSNR + a panel."""
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

    def save(self, ckpt_dir: str, step: int):
        return save_checkpoint(ckpt_dir, {"params": self.params,
                                          "opt_state": self.opt_state,
                                          "global_step": step}, step)

    def restore(self, ckpt_path_or_dir: str, strict: bool = False) -> int:
        """Load a native snapshot (exact .msgpack file or newest in a dir)."""
        from ..io.checkpoint import latest_checkpoint, load_checkpoint
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
        state = load_checkpoint(path, {"params": self.params,
                                       "opt_state": self.opt_state,
                                       "global_step": 0})
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        return state["global_step"]

    def render_image(self, rays, chunk: int = 8192, image_hw=None):
        density = self.density_volume if self.args.N_importance else None
        if image_hw is not None and \
                getattr(self.args, "render_mode", "chunked") == "tiled":
            from ..render.tiled import cached_tiled_renderer
            out = cached_tiled_renderer(
                self, self.params["volume"], None, None,
                self.pose_source_ref, density_volume=density,
                bbox=self.train_dataset.bbox_3d)(rays, *image_hw)
            if out is not None:
                return out
        params = self.params
        key = jax.random.PRNGKey(0)

        def chunk_fn(r):
            out = self._render_fn(params, r, key, density)
            return {"rgb": out["rgb"], "depth": out["depth"]}

        return render_image_chunked(chunk_fn, (jnp.asarray(rays),),
                                    rays.shape[0], chunk=chunk)
