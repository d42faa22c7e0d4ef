"""Generalizable training across scenes (reference train_mvs_nerf_pl.py).

Each step: MVSNet builds the encoding volume from 3 source views, random rays
are drawn in the target view, rendered, and supervised with MSE RGB loss
(+ optional SmoothL1 depth loss). The whole step — cost volume, U-Net, ray
build, render, backward, Adam — is ONE jit-compiled program; the host loop
only feeds numpy batches. Data parallelism shards the ray batch over the
mesh (gradients psum over ICI); the MVSNet forward is replicated (it is the
same images on every chip and costs far less than the 131k-sample MLP+grad).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..io.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from ..io.torch_ckpt import load_reference_checkpoint
from ..models import init_mlp, init_mvsnet, mvsnet_apply
from ..ops.geometry import get_ndc_coordinate, rays_from_pixels, \
    sample_random_pixels
from ..render.renderer import render_rays, render_image_chunked
from ..utils.schedulers import make_lr_schedule
from .common import unpreprocess_images


def smooth_l1(pred, target, beta: float = 1.0):
    """torch SmoothL1Loss (reference train_mvs_nerf_pl.py:22-32)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)


class GeneralizableSystem:
    """Cross-scene training system (BASELINE config 4)."""

    def __init__(self, args, mesh=None):
        self.args = args
        self.mesh = mesh
        if args.ckpt and os.path.exists(args.ckpt):
            ck = load_reference_checkpoint(args.ckpt, args.net_type)
            self.params = {"mlp": ck["mlp"], "mvsnet": ck["mvsnet"]}
            self.start_step = 0  # reference always restarts at 0 (models.py:610)
        else:
            key = jax.random.PRNGKey(0)
            self.params = {
                "mlp": init_mlp(key, args.net_type, D=args.netdepth,
                                W=args.netwidth),
                "mvsnet": init_mvsnet(jax.random.fold_in(key, 1)),
            }
            self.start_step = 0

        # cosine schedule over epochs (train_mvs_nerf_pl.py:84-88); we map
        # it to steps via steps_per_epoch at fit() time.
        self._step_cache = {}
        self.opt_state = None
        self.global_step = 0

    def _make_step(self, img_hw, n_rays, n_samples, steps_total):
        """Build (and cache) the jitted train step for a static image size.

        DP semantics: `n_rays` is the GLOBAL batch (the reference's 1024
        rays/step, train_mvs_nerf_pl.py:117). With a mesh, each shard draws
        n_rays/mesh.size rays with a device-folded key (independent pixel
        draws per shard) and gradients are pmean-ed, so the effective batch
        and the lr schedule are invariant to device count.
        """
        cache_key = (img_hw, n_rays, n_samples)
        if cache_key in self._step_cache:
            return self._step_cache[cache_key]
        args = self.args
        H, W = img_hw
        inv_scale = jnp.asarray([W - 1.0, H - 1.0])

        mesh_size = 1 if self.mesh is None else self.mesh.size
        if n_rays % mesh_size:
            raise ValueError(
                f"global ray batch {n_rays} not divisible by mesh size "
                f"{mesh_size}")
        n_rays = n_rays // mesh_size  # per-shard ray count

        schedule = make_lr_schedule(args.lrate, "cosine",
                                    num_steps=max(steps_total, 1),
                                    eta_min=1e-7)
        optimizer = optax.adam(schedule, b1=0.9, b2=0.999)
        if self.opt_state is None:
            self.opt_state = optimizer.init(self.params)
        self.optimizer = optimizer

        from ..ops.volume_grad import volume_band_width
        from ..models.mvsnet import N_DEPTH_PLANES, resolve_warp_mode
        band_k = volume_band_width(N_DEPTH_PLANES, n_samples)
        warp_mode = resolve_warp_mode(getattr(args, "warp_mode", "auto"))

        def loss_fn(params, batch, key):
            imgs_norm = batch["images"]          # (V, H, W, 3) normalized
            proj_mats = batch["proj_mats"]       # (V, 3, 4)
            near_fars = batch["near_fars"]       # (V, 2)
            w2cs, c2ws = batch["w2cs"], batch["c2ws"]
            intrinsics = batch["intrinsics"]

            volume, _, _ = mvsnet_apply(
                params["mvsnet"], imgs_norm[:3], proj_mats[:3], near_fars[0],
                pad=args.pad, lindisp=args.use_disp, warp_mode=warp_mode,
                costreg_impl=getattr(args, "costreg_impl", "auto"),
                featurenet_impl=getattr(args, "featurenet_impl", "auto"))
            imgs = unpreprocess_images(imgs_norm)

            # rays in the target view (= last view, utils.py:177)
            k_pix, k_z = jax.random.split(key)
            tgt = imgs.shape[0] - 1
            xs, ys = sample_random_pixels(k_pix, H, W, n_rays)
            rays_o, rays_d = rays_from_pixels(xs, ys, intrinsics[tgt],
                                              c2ws[tgt])
            xi, yi = xs.astype(jnp.int32), ys.astype(jnp.int32)
            target_rgb = imgs[tgt, yi, xi]
            target_depth = batch["depths_h"][tgt, yi, xi] \
                if "depths_h" in batch else None

            near, far = near_fars[tgt, 0], near_fars[tgt, 1]
            t = jnp.linspace(0.0, 1.0, n_samples)
            z = near * (1 - t) + far * t
            z_vals = jnp.broadcast_to(z, (n_rays, n_samples))
            mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
            lower = jnp.concatenate([z_vals[..., :1], mids], -1)
            z_vals = lower + (upper - lower) * jax.random.uniform(
                k_z, z_vals.shape)

            rays_o_b = jnp.broadcast_to(rays_o, (n_rays, 3))
            pts = rays_o_b[:, None] + z_vals[..., None] * rays_d[:, None]
            pts_ndc = get_ndc_coordinate(
                w2cs[0], intrinsics[0], pts, inv_scale,
                near=near_fars[0, 0], far=near_fars[0, 1], pad=args.pad)

            out = render_rays(
                params["mlp"], volume, pts, pts_ndc, z_vals, rays_d,
                w2c_ref=w2cs[0], w2cs=w2cs[:3], intrinsics=intrinsics[:3],
                imgs=imgs[:3], net_type=args.net_type,
                white_bkgd=args.white_bkgd, fast_volume_grad=True,
                volume_band_k=band_k,
                volume_gather_impl=getattr(args, "volume_gather_impl",
                                           "auto"),
                color_warp_mode=getattr(args, "color_warp_mode", "auto"),
                # device A/B (docs/status.md round 5): the fused train
                # MLP wins the fine-tune step but LOSES this step
                # (210.5 vs 187.4 ms — its custom VJP cuts the graph
                # XLA otherwise fuses with the conv backward), so
                # 'auto' pins the XLA MLP here; explicit --mlp_impl
                # still overrides.
                mlp_impl=("xla"
                          if getattr(args, "mlp_impl", "auto") == "auto"
                          else args.mlp_impl))

            img_loss = jnp.mean((out["rgb"] - target_rgb) ** 2)
            loss = img_loss
            aux = {"img_mse": img_loss}
            if args.with_depth_loss and target_depth is not None:
                mask = target_depth > 0
                dl = smooth_l1(out["depth"], target_depth) * 0.5  # 2**(1-2)
                depth_loss = jnp.sum(jnp.where(mask, dl, 0.0)) / \
                    jnp.maximum(jnp.sum(mask), 1)
                loss = loss + depth_loss
                aux["depth_loss"] = depth_loss
            return loss, aux

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P
            from ..parallel.mesh import RAY_AXIS

            def sharded_grads(params, batch, key):
                key = jax.random.fold_in(key,
                                         jax.lax.axis_index(RAY_AXIS))
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, key)
                return (jax.lax.pmean(loss, RAY_AXIS),
                        jax.tree.map(lambda a: jax.lax.pmean(a, RAY_AXIS),
                                     aux),
                        jax.tree.map(lambda g: jax.lax.pmean(g, RAY_AXIS),
                                     grads))

            @partial(jax.jit, donate_argnums=(0, 1))
            def step(params, opt_state, batch, key):
                fn = jax.shard_map(
                    sharded_grads, mesh=self.mesh,
                    in_specs=(P(), P(), P()), out_specs=(P(), P(), P()),
                    check_vma=False)
                loss, aux, grads = fn(params, batch, key)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                return optax.apply_updates(params, updates), opt_state, \
                    loss, aux
        else:
            @partial(jax.jit, donate_argnums=(0, 1))
            def step(params, opt_state, batch, key):
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, key)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                return optax.apply_updates(params, updates), opt_state, \
                    loss, aux

        self._step_cache[cache_key] = (step, loss_fn)
        return step, loss_fn

    # -------------------------------------------------------------- train --

    def fit(self, dataset, num_epochs=None, logger=None,
            ckpt_dir: str | None = None, seed: int = 0,
            max_steps: int | None = None, ckpt_every: int = 20000,
            val_fn=None, val_every: int = 0):
        """`val_fn(global_step)` runs every `val_every` steps and at each
        epoch end when given — the reference validates during training via
        the PL per-epoch val loop (train_mvs_nerf_pl.py:172-254)."""
        args = self.args
        num_epochs = num_epochs or args.num_epochs
        n = len(dataset)
        steps_total = max_steps or num_epochs * n
        rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)

        done = False
        for epoch in range(num_epochs):
            order = rng.permutation(n)
            for i in order:
                sample = dataset[int(i)]
                batch = {k: jnp.asarray(v) for k, v in sample.items()
                         if k not in ("scan", "view_ids", "light_id",
                                      "affine_mats")}
                H, W = batch["images"].shape[1:3]
                step, _ = self._make_step((int(H), int(W)), args.batch_size,
                                          args.N_samples, steps_total)
                self.params, self.opt_state, loss, aux = step(
                    self.params, self.opt_state, batch,
                    jax.random.fold_in(key, self.global_step))
                self.global_step += 1
                if logger is not None and self.global_step % 100 == 0:
                    mse = float(aux["img_mse"])
                    scalars = {"train/loss": float(loss),
                               "train/img_mse_loss": mse,
                               "train/PSNR": -10 * np.log10(max(mse, 1e-10))}
                    if "depth_loss" in aux:
                        scalars["train/depth_loss"] = float(aux["depth_loss"])
                    logger.log_scalars(self.global_step, scalars)
                if ckpt_dir and self.global_step % ckpt_every == 0:
                    self.save(ckpt_dir)
                if val_fn is not None and val_every \
                        and self.global_step % val_every == 0:
                    val_fn(self.global_step)
                if max_steps and self.global_step >= max_steps:
                    done = True
                    break
            if val_fn is not None and not done:
                val_fn(self.global_step)      # per-epoch, like the reference
            if done:
                break
        if ckpt_dir:
            self.save(ckpt_dir)

    # ---------------------------------------------------------- validate ---

    def render_view(self, sample, chunk: int = 8192, n_samples=None):
        """Full-image render of the sample's target view from its 3 source
        views (the validation path, train_mvs_nerf_pl.py:172-254)."""
        args = self.args
        n_samples = n_samples or args.N_samples
        imgs_norm = jnp.asarray(sample["images"])
        proj_mats = jnp.asarray(sample["proj_mats"])
        near_fars = jnp.asarray(sample["near_fars"])
        w2cs = jnp.asarray(sample["w2cs"])
        c2ws = jnp.asarray(sample["c2ws"])
        intrinsics = jnp.asarray(sample["intrinsics"])
        V, H, W, _ = imgs_norm.shape

        volume = jax.jit(
            lambda p, im: mvsnet_apply(
                p, im, proj_mats[:3], near_fars[0], pad=args.pad,
                costreg_impl=getattr(args, "costreg_impl", "auto"),
                featurenet_impl=getattr(args, "featurenet_impl",
                                        "auto"))[0]
        )(self.params["mvsnet"], imgs_norm[:3])
        imgs = unpreprocess_images(imgs_norm)

        from ..ops.geometry import full_image_pixels
        xs, ys = full_image_pixels(H, W)
        tgt = V - 1
        rays_o, rays_d = rays_from_pixels(jnp.asarray(xs), jnp.asarray(ys),
                                          intrinsics[tgt], c2ws[tgt])
        rays_o = jnp.broadcast_to(rays_o, rays_d.shape)
        inv_scale = jnp.asarray([W - 1.0, H - 1.0])
        near, far = near_fars[tgt, 0], near_fars[tgt, 1]
        t = jnp.linspace(0.0, 1.0, n_samples)
        z_row = near * (1 - t) + far * t

        params = self.params

        def chunk_fn(ro, rd):
            nr = ro.shape[0]
            z_vals = jnp.broadcast_to(z_row, (nr, n_samples))
            pts = ro[:, None] + z_vals[..., None] * rd[:, None]
            pts_ndc = get_ndc_coordinate(
                w2cs[0], intrinsics[0], pts, inv_scale,
                near=near_fars[0, 0], far=near_fars[0, 1], pad=args.pad)
            out = render_rays(
                params["mlp"], volume, pts, pts_ndc, z_vals, rd,
                w2c_ref=w2cs[0], w2cs=w2cs[:3], intrinsics=intrinsics[:3],
                imgs=imgs[:3], net_type=args.net_type,
                white_bkgd=args.white_bkgd)
            return {"rgb": out["rgb"], "depth": out["depth"]}

        out = render_image_chunked(jax.jit(chunk_fn), (rays_o, rays_d),
                                   H * W, chunk=chunk)
        return {"rgb": np.asarray(out["rgb"]).reshape(H, W, 3),
                "depth": np.asarray(out["depth"]).reshape(H, W),
                "target": np.asarray(imgs[tgt])}

    # ------------------------------------------------------------- state ---

    def save(self, ckpt_dir: str):
        state = {"params": self.params, "opt_state": self.opt_state,
                 "global_step": self.global_step}
        return save_checkpoint(ckpt_dir, state, self.global_step)

    def restore(self, ckpt_path_or_dir: str, strict: bool = False) -> int:
        """Load a native snapshot: an exact `.msgpack` file, or the newest
        `ckpt_*` snapshot of a directory (0 / FileNotFoundError when none)."""
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
        if self.opt_state is None:
            # materialize the optimizer-state STRUCTURE before
            # deserializing: a None target makes flax return raw string-
            # keyed dicts and the first resumed step dies inside optax
            # (caught by the round-5 dress rehearsal's kill+resume phase).
            # The structure depends only on params and on adam-with-
            # schedule (ScaleByScheduleState), not on num_steps.
            schedule = make_lr_schedule(self.args.lrate, "cosine",
                                        num_steps=1, eta_min=1e-7)
            self.opt_state = optax.adam(schedule, b1=0.9,
                                        b2=0.999).init(self.params)
        state = load_checkpoint(path, {"params": self.params,
                                       "opt_state": self.opt_state,
                                       "global_step": 0})
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.global_step = state["global_step"]
        return self.global_step
