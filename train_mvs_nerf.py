"""Generalizable training entry point (reference train_mvs_nerf_pl.py).

Example:
    python train_mvs_nerf.py --expname dtu_gen --dataset_name dtu \
        --datadir /data/dtu --num_epochs 6 --batch_size 1024 --N_samples 128 \
        --with_depth --with_depth_loss --pad 24
"""

import os

from mvsnerf_tpu.config import config_parser
from mvsnerf_tpu.data import dataset_dict
from mvsnerf_tpu.train import GeneralizableSystem
from mvsnerf_tpu.utils import MetricLogger


def main():
    from mvsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    args = config_parser()
    log_dir = os.path.join("runs_new", args.expname or "exp")
    logger = MetricLogger(log_dir)

    dataset_cls = dataset_dict[args.dataset_name]
    extra = {}
    if args.scan_list and args.dataset_name == "dtu":
        with open(args.scan_list) as f:
            extra["scan_list"] = [ln.strip() for ln in f if ln.strip()]
    train_ds = dataset_cls(args.datadir, "train",
                           downSample=args.imgScale_train, **extra)
    val_ds = dataset_cls(args.datadir, "val", downSample=args.imgScale_test,
                         max_len=10, **extra)

    mesh = None
    if args.num_devices != 1:
        import jax
        from mvsnerf_tpu.parallel import make_mesh
        devices = jax.devices()
        if args.num_devices > 0:
            devices = devices[: args.num_devices]
        if len(devices) > 1:
            mesh = make_mesh(devices)

    system = GeneralizableSystem(args, mesh=mesh)
    ckpt_dir = os.path.join(log_dir, "ckpts")
    system.restore(ckpt_dir)  # resume-by-default

    # validation pass (PSNR + panels) — runs per epoch during training
    # (the reference's PL val loop, train_mvs_nerf_pl.py:172-254) and once
    # after the final step
    from mvsnerf_tpu.eval.metrics import psnr
    import numpy as np

    def validate(step):
        vals = []
        for i in range(min(len(val_ds), args.N_vis)):
            sample = val_ds[i]
            out = system.render_view(sample, chunk=args.chunk * 8)
            p = float(psnr(np.clip(out["rgb"], 0, 1), out["target"]))
            vals.append(p)
            from mvsnerf_tpu.utils.vis import panel, visualize_depth
            dvis, _ = visualize_depth(out["depth"])
            logger.save_panel(step, f"val_{i:02d}",
                              panel([out["target"],
                                     np.clip(out["rgb"], 0, 1), dvis]))
        if vals:
            logger.log_scalars(step, {"val/PSNR": float(np.mean(vals))})

    system.fit(train_ds, num_epochs=args.num_epochs, logger=logger,
               ckpt_dir=ckpt_dir, max_steps=args.max_steps or None,
               ckpt_every=args.ckpt_every, val_fn=validate,
               val_every=args.val_every)
    validate(system.global_step)
    logger.flush()


if __name__ == "__main__":
    main()
