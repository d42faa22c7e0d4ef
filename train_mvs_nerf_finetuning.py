"""Per-scene fine-tuning entry point (reference
train_mvs_nerf_finetuning_pl.py).

Example:
    python train_mvs_nerf_finetuning.py --dataset_name llff \
        --datadir /data/nerf_llff_data/horns --expname horns-ft \
        --ckpt /path/mvsnerf-v0.tar --batch_size 1024 --pad 24 \
        --with_rgb_loss
"""

import os

from mvsnerf_tpu.config import config_parser
from mvsnerf_tpu.data import dataset_dict
from mvsnerf_tpu.train import FinetuneSystem
from mvsnerf_tpu.utils import MetricLogger


def main():
    from mvsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    args = config_parser()
    log_dir = os.path.join("runs_fine_tuning", args.expname or "exp")
    logger = MetricLogger(log_dir)

    dataset_cls = dataset_dict[args.dataset_name]
    train_ds = dataset_cls(args, "train")
    val_ds = dataset_cls(args, "val")

    system = FinetuneSystem(args, train_ds, val_ds)
    ckpt_dir = os.path.join(log_dir, "ckpts")
    n_steps = args.max_steps or 10000
    # resume-by-default from this experiment's own snapshots (native ckpts
    # include optimizer state; the reference restarts at step 0 instead)
    start = system.restore(ckpt_dir)
    if start:
        print(f"resumed from {ckpt_dir} at step {start}")
    if start >= n_steps:
        print(f"checkpoint already at step {start} >= {n_steps}; "
              "skipping training")
    system.fit(num_steps=n_steps, logger=logger, ckpt_dir=ckpt_dir,
               start_step=start)

    # validate on held-out views
    import numpy as np
    from mvsnerf_tpu.eval.metrics import psnr, ssim
    from mvsnerf_tpu.utils.vis import panel, visualize_depth
    for i in range(len(val_ds)):
        sample = val_ds[i]
        gt = np.asarray(sample["rgbs"])
        h, w = gt.shape[:2]
        out = system.render_image(sample["rays"], chunk=args.chunk * 8)
        pred = np.clip(np.asarray(out["rgb"]).reshape(h, w, 3), 0, 1)
        logger.log_scalars(n_steps + i, {
            "val/PSNR": float(psnr(pred, gt)),
            "val/SSIM": float(ssim(pred, gt)),
        })
        dvis, _ = visualize_depth(np.asarray(out["depth"]).reshape(h, w))
        logger.save_panel(n_steps, f"val_{i:02d}", panel([gt, pred, dvis]))
    logger.flush()


if __name__ == "__main__":
    main()
