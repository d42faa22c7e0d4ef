"""Fusion fine-tuning entry point (reference
train_mvs_nerf_fusion_finetuning_pl.py): fuse per-view local encoding
volumes into a canonical 128³ grid, then fine-tune it for free-viewpoint
video.
"""

import os

from mvsnerf_tpu.config import config_parser
from mvsnerf_tpu.data import dataset_dict
from mvsnerf_tpu.train import FusionFinetuneSystem
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

    system = FusionFinetuneSystem(args, train_ds, val_ds)
    ckpt_dir = os.path.join(log_dir, "ckpts")
    start = system.restore(ckpt_dir)
    if start:
        print(f"resumed from {ckpt_dir} at step {start}")
    system.fit(num_steps=args.max_steps or 10000, logger=logger,
               ckpt_dir=ckpt_dir, start_step=start)
    logger.flush()


if __name__ == "__main__":
    main()
