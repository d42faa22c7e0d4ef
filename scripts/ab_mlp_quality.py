"""Training-quality A/B of the fused MLP kernel on device: run the SAME
fine-tune schedule (N steps from the reference checkpoint on the
synthesized scene) with --mlp_impl xla vs pallas vs pallas_high and
compare loss trajectories + a final held-out render PSNR. The kernel's
bf16 1-pass dots change training numerics; this measures whether the
LEARNING outcome differs (the volume/MLP adapt to the operator).

Run: python scripts/ab_mlp_quality.py [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 400

from mvsnerf_tpu.config import config_parser  # noqa: E402
from mvsnerf_tpu.data import dataset_dict  # noqa: E402
from mvsnerf_tpu.eval.metrics import psnr  # noqa: E402
from mvsnerf_tpu.train import FinetuneSystem  # noqa: E402

if not os.path.isdir("/tmp/dtu_synth/scan1"):
    os.system(f"{sys.executable} scripts/make_synthetic_scene.py /tmp/dtu_synth")

for impl in ("xla", "pallas", "pallas_high"):
    args = config_parser([
        "--dataset_name", "dtu_ft", "--datadir", "/tmp/dtu_synth/scan1",
        "--expname", f"abq_{impl}", "--max_steps", str(STEPS),
        "--with_rgb_loss", "--imgScale_train", "0.5",
        "--imgScale_test", "0.5", "--pad", "24",
        "--ckpt", "/root/reference/ckpts/mvsnerf-v0.tar",
        "--mlp_impl", impl,
    ])
    ds = dataset_dict[args.dataset_name]
    train_ds = ds(args, "train")
    val_ds = ds(args, "val")
    system = FinetuneSystem(args, train_ds, val_ds)
    losses = np.asarray(system.fit(num_steps=STEPS, logger=None,
                                   ckpt_dir=None, val_every=0))

    sample = val_ds[0]
    gt = np.asarray(sample["rgbs"])
    h, w = gt.shape[:2]
    out = system.render_image(sample["rays"], chunk=args.chunk * 4,
                              image_hw=(h, w))
    pred = np.clip(np.asarray(out["rgb"]).reshape(h, w, 3), 0, 1)
    p = float(psnr(pred, gt))
    k = max(1, STEPS // 10)
    print(f"{impl:12s} loss[0:{k}] {losses[:k].mean():.5f} -> "
          f"loss[-{k}:] {losses[-k:].mean():.5f}   val PSNR {p:.4f}",
          flush=True)
