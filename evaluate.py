"""No-finetune evaluation entry point (reference renderer.ipynb cells 4-18).

Example:
    python evaluate.py --dataset_name blender --datadir /data/nerf/lego \
        --ckpt /path/mvsnerf-v0.tar --white_bkgd --pad 24
"""

import json
import os

from mvsnerf_tpu.config import config_parser
from mvsnerf_tpu.data import dataset_dict
from mvsnerf_tpu.eval.evaluate import Evaluator
from mvsnerf_tpu.io import load_reference_checkpoint


def main():
    from mvsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    args = config_parser()
    ck = load_reference_checkpoint(args.ckpt, args.net_type)
    dataset_cls = dataset_dict[args.dataset_name]
    val_ds = dataset_cls(args, "val")

    evaluator = Evaluator(args, val_ds, ck["mvsnet"], ck["mlp"])

    # LPIPS (renderer.ipynb cell 11): wired when converted VGG weights are
    # present; loud error if the user explicitly pointed at a missing file.
    lpips_fn = None
    if os.path.exists(args.lpips_weights):
        from mvsnerf_tpu.eval.metrics import LPIPS
        lpips_fn = LPIPS(args.lpips_weights)
    elif args.lpips_weights != "lpips_vgg.npz":
        raise FileNotFoundError(
            f"--lpips_weights {args.lpips_weights!r} does not exist; "
            "convert with scripts/convert_lpips_weights.py")
    else:
        print("note: lpips_vgg.npz not found - metrics omit LPIPS "
              "(see scripts/convert_lpips_weights.py)")

    save_dir = os.path.join("results", args.expname or "eval")
    out = evaluator.evaluate(save_dir=save_dir, chunk=args.chunk * 5,
                             lpips_fn=lpips_fn)
    print(json.dumps(out["mean"], indent=2))
    with open(os.path.join(save_dir, "metrics.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
