"""No-finetune evaluation entry point (reference renderer.ipynb cells 4-18).

By default the 3 source views are re-selected per validation image as the
nearest training views by camera center and the encoding volume is rebuilt
per image — the notebook protocol (renderer.ipynb cell 11; utils.py:698-711).
`--fixed_sources` keeps the scene's default 3 source views for every image.

Example:
    python evaluate.py --dataset_name blender --datadir /data/nerf/lego \
        --ckpt /path/mvsnerf-v0.tar --white_bkgd --pad 24
"""

import json
import logging
import os

import numpy as np

from mvsnerf_tpu.config import config_parser
from mvsnerf_tpu.data import dataset_dict
from mvsnerf_tpu.eval.evaluate import Evaluator
from mvsnerf_tpu.io import load_reference_checkpoint


def train_split_info(ds, args):
    """(train_indices, train_c2ws, val_c2ws) for the per-image nearest-3
    source protocol, in the dataset's absolute view indexing. Returns
    (None, None, None) when the scene has no registered pair split (the
    eval then falls back to fixed sources, like the reference does for
    scenes absent from pairs.th)."""
    from mvsnerf_tpu.data.pairs import get_split

    poses_all = np.asarray(ds.load_poses_all())
    if hasattr(ds, "pair_idx"):                 # dtu_ft: splits preloaded
        train_idx = np.asarray(ds.pair_idx[0])
    else:
        name = os.path.basename(args.datadir.rstrip("/"))
        try:
            train_idx = np.asarray(get_split(name, "train"))
        except KeyError:
            return None, None, None
    val_idx = np.asarray(ds.img_idx)
    return train_idx, poses_all[train_idx], poses_all[val_idx]


def main():
    from mvsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, format="%(name)s: %(message)s")
    args = config_parser()
    ck = load_reference_checkpoint(args.ckpt, args.net_type)
    dataset_cls = dataset_dict[args.dataset_name]
    val_ds = dataset_cls(args, "val")

    evaluator = Evaluator(args, val_ds, ck["mvsnet"], ck["mlp"])

    # per-image nearest-3 source re-selection (renderer.ipynb cell 11)
    # unless --fixed_sources or the scene has no pair split
    per_image, train_c2ws, train_idx, val_c2ws = False, None, None, None
    if not args.fixed_sources:
        train_idx, train_c2ws, val_c2ws = train_split_info(val_ds, args)
        if train_idx is None:
            print("note: no pair split for this scene - evaluating from "
                  "fixed sources")
        else:
            per_image = True

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
                             lpips_fn=lpips_fn,
                             per_image_sources=per_image,
                             train_c2ws=train_c2ws, train_indices=train_idx,
                             val_c2ws=val_c2ws)
    print(json.dumps(out["mean"], indent=2))
    with open(os.path.join(save_dir, "metrics.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
