"""Free-viewpoint video entry point (reference renderer_video.ipynb).

Example:
    python render_video.py --dataset_name blender --datadir /data/nerf/lego \
        --ckpt runs_fine_tuning/lego/ckpts/ckpt_000010000.msgpack \
        --expname lego-video
"""

import os

import numpy as np

from mvsnerf_tpu.config import config_parser
from mvsnerf_tpu.data import dataset_dict
from mvsnerf_tpu.eval.video import make_path, render_video
from mvsnerf_tpu.train import FinetuneSystem


def main():
    from mvsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    args = config_parser()
    dataset_cls = dataset_dict[args.dataset_name]
    train_ds = dataset_cls(args, "train")

    system = FinetuneSystem(args, train_ds)
    if args.ckpt and args.ckpt.endswith(".msgpack"):
        # load EXACTLY the named snapshot; error loudly rather than silently
        # rendering from random weights (FinetuneSystem.__init__ skips
        # .msgpack checkpoints on purpose)
        step = system.restore(args.ckpt, strict=True)
        print(f"restored {args.ckpt} (step {step})")

    kind = {"blender": "nerf", "llff": "spheric", "dtu_ft": "interp"}.get(
        args.dataset_name, "interp")
    poses = make_path(kind, dataset=train_ds, n_frames=60)

    w, h = train_ds.img_wh
    focal = train_ds.focal if hasattr(train_ds, "focal") else None
    near_far = getattr(train_ds, "near_far", [2.0, 6.0])
    out = os.path.join("results", f"{args.expname or 'video'}.mp4")
    from mvsnerf_tpu.eval import video as video_mod
    render_video(system, poses, h, w, focal, near_far, out, fps=20,
                 chunk=args.chunk * 8, with_depth_panel=True)
    print("wrote", video_mod.render_video.last_path or out)


if __name__ == "__main__":
    main()
