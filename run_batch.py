"""Batch driver for fine-tune + eval sweeps over scene lists (reference
run_batch.py): shells out one process per scene so device state is clean
between scenes."""

import os
import subprocess
import sys

BLENDER_SCENES = ["ship", "mic", "chair", "lego", "drums", "ficus",
                  "materials", "hotdog"]
LLFF_SCENES = ["fern", "flower", "fortress", "horns", "leaves", "orchids",
               "room", "trex"]


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "blender"
    data_root = sys.argv[2] if len(sys.argv) > 2 else "./data/nerf_synthetic"
    ckpt = sys.argv[3] if len(sys.argv) > 3 else "./ckpts/mvsnerf-v0.tar"
    scenes = BLENDER_SCENES if dataset == "blender" else LLFF_SCENES

    for scene in scenes:
        datadir = os.path.join(data_root, scene)
        run([sys.executable, "train_mvs_nerf_finetuning.py",
             "--dataset_name", dataset, "--datadir", datadir,
             "--expname", f"{scene}-ft", "--ckpt", ckpt,
             "--batch_size", "1024", "--pad", "24", "--with_rgb_loss",
             "--imgScale_test", "1.0"]
            + (["--white_bkgd"] if dataset == "blender" else []))
        run([sys.executable, "evaluate.py",
             "--dataset_name", dataset, "--datadir", datadir,
             "--expname", f"{scene}-eval", "--ckpt", ckpt, "--pad", "24"]
            + (["--white_bkgd"] if dataset == "blender" else []))


if __name__ == "__main__":
    main()
