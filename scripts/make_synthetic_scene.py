"""Synthesize a tiny DTU-format scene tree (cameras, images, GT depths) so
the CLIs can be exercised without the real datasets.

    python scripts/make_synthetic_scene.py /tmp/dtu_synth
    python train_mvs_nerf_finetuning.py --dataset_name dtu_ft \
        --datadir /tmp/dtu_synth/scan1 --expname smoke --max_steps 50 \
        --with_rgb_loss --imgScale_train 0.1 --imgScale_test 0.1 --pad 4
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mvsnerf_tpu.data.common import write_cam_file, write_pfm  # noqa: E402


def make_scene(root, n_views=49, scan="scan1", img_hw=(192, 240),
               seed=None):
    """49 views so the packaged DTU pair tables index validly. Source
    images can be any size (loaders resize); GT depths must be 1200x1600
    for the reference's fixed crop. `seed` defaults to a hash of the scan
    name so multi-scan trees get distinct textures."""
    from PIL import Image

    if seed is None:
        seed = sum(ord(c) for c in scan)
    rng = np.random.default_rng(seed)
    os.makedirs(f"{root}/Cameras/train", exist_ok=True)
    os.makedirs(f"{root}/Rectified/{scan}_train", exist_ok=True)
    os.makedirs(f"{root}/Depths/{scan}", exist_ok=True)

    # a textured plane at depth ~700mm viewed by an arc of cameras
    h, w = img_hw
    tex = rng.uniform(0.1, 0.9, (32, 32, 3))
    base = np.tile(tex, (h // 32 + 1, w // 32 + 1, 1))[:h, :w]
    for vid in range(n_views):
        a = 0.02 * (vid - n_views / 2)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]])
        ext = np.eye(4)
        ext[:3, :3] = R
        ext[:3, 3] = [8.0 * (vid - n_views / 2), 0, 600]
        intr = np.array([[180.0, 0, 80], [0, 180.0, 64], [0, 0, 1]])
        write_cam_file(f"{root}/Cameras/train/{vid:08d}_cam.txt", intr, ext,
                       425.0, 2.5)
        img = np.roll(base, vid * 3, axis=1)
        for light in range(7):
            arr = np.clip(img * (0.7 + 0.05 * light), 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                f"{root}/Rectified/{scan}_train/"
                f"rect_{vid + 1:03d}_{light}_r5000.png")
        depth = np.full((1200, 1600), 700.0, np.float32) + \
            rng.uniform(-20, 20, (1200, 1600)).astype(np.float32)
        write_pfm(f"{root}/Depths/{scan}/depth_map_{vid:04d}.pfm", depth)
    print(f"wrote synthetic DTU scene to {root}/{scan}")


def make_multiscan(root, scans):
    """Multi-scan tree sharing one Cameras/ dir (the DTU layout) for
    hermetic generalizable-training runs; also writes <root>/scans.txt
    for --scan_list. Scan names should come from the packaged train list
    (scan3, scan4, ...) so the pair tables index validly."""
    for i, scan in enumerate(scans):
        make_scene(root, scan=scan)
    with open(f"{root}/scans.txt", "w") as f:
        f.write("\n".join(scans) + "\n")
    print(f"wrote {len(scans)} synthetic scans + {root}/scans.txt")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dtu_synth"
    if len(sys.argv) > 2:      # e.g. ... /tmp/dtu_ms scan3,scan4,scan5
        make_multiscan(root, sys.argv[2].split(","))
    else:
        make_scene(root)
