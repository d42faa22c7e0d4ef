"""Hermetic data-layer tests on a tiny synthesized DTU-format scene and a
tiny Blender scene written to tmp_path (SURVEY.md §4: loaders must run
without the real datasets).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from mvsnerf_tpu.data.common import (read_pfm, write_pfm, read_cam_file,
                                     write_cam_file, resize_nearest,
                                     normalize_imagenet,
                                     unnormalize_imagenet)

RNG = np.random.default_rng(5)


def test_pfm_roundtrip(tmp_path):
    depth = RNG.uniform(0, 10, (20, 30)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, depth)
    out, scale = read_pfm(p)
    np.testing.assert_allclose(out, depth)


def test_cam_file_roundtrip(tmp_path):
    intr = np.array([[361.5, 0, 80], [0, 361.5, 64], [0, 0, 1]], np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, 3] = [1, 2, 3]
    p = str(tmp_path / "cam.txt")
    write_cam_file(p, intr, ext, 425.0, 2.5)
    i2, e2, nf, interval = read_cam_file(p, scale_factor=1 / 200)
    np.testing.assert_allclose(i2, intr, atol=1e-4)
    # translation scaled by 1/200 (data/dtu.py:84)
    np.testing.assert_allclose(e2[:3, 3], np.array([1, 2, 3]) / 200,
                               atol=1e-6)
    np.testing.assert_allclose(nf[0], 425.0 / 200, atol=1e-5)
    np.testing.assert_allclose(nf[1], (425.0 + 2.5 * 192) / 200, atol=1e-5)


def test_normalize_roundtrip():
    img = RNG.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        unnormalize_imagenet(normalize_imagenet(img)), img, atol=1e-6)


def _write_dtu_scene(root, n_views=6, scan="scan1", h=128, w=160):
    """Synthesize a minimal DTU-format scene tree."""
    os.makedirs(f"{root}/Cameras/train", exist_ok=True)
    os.makedirs(f"{root}/Rectified/{scan}_train", exist_ok=True)
    os.makedirs(f"{root}/Depths/{scan}", exist_ok=True)
    for vid in range(n_views):
        a = 0.05 * vid
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]])
        ext = np.eye(4)
        ext[:3, :3] = R
        ext[:3, 3] = [0.1 * vid, 0, 600]
        intr = np.array([[100.0, 0, w / 8], [0, 100.0, h / 8], [0, 0, 1]])
        write_cam_file(f"{root}/Cameras/train/{vid:08d}_cam.txt",
                       intr, ext, 425.0, 2.5)
        for light in range(7):
            img = (RNG.uniform(0, 1, (1200, 1600, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                f"{root}/Rectified/{scan}_train/"
                f"rect_{vid + 1:03d}_{light}_r5000.png")
        # real DTU GT depths are 1200x1600 (so that x0.5 then the
        # [44:556, 80:720] crop yields 512x640, data/dtu.py:116-127)
        write_pfm(f"{root}/Depths/{scan}/depth_map_{vid:04d}.pfm",
                  RNG.uniform(400, 900, (1200, 1600)).astype(np.float32))


def _write_dtu_pairs(path, n_views=6):
    with open(path, "w") as f:
        f.write(f"{n_views}\n")
        for ref in range(n_views):
            srcs = [v for v in range(n_views) if v != ref][:5]
            f.write(f"{ref}\n")
            f.write(f"{len(srcs)} " +
                    " ".join(f"{s} {100 - i}" for i, s in enumerate(srcs)) +
                    "\n")


@pytest.mark.slow
def test_dtu_dataset(tmp_path):
    from mvsnerf_tpu.data.dtu import MVSDatasetDTU
    root = str(tmp_path / "dtu")
    _write_dtu_scene(root)
    pairs_path = str(tmp_path / "pairs.txt")
    _write_dtu_pairs(pairs_path)
    ds = MVSDatasetDTU(root, "train", downSample=0.1,
                       scan_list=["scan1"], pairs_path=pairs_path)
    assert len(ds) == 6 * 7
    s = ds[0]
    V = 4
    assert s["images"].shape == (V, 120, 160, 3)
    assert s["proj_mats"].shape == (V, 3, 4)
    np.testing.assert_allclose(s["proj_mats"][0], np.eye(4)[:3], atol=1e-6)
    assert s["depths_h"].shape[0] == V
    assert s["near_fars"].shape == (V, 2)
    # w2c/c2w are inverses
    np.testing.assert_allclose(s["w2cs"][1] @ s["c2ws"][1], np.eye(4),
                               atol=1e-5)
    # target view differs from the 3 source views
    assert s["view_ids"][-1] not in s["view_ids"][:3]


@pytest.mark.slow
def test_dtu_ft_dataset(tmp_path, monkeypatch):
    from mvsnerf_tpu.config import config_parser
    from mvsnerf_tpu.data.dtu_ft import DTUFTDataset
    from mvsnerf_tpu.data import pairs as pairs_mod
    root = str(tmp_path / "dtu")
    _write_dtu_scene(root, n_views=8)
    # patch the packaged pair table with one fitting the tiny scene
    monkeypatch.setattr(pairs_mod, "_cache", {
        "dtu_train": np.arange(6), "dtu_test": np.array([6, 7])})
    args = config_parser(cmd=f"--datadir {root}/scan1 "
                             "--imgScale_train 0.1 --imgScale_test 0.1")
    ds = DTUFTDataset(args, "train")
    w, h = ds.img_wh
    assert (w, h) == (64, 51)  # 640*0.1, 512*0.1
    assert ds.all_rays.shape == (6 * h * w, 8)
    assert ds.all_rgbs.shape == (6 * h * w, 3)
    imgs, projs, near_far, pose = ds.read_source_views()
    assert imgs.shape == (3, h, w, 3)
    assert projs.shape == (3, 3, 4)
    np.testing.assert_allclose(projs[0], np.eye(4)[:3], atol=1e-6)
    ds_val = DTUFTDataset(args, "val")
    assert ds_val.all_rgbs.shape == (2, h, w, 3)
    assert ds_val.all_depth.shape[0] == 2


def _write_blender_scene(root, n_frames=6, res=64):
    os.makedirs(f"{root}/train", exist_ok=True)
    frames = []
    for i in range(n_frames):
        a = 0.3 * i
        c2w = np.eye(4)
        c2w[:3, :3] = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                                [-np.sin(a), 0, np.cos(a)]])
        c2w[:3, 3] = [np.sin(a) * 4, 0, np.cos(a) * 4]
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        img = (RNG.uniform(0, 1, (res, res, 4)) * 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(f"{root}/train/r_{i}.png")
    meta = {"camera_angle_x": 0.7, "frames": frames}
    with open(f"{root}/transforms_train.json", "w") as f:
        json.dump(meta, f)


def test_blender_dataset(tmp_path, monkeypatch):
    from mvsnerf_tpu.config import config_parser
    from mvsnerf_tpu.data.blender import BlenderDataset
    from mvsnerf_tpu.data import pairs as pairs_mod
    root = str(tmp_path / "lego")
    _write_blender_scene(root)
    monkeypatch.setattr(pairs_mod, "_cache", {
        "lego_train": np.arange(4), "lego_val": np.array([4, 5]),
        "lego_test": np.array([4, 5])})
    args = config_parser(cmd=f"--datadir {root} --imgScale_train 0.04 "
                             "--imgScale_test 0.04")
    ds = BlenderDataset(args, "train")
    w, h = ds.img_wh
    assert (w, h) == (32, 32)
    assert ds.all_rays.shape == (4 * h * w, 8)
    np.testing.assert_allclose(ds.all_rays[0, 6:], [2.0, 6.0], atol=1e-6)
    imgs, projs, near_far, pose = ds.read_source_views()
    assert imgs.shape == (3, h, w, 3)
    assert near_far == [2.0, 6.0]


def test_llff_dataset(tmp_path, monkeypatch):
    from mvsnerf_tpu.config import config_parser
    from mvsnerf_tpu.data.llff import LLFFDataset
    from mvsnerf_tpu.data import pairs as pairs_mod
    root = str(tmp_path / "horns")
    os.makedirs(f"{root}/images", exist_ok=True)
    n = 6
    pb = np.zeros((n, 17))
    for i in range(n):
        a = 0.1 * i
        # LLFF pose layout: rotation "down right back" + [H, W, focal] col
        R = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], float).T
        pose = np.zeros((3, 5))
        pose[:, :3] = R
        pose[:, 3] = [np.sin(a), 0, np.cos(a) * 2]
        pose[:, 4] = [480, 640, 500.0]
        pb[i, :15] = pose.reshape(-1)
        pb[i, 15:] = [2.0 + 0.1 * i, 8.0]
        img = (RNG.uniform(0, 1, (48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(f"{root}/images/img_{i:03d}.png")
    np.save(f"{root}/poses_bounds.npy", pb)
    monkeypatch.setattr(pairs_mod, "_cache", {
        "horns_train": np.arange(4), "horns_val": np.array([4, 5]),
        "horns_test": np.array([4, 5])})
    args = config_parser(cmd=f"--datadir {root} --imgScale_train 0.1 "
                             "--imgScale_test 0.1")
    ds = LLFFDataset(args, "train")
    w, h = ds.img_wh
    assert (w, h) == (96, 64)
    assert ds.all_rays.shape == (4 * h * w, 8)
    # spheric near/far = bounds x [0.8, 1.2] (data/llff.py:259-260)
    assert ds.all_rays[0, 6] > 0
    imgs, projs, near_far, pose = ds.read_source_views()
    assert imgs.shape == (3, h, w, 3)
    assert projs.shape == (3, 3, 4)


def test_resize_nearest_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = RNG.uniform(0, 1, (37, 53)).astype(np.float32)
    ours = resize_nearest(img, 0.5, 0.5)
    ref = cv2.resize(img, None, fx=0.5, fy=0.5,
                     interpolation=cv2.INTER_NEAREST)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref)


def test_generate_pairs():
    from mvsnerf_tpu.data.pairs import generate_pairs
    rng = np.random.default_rng(0)
    c2ws = np.tile(np.eye(4), (30, 1, 1))
    c2ws[:, :3, 3] = rng.standard_normal((30, 3))
    splits = generate_pairs(c2ws)
    assert len(splits["train"]) == 16
    assert len(splits["test"]) == 4
    assert not set(splits["train"]) & set(splits["test"])


def test_packaged_pairs_table():
    from mvsnerf_tpu.data.pairs import load_pairs
    pairs = load_pairs()
    assert len(pairs) == 57
    assert len(pairs["dtu_train"]) == 16
    assert len(pairs["lego_test"]) == 4
