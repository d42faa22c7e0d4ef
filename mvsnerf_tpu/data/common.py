"""Shared data-loading utilities: image IO, PFM depth maps, MVSNet camera
files, pose averaging/centering, and render-path generators.

Numpy/CPU only — the data layer feeds numpy arrays to the jitted compute
path; nothing here touches jax.
"""

from __future__ import annotations

import os
import re

import numpy as np

# torchvision Normalize constants used by every loader
# (reference data/dtu.py:47-50)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet(img):
    """img: (..., 3) in [0, 1] -> ImageNet-normalized."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def unnormalize_imagenet(img):
    return img * IMAGENET_STD + IMAGENET_MEAN


def load_image(path, wh=None, method="lanczos", keep_alpha=False):
    """Load an image to float32 (H, W, C) in [0, 1]; optional resize.

    method: 'lanczos' (reference per-scene loaders) or 'bilinear'
    (reference DTU generalizable loader, data/dtu.py:160).
    """
    from PIL import Image

    img = Image.open(path)
    if not keep_alpha and img.mode not in ("RGB",):
        if img.mode == "RGBA" and keep_alpha:
            pass
        elif img.mode != "RGBA":
            img = img.convert("RGB")
    if wh is not None:
        resample = Image.LANCZOS if method == "lanczos" else Image.BILINEAR
        img = img.resize(tuple(int(x) for x in wh), resample)
    arr = np.asarray(img, np.float32) / 255.0
    if not keep_alpha and arr.ndim == 3 and arr.shape[-1] == 4:
        arr = arr[..., :3]
    return arr


def read_pfm(path):
    """PFM depth-map reader (reference utils.py:440-475 semantics).

    Returns (data (H, W) or (H, W, 3) float32, scale).
    """
    with open(path, "rb") as f:
        header = f.readline().decode("latin-1").rstrip()
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = f.readline().decode("latin-1")
        m = re.match(r"^(\d+)\s(\d+)\s$", dims)
        if not m:
            raise ValueError(f"malformed PFM header: {path}")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("latin-1").rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.frombuffer(f.read(), endian + "f")
        shape = (height, width, 3) if color else (height, width)
        data = data.reshape(shape)
        data = np.flipud(data)  # PFM stores bottom-up
    return np.ascontiguousarray(data, np.float32), scale


def write_pfm(path, image, scale=1.0):
    """PFM writer (for hermetic data tests)."""
    image = np.asarray(image, np.float32)
    color = image.ndim == 3 and image.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        f.write(f"{-scale}\n".encode())  # little-endian
        np.flipud(image).astype("<f").tofile(f)


def read_cam_file(path, scale_factor=1.0 / 200):
    """MVSNet `*_cam.txt` parser (reference data/dtu.py:101-114).

    Returns (intrinsic (3,3), extrinsic (4,4) with translation scaled,
    [depth_min, depth_max] scaled, depth_interval raw).
    """
    with open(path) as f:
        lines = [line.rstrip() for line in f.readlines()]
    extrinsic = np.fromstring(" ".join(lines[1:5]), dtype=np.float32,
                              sep=" ").reshape(4, 4)
    intrinsic = np.fromstring(" ".join(lines[7:10]), dtype=np.float32,
                              sep=" ").reshape(3, 3)
    depth_min = float(lines[11].split()[0]) * scale_factor
    depth_interval = float(lines[11].split()[1])
    depth_max = depth_min + depth_interval * 192 * scale_factor
    extrinsic = extrinsic.copy()
    extrinsic[:3, 3] *= scale_factor
    return intrinsic, extrinsic, [depth_min, depth_max], depth_interval


def write_cam_file(path, intrinsic, extrinsic, depth_min, depth_interval):
    """MVSNet cam.txt writer (for hermetic data tests)."""
    with open(path, "w") as f:
        f.write("extrinsic\n")
        for row in np.asarray(extrinsic).reshape(4, 4):
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
        f.write("\nintrinsic\n")
        for row in np.asarray(intrinsic).reshape(3, 3):
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
        f.write(f"\n{depth_min} {depth_interval}\n")


def resize_nearest(img, fx=None, fy=None, out_wh=None):
    """Nearest-neighbour resize matching cv2.resize INTER_NEAREST
    (used for GT depth pyramids, data/dtu.py:118-124)."""
    h, w = img.shape[:2]
    if out_wh is None:
        out_w, out_h = int(round(w * fx)), int(round(h * fy))
    else:
        out_w, out_h = out_wh
    # cv2 INTER_NEAREST: src = floor(dst * (src_size / dst_size))
    xs = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    ys = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    return img[ys[:, None], xs[None, :]]


# -------------------------------------------------------------- poses -------

BLENDER2OPENCV = np.array([[1, 0, 0, 0], [0, -1, 0, 0],
                           [0, 0, -1, 0], [0, 0, 0, 1]], np.float64)


def _normalize(v):
    return v / np.linalg.norm(v)


def average_pose(poses):
    """Mean camera pose (reference data/llff.py:17-51)."""
    center = poses[..., 3].mean(0)
    z = _normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = _normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses, blender2opencv=BLENDER2OPENCV):
    """Recenter poses around the average pose (data/llff.py:55-80)."""
    pose_avg = average_pose(poses)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    last_row = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], 1)
    centered = np.linalg.inv(pose_avg_homo) @ poses_homo
    centered = centered @ blender2opencv
    return centered[:, :3], np.linalg.inv(pose_avg_homo) @ blender2opencv


def create_spiral_poses(radii, focus_depth, n_poses=120):
    """Spiral render path (data/llff.py:83-113)."""
    out = []
    for t in np.linspace(0, 4 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = _normalize(center - np.array([0, 0, -focus_depth]))
        x = _normalize(np.cross(np.array([0, 1.0, 0]), z))
        y = np.cross(z, x)
        out.append(np.stack([x, y, z, center], 1))
    return np.stack(out)


def create_spheric_poses(radius, n_poses=120, phi=-np.pi / 5):
    """Circular render path around z (data/llff.py:116-154)."""
    def spheric_pose(theta, phi, radius):
        trans_t = np.array([[1, 0, 0, 0], [0, 1, 0, -0.9 * radius],
                            [0, 0, 1, radius], [0, 0, 0, 1.0]])
        rot_phi = np.array([[1, 0, 0, 0],
                            [0, np.cos(phi), -np.sin(phi), 0],
                            [0, np.sin(phi), np.cos(phi), 0], [0, 0, 0, 1]])
        rot_theta = np.array([[np.cos(theta), 0, -np.sin(theta), 0],
                              [0, 1, 0, 0],
                              [np.sin(theta), 0, np.cos(theta), 0],
                              [0, 0, 0, 1]])
        c2w = rot_theta @ rot_phi @ trans_t
        c2w = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0],
                        [0, 0, 0, 1.0]]) @ c2w
        return c2w[:3]

    return np.stack([spheric_pose(th, phi, radius)
                     for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]])
