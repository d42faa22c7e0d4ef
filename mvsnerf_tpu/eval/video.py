"""Free-viewpoint video rendering (reference renderer_video.ipynb).

Renders a pose path (spiral / spheric / euler-interpolated) either from a
fine-tuned volume or by running MVSNet on the fly, and writes an mp4.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data.dtu_ft import rays_for_pose
from ..utils.vis import visualize_depth, panel, to8b
from .paths import (create_spheric_poses, create_spiral_poses,
                    gen_render_path, nerf_video_path, pose_spherical_dtu)


def make_path(kind: str, dataset=None, n_frames: int = 60, **kw):
    """Pose path factory (renderer_video.ipynb cell 4 equivalents)."""
    if kind == "spiral":
        radii = kw.get("radii", np.array([0.5, 0.5, 0.5]))
        return create_spiral_poses(radii, kw.get("focus_depth", 3.5),
                                   n_frames)
    if kind == "spheric":
        return create_spheric_poses(kw.get("radius", 4.0), n_frames)
    if kind == "nerf":
        return nerf_video_path(n_frames, kw.get("radius", 4.0),
                               kw.get("phi", -30.0))
    if kind == "dtu":
        return pose_spherical_dtu(kw.get("radii", np.array([0.8, 0.4, 0.4])),
                                  kw.get("focus_depth", 3.0), n_frames,
                                  kw.get("world_center", np.zeros(3)))
    if kind == "interp":
        assert dataset is not None
        poses = np.asarray(dataset.load_poses_all())
        # gen_render_path emits (len-1) * (n_frames//3) frames; the
        # reference feeds it small hand-picked view sets
        # (renderer_video.ipynb cell 10). Interpolate through 4 evenly
        # spaced key poses so the total stays ~n_frames regardless of
        # dataset size.
        if len(poses) > 4:
            poses = poses[np.linspace(0, len(poses) - 1, 4).astype(int)]
        return gen_render_path(poses, n_frames)
    raise ValueError(f"unknown path kind {kind}")


def render_video(system, poses, h: int, w: int, focal, near_far,
                 out_path: str, fps: int = 20, chunk: int = 8192,
                 with_depth_panel: bool = False):
    """Render each pose with `system.render_image` (FinetuneSystem or
    FusionFinetuneSystem) and write an mp4 (renderer_video.ipynb cells
    6/8/10: 60 frames, imageio.mimwrite)."""
    import imageio.v2 as imageio

    frames = []
    center = [w / 2, h / 2]
    focal = focal if isinstance(focal, (list, tuple)) else [focal, focal]
    for c2w in poses:
        c2w4 = np.eye(4, dtype=np.float32)
        c2w4[:3] = np.asarray(c2w)[:3]
        rays = rays_for_pose(h, w, focal, center, c2w4, near_far[0],
                             near_far[1])
        try:
            out = system.render_image(jnp.asarray(rays), chunk=chunk,
                                      image_hw=(h, w))
        except TypeError:  # systems without a tiled fast path
            out = system.render_image(jnp.asarray(rays), chunk=chunk)
        rgb = np.clip(np.asarray(out["rgb"]).reshape(h, w, 3), 0, 1)
        if with_depth_panel:
            dvis, _ = visualize_depth(
                np.asarray(out["depth"]).reshape(h, w), near_far)
            rgb = panel([rgb, dvis])
        frames.append(to8b(rgb))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    try:
        imageio.mimwrite(out_path, frames, fps=fps, quality=8)
    except Exception:
        # no ffmpeg plugin in this environment — fall back to GIF
        out_path = os.path.splitext(out_path)[0] + ".gif"
        imageio.mimwrite(out_path, frames, duration=1000.0 / fps)
    render_video.last_path = out_path
    return frames


render_video.last_path = None
