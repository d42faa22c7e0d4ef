"""Camera/ray geometry: ray generation, reference-view NDC, ray builders.

TPU-native equivalents of the reference's utils.py:86-297 and
data/ray_utils.py:12-94. Pure jnp, fully vmap/jit friendly, static shapes,
explicit PRNG keys instead of global torch RNG.

Conventions follow the reference (OpenCV camera: x right, y down, z forward;
pixel grids are NOT half-pixel centered — see data/ray_utils.py:24).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .precision import matmul_f32


def pixel_grid(h: int, w: int):
    """(h, w, 2) grid of (x, y) pixel coordinates, not centered."""
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    return jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)


def get_ray_directions(h: int, w: int, focal, center=None):
    """Per-pixel ray directions in camera frame (ray_utils.py:12-29)."""
    grid = pixel_grid(h, w)
    cx, cy = (w / 2, h / 2) if center is None else (center[0], center[1])
    return jnp.stack(
        [
            (grid[..., 0] - cx) / focal[0],
            (grid[..., 1] - cy) / focal[1],
            jnp.ones((h, w), jnp.float32),
        ],
        axis=-1,
    )


def get_rays(directions, c2w):
    """World-frame rays from camera-frame directions (ray_utils.py:32-53).

    Returns:
        rays_o, rays_d: each (N, 3). rays_d is NOT normalized.
    """
    rays_d = matmul_f32(directions, c2w[:3, :3].T)
    rays_d = rays_d.reshape(-1, 3)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_ndc_rays(h: int, w: int, focal, near, rays_o, rays_d):
    """NeRF-style NDC ray reparameterization (ray_utils.py:56-94)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]
    o0 = -1.0 / (w / (2.0 * focal[0])) * ox_oz
    o1 = -1.0 / (h / (2.0 * focal[1])) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (w / (2.0 * focal[0])) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (h / (2.0 * focal[1])) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def rays_from_pixels(xs, ys, intrinsic, c2w):
    """Rays through given pixel coords (utils.py:86-108 `get_rays_mvs` core).

    Args:
        xs, ys: (N,) pixel coordinates (float).
    Returns:
        rays_o (3,), rays_d (N, 3) un-normalized, +z forward.
    """
    dirs = jnp.stack(
        [
            (xs - intrinsic[0, 2]) / intrinsic[0, 0],
            (ys - intrinsic[1, 2]) / intrinsic[1, 1],
            jnp.ones_like(xs),
        ],
        axis=-1,
    )
    rays_d = matmul_f32(dirs, c2w[:3, :3].T)
    rays_o = c2w[:3, 3]
    return rays_o, rays_d


def sample_random_pixels(key, h: int, w: int, n: int,
                         precrop: bool = False):
    """Random integer pixel coords (utils.py:89-93). When `precrop`, with
    probability 0.7 the pixels are drawn from the center 2/3 region."""
    kx, ky, kp = jax.random.split(key, 3)
    xs_full = jax.random.randint(kx, (n,), 0, w).astype(jnp.float32)
    ys_full = jax.random.randint(ky, (n,), 0, h).astype(jnp.float32)
    if not precrop:
        return xs_full, ys_full
    kx2, ky2, kc = jax.random.split(kp, 3)
    xs_crop = jax.random.randint(kx2, (n,), w // 6, w - w // 6).astype(jnp.float32)
    ys_crop = jax.random.randint(ky2, (n,), h // 6, h - h // 6).astype(jnp.float32)
    use_crop = jax.random.uniform(kc, ()) > 0.3
    xs = jnp.where(use_crop, xs_crop, xs_full)
    ys = jnp.where(use_crop, ys_crop, ys_full)
    return xs, ys


def full_image_pixels(h: int, w: int):
    """All pixel coords, row-major (utils.py:94-99)."""
    grid = pixel_grid(h, w)
    return grid[..., 0].reshape(-1), grid[..., 1].reshape(-1)


def get_ndc_coordinate(w2c_ref, intrinsic_ref, point_samples, inv_scale,
                       near, far, pad: int = 0, lindisp: bool = False):
    """World points -> reference-view NDC in [0, 1] (utils.py:112-146).

    xy is the projected pixel coordinate normalized by (W-1, H-1); z is
    (depth - near) / (far - near). When `pad > 0`, xy is remapped into the
    padded feature grid of size ((dim+1)/4 + 2*pad) — the reference's
    pad-correction (utils.py:140-143) that couples the image extent, the
    stride-4 feature grid, and the cost-volume padding.

    Args:
        point_samples: (..., 3) world points.
        inv_scale: (2,) = (W-1, H-1).

    Returns:
        (..., 3) NDC coordinates, ordered (x, y, z).
    """
    shape = point_samples.shape
    pts = point_samples.reshape(-1, 3)
    if w2c_ref is not None:
        pts = matmul_f32(pts, w2c_ref[:3, :3].T) + w2c_ref[:3, 3]
    pix = matmul_f32(pts, intrinsic_ref.T)
    xy = pix[:, :2] / pix[:, 2:3] / inv_scale.reshape(1, 2)
    if lindisp:
        z = (1.0 / pix[:, 2] - 1.0 / near) / (1.0 / far - 1.0 / near)
    else:
        z = (pix[:, 2] - near) / (far - near)
    if pad > 0:
        wh_feat = (inv_scale + 1.0) / 4.0
        xy = xy * wh_feat / (wh_feat + pad * 2) + pad / (wh_feat + pad * 2)
    out = jnp.concatenate([xy, z[:, None]], axis=-1)
    return out.reshape(shape)


def get_ndc_coordinate_bbox(bbox_min, bbox_max, point_samples):
    """Bounding-box normalization branch of get_ndc_coordinate
    (utils.py:134-137): (p - min) / (max - min)."""
    return (point_samples - bbox_min) / (bbox_max - bbox_min)


class RayBatch(NamedTuple):
    """A batch of rays through a target view, with reference-view NDC samples.

    Mirrors the tuple returned by the reference's build_rays/build_rays_test
    (utils.py:148-297)."""
    pts_world: jnp.ndarray      # (N_rays, N_samples, 3)
    dirs_world: jnp.ndarray     # (N_rays, 3) un-normalized
    pts_ndc: jnp.ndarray        # (N_rays, N_samples, 3) in [0,1]
    z_vals: jnp.ndarray         # (N_rays, N_samples)
    rays_o: jnp.ndarray         # (N_rays, 3)
    colors: jnp.ndarray | None  # (N_rays, 3) GT target colors (train only)
    depths: jnp.ndarray | None  # (N_rays,) GT target depths (train only)
    pixel_xy: jnp.ndarray | None  # (N_rays, 2) sampled pixel coords


def build_rays_train(key, img, depth, target_intrinsic, target_c2w,
                     w2c_ref, intrinsic_ref, near_far_target, near_far_ref,
                     n_rays: int, n_samples: int, pad: int = 0,
                     precrop: bool = False, perturb: float = 1.0) -> RayBatch:
    """Training ray builder (utils.py:148-241): random pixels in the target
    view, stratified depths between the target near/far, world + ref-NDC
    sample points, GT color/depth gathers at integer pixels.

    Args:
        img:   (H, W, 3) target image (already normalized as the loss expects).
        depth: (H, W) target GT depth or None.
    """
    h, w = img.shape[:2]
    k_pix, k_z = jax.random.split(key)
    xs, ys = sample_random_pixels(k_pix, h, w, n_rays, precrop=precrop)
    rays_o, rays_d = rays_from_pixels(xs, ys, target_intrinsic, target_c2w)

    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    colors = img[yi, xi]
    depths = depth[yi, xi] if depth is not None else None

    near, far = near_far_target[0], near_far_target[1]
    t = jnp.linspace(0.0, 1.0, n_samples)
    z = near * (1.0 - t) + far * t
    z_vals = jnp.broadcast_to(z, (n_rays, n_samples))
    if perturb > 0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        z_vals = lower + (upper - lower) * jax.random.uniform(k_z, z_vals.shape)

    rays_o_b = jnp.broadcast_to(rays_o, (n_rays, 3))
    pts_world = rays_o_b[:, None] + z_vals[..., None] * rays_d[:, None]
    inv_scale = jnp.array([w - 1, h - 1], jnp.float32)
    pts_ndc = get_ndc_coordinate(w2c_ref, intrinsic_ref, pts_world, inv_scale,
                                 near=near_far_ref[0], far=near_far_ref[1],
                                 pad=pad)
    return RayBatch(pts_world, rays_d, pts_ndc, z_vals, rays_o_b,
                    colors, depths, jnp.stack([xs, ys], -1))


def build_rays_test(h: int, w: int, tgt_to_world, world_to_ref, intrinsic,
                    near_far_ref, near_far_target, n_samples: int,
                    pad: int = 0) -> RayBatch:
    """Full-image deterministic ray builder (utils.py:243-297)."""
    xs, ys = full_image_pixels(h, w)
    rays_o, rays_d = rays_from_pixels(xs, ys, intrinsic, tgt_to_world)
    n_rays = h * w
    near, far = near_far_target[0], near_far_target[1]
    t = jnp.linspace(0.0, 1.0, n_samples)
    z_vals = jnp.broadcast_to(near * (1.0 - t) + far * t, (n_rays, n_samples))
    rays_o_b = jnp.broadcast_to(rays_o, (n_rays, 3))
    pts_world = rays_o_b[:, None] + z_vals[..., None] * rays_d[:, None]
    inv_scale = jnp.array([w - 1, h - 1], jnp.float32)
    pts_ndc = get_ndc_coordinate(world_to_ref, intrinsic, pts_world, inv_scale,
                                 near=near_far_ref[0], far=near_far_ref[1],
                                 pad=pad)
    return RayBatch(pts_world, rays_d, pts_ndc, z_vals, rays_o_b,
                    None, None, jnp.stack([xs, ys], -1))


def get_nearest_pose_ids(tgt_position, ref_positions, num_select: int):
    """Nearest source views by camera-center distance (utils.py:698-711)."""
    dists = jnp.linalg.norm(ref_positions - tgt_position[None], axis=-1)
    return jnp.argsort(dists)[:num_select]
