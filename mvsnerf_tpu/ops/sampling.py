"""Ray-marching sample generation: stratified + inverse-CDF importance.

TPU-native (static-shape, explicit PRNG keys) equivalents of the reference's
data/ray_utils.py:98-223 and utils.py:211-221.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(key, near, far, n_rays: int, n_samples: int,
                      perturb: float = 0.0, lindisp: bool = False):
    """Depth values along rays (ray_utils.py:152-191 semantics).

    Args:
        key: PRNG key (unused when perturb == 0).
        near, far: scalars or (N_rays, 1) arrays.
        perturb: jitter magnitude in [0, 1].

    Returns:
        z_vals: (n_rays, n_samples).
    """
    t = jnp.linspace(0.0, 1.0, n_samples)
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    z_vals = jnp.broadcast_to(z, (n_rays, n_samples))
    if perturb > 0:
        mids = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        u = perturb * jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * u
    return z_vals


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False):
    """Inverse-CDF sampling (ray_utils.py:98-141).

    Args:
        bins:    (N_rays, M) bin edges (z_vals midpoints).
        weights: (N_rays, M-1) unnormalized density weights.

    Returns:
        (N_rays, n_samples) sampled depths.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples))

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def dda(rays_o, rays_d, bbox_3d):
    """Ray/AABB intersection (ray_utils.py:143-150).

    Args:
        rays_o, rays_d: (N, 3).
        bbox_3d: (2, 3) [min; max].

    Returns:
        (t_min, t_max) each (N, 1).
    """
    inv_d = 1.0 / (rays_d + 1e-6)
    t0 = (bbox_3d[:1] - rays_o) * inv_d
    t1 = (bbox_3d[1:] - rays_o) * inv_d
    t = jnp.stack([t0, t1])
    t_min = jnp.max(jnp.min(t, axis=0), axis=-1, keepdims=True)
    t_max = jnp.min(jnp.max(t, axis=0), axis=-1, keepdims=True)
    return t_min, t_max


def ray_marcher(key, rays, n_samples: int, perturb: float = 0.0,
                lindisp: bool = False, bbox_3d=None):
    """Sample points along flat ray buffers (ray_utils.py:152-197).

    Args:
        rays: (N_rays, 8) = [origin(3), dir(3), near, far].

    Returns:
        (xyz (N, S, 3), rays_o (N, 3), rays_d (N, 3), z_vals (N, S)).
    """
    n_rays = rays.shape[0]
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    if bbox_3d is not None:
        near, far = dda(rays_o, rays_d, bbox_3d)
    z_vals = stratified_z_vals(key, near, far, n_rays, n_samples,
                               perturb=perturb, lindisp=lindisp)
    xyz = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    return xyz, rays_o, rays_d, z_vals


def ray_marcher_fine(key, rays, density_volume, z_vals, pts_ndc,
                     n_importance: int = 64):
    """Importance-resample depths from a baked density volume
    (ray_utils.py:199-223). Total samples = n_samples + n_importance (static).

    Args:
        density_volume: (D, H, W, 1) channel-last sigma volume.
        z_vals: (N, S) coarse depths.
        pts_ndc: (N, S, 3) coarse sample NDC coords in [0, 1].

    Returns:
        (xyz (N, S+I, 3), rays_o, rays_d, z_vals (N, S+I)).
    """
    from .interp import grid_sample_3d
    from .compositing import raw2alpha

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    sigma = grid_sample_3d(density_volume, pts_ndc * 2.0 - 1.0)[..., 0]
    _, weights = raw2alpha(jax.nn.relu(sigma))
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    z_samples = jax.lax.stop_gradient(
        sample_pdf(key, z_mid, weights[:, 1:-1], n_importance)
    )
    z_vals = jnp.sort(jnp.concatenate([z_samples, z_vals], axis=-1), axis=-1)
    xyz = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    return xyz, rays_o, rays_d, z_vals
