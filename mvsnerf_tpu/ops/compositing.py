"""Alpha compositing for volume rendering.

Mirrors the reference renderer.py:5-26 and 65-92 exactly, including the
parity-critical quirk that ``alpha = 1 - exp(-sigma)`` does NOT multiply the
inter-sample distance in (renderer.py:18-26); `dists` is computed and passed
but unused by raw2alpha.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth2dist(z_vals, cos_angle):
    """Inter-sample distances scaled by |ray_dir| (renderer.py:5-11)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    return dists * cos_angle[..., None]


def ndc2dist(ndc_pts, cos_angle):
    """Inter-sample distances in NDC space (renderer.py:13-16)."""
    dists = jnp.linalg.norm(ndc_pts[:, 1:] - ndc_pts[:, :-1], axis=-1)
    return jnp.concatenate([dists, 1e10 * cos_angle[..., None]], axis=-1)


def raw2alpha(sigma):
    """alpha/transmittance weights (renderer.py:18-26).

    Quirk preserved: no Δt factor — alpha = 1 - exp(-sigma).

    Args:
        sigma: (N_rays, N_samples) raw density.

    Returns:
        (alpha, weights) each (N_rays, N_samples).
    """
    alpha = 1.0 - jnp.exp(-sigma)
    ones = jnp.ones_like(alpha[..., :1])
    t = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1
    )[..., :-1]
    weights = alpha * t
    return alpha, weights


def raw2outputs(raw, z_vals, white_bkgd: bool = False):
    """Composite raw RGBA along rays (renderer.py:65-92).

    Args:
        raw: (N_rays, N_samples, 4+) — rgb in [..., :3], sigma at [..., 3].
        z_vals: (N_rays, N_samples) depth of each sample.
        white_bkgd: blend onto white background.

    Returns:
        dict with rgb (N,3), disp (N,), acc (N,), weights (N,S), depth (N,),
        alpha (N,S).
    """
    rgb = raw[..., :3]
    alpha, weights = raw2alpha(raw[..., 3])
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return {
        "rgb": rgb_map,
        "disp": disp_map,
        "acc": acc_map,
        "weights": weights,
        "depth": depth_map,
        "alpha": alpha,
    }
