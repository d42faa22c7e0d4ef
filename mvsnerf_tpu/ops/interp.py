"""Bilinear / trilinear grid sampling primitives.

TPU-native replacements for the reference's `torch.nn.functional.grid_sample`
call sites (reference: utils.py:320,322,378,382,625; models.py:949). All call
sites in the reference use ``align_corners=True``; padding is ``border`` for
the color gather (utils.py:320) and ``zeros`` everywhere else.

Semantics (align_corners=True):
    pixel_x = (grid_x + 1) / 2 * (W - 1)
so grid -1 maps to pixel 0 and grid +1 maps to pixel W-1.

These are pure-XLA gather formulations: one flattened gather per corner, with
the interpolation weights fused by XLA into the surrounding computation. A
fused Pallas path for the hot per-ray trilinear+MLP pipeline lives in
``mvsnerf_tpu.ops.pallas_kernels``.
"""

from __future__ import annotations

import jax

import jax.numpy as jnp


def _axis_patch_weights(coord, size, padding_mode):
    """Per-axis interpolation weights mapped onto a 2-wide gather patch.

    The patch start is floor(coord) CLIPPED into [0, size-2] by the gather
    (mode='clip'), so corner weights are remapped to their position within
    the clipped patch; out-of-range corners get zero weight under 'zeros'
    padding ('border' clamps the coordinate first, torch semantics).

    Returns (start (int32), w (..., 2)).
    """
    if padding_mode == "border":
        coord = jnp.clip(coord, 0.0, size - 1.0)
    c0 = jnp.floor(coord)
    frac = coord - c0
    c0i = c0.astype(jnp.int32)
    start = jnp.clip(c0i, 0, max(size - 2, 0))
    w0 = 1.0 - frac
    w1 = frac
    if padding_mode == "zeros":
        w0 = jnp.where((c0i >= 0) & (c0i <= size - 1), w0, 0.0)
        w1 = jnp.where((c0i + 1 >= 0) & (c0i + 1 <= size - 1), w1, 0.0)
    elif padding_mode != "border":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    pos0 = c0i - start            # patch position of corner 0 (-1, 0, or 1)
    w = jnp.stack([jnp.where(pos0 == 0, w0, 0.0) +
                   jnp.where(pos0 == -1, w1, 0.0),
                   jnp.where(pos0 == 1, w0, 0.0) +
                   jnp.where(pos0 == 0, w1, 0.0)], axis=-1)
    return start, w


def grid_sample_2d(img, grid, padding_mode: str = "zeros"):
    """Bilinear sample `img` at normalized grid coords, align_corners=True.

    One lax.gather of 2x2xC patches per call (mode='clip' handles bounds)
    instead of 4 corner gathers — gather cost on TPU scales with the index
    count, so patch gathering is ~4x cheaper.

    Args:
        img:  (H, W, C) array.
        grid: (..., 2) array of (x, y) in [-1, 1] (torch grid_sample layout).
        padding_mode: 'zeros' or 'border'.

    Returns:
        (..., C) sampled values.
    """
    H, W, C = img.shape
    lead = grid.shape[:-1]
    x = ((grid[..., 0] + 1.0) * 0.5 * (W - 1)).reshape(-1)
    y = ((grid[..., 1] + 1.0) * 0.5 * (H - 1)).reshape(-1)

    sx, wx = _axis_patch_weights(x, W, padding_mode)
    sy, wy = _axis_patch_weights(y, H, padding_mode)

    starts = jnp.stack([sy, sx], axis=-1)  # (N, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patches = jax.lax.gather(
        img, starts, dnums, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP)          # (N, 2, 2, C)

    w = wy[:, :, None] * wx[:, None, :]               # (N, 2, 2)
    out = jnp.sum(patches * w[..., None], axis=(1, 2))
    return out.reshape(*lead, C)


def grid_sample_3d(vol, grid, padding_mode: str = "zeros"):
    """Trilinear sample `vol` at normalized grid coords, align_corners=True.

    One lax.gather of 2x2x2xC patches per call instead of 8 corner gathers
    (see grid_sample_2d).

    Args:
        vol:  (D, H, W, C) array (depth-major, channel-last).
        grid: (..., 3) array of (x, y, z) in [-1, 1]; x indexes W, y indexes H,
              z indexes D — the torch 5-D grid_sample layout (models.py:949).
        padding_mode: 'zeros' or 'border'.

    Returns:
        (..., C) sampled values.
    """
    D, H, W, C = vol.shape
    lead = grid.shape[:-1]
    x = ((grid[..., 0] + 1.0) * 0.5 * (W - 1)).reshape(-1)
    y = ((grid[..., 1] + 1.0) * 0.5 * (H - 1)).reshape(-1)
    z = ((grid[..., 2] + 1.0) * 0.5 * (D - 1)).reshape(-1)

    sx, wx = _axis_patch_weights(x, W, padding_mode)
    sy, wy = _axis_patch_weights(y, H, padding_mode)
    sz, wz = _axis_patch_weights(z, D, padding_mode)

    starts = jnp.stack([sz, sy, sx], axis=-1)  # (N, 3)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    patches = jax.lax.gather(
        vol, starts, dnums, slice_sizes=(2, 2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP)       # (N, 2, 2, 2, C)

    w = wz[:, :, None, None] * wy[:, None, :, None] * wx[:, None, None, :]
    out = jnp.sum(patches * w[..., None], axis=(1, 2, 3))
    return out.reshape(*lead, C)


def index_point_feature(volume, xyz_ndc):
    """Trilinear lookup of the encoding volume at NDC coords in [0, 1].

    Reference: utils.py:357-383 (`index_point_feature`) and models.py:948-949
    (`RefVolume.forward`) — both scale NDC by `* 2 - 1` then trilinear
    grid_sample with align_corners=True, zeros padding.

    Args:
        volume:  (D, H, W, C) encoding volume.
        xyz_ndc: (..., 3) coordinates in [0, 1] ordered (x, y, z).

    Returns:
        (..., C) features.
    """
    return grid_sample_3d(volume, xyz_ndc * 2.0 - 1.0, padding_mode="zeros")


def interpolate_bilinear_resize(img, out_h: int, out_w: int,
                                align_corners: bool = False):
    """Bilinear resize matching torch.nn.functional.interpolate semantics.

    Used for the MVSNet image pyramid (models.py:859 uses align_corners=False,
    models.py:713 uses align_corners=True).

    Args:
        img: (H, W, C).
    Returns:
        (out_h, out_w, C)
    """
    H, W, _ = img.shape
    if align_corners:
        ys = jnp.linspace(0.0, H - 1.0, out_h)
        xs = jnp.linspace(0.0, W - 1.0, out_w)
    else:
        ys = (jnp.arange(out_h) + 0.5) * (H / out_h) - 0.5
        xs = (jnp.arange(out_w) + 0.5) * (W / out_w) - 0.5
    # Convert to the normalized grid of grid_sample_2d (align_corners=True
    # mapping) and sample with border padding == torch interpolate's edge clamp.
    gy = ys / (H - 1) * 2.0 - 1.0 if H > 1 else jnp.zeros_like(ys)
    gx = xs / (W - 1) * 2.0 - 1.0 if W > 1 else jnp.zeros_like(xs)
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
    return grid_sample_2d(img, grid, padding_mode="border")
