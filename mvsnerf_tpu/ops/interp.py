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


def _gather_2d(img, iy, ix):
    """img: (H, W, C); iy/ix: int32 index arrays of identical shape."""
    H, W, C = img.shape
    flat = img.reshape(H * W, C)
    lin = iy * W + ix
    return jnp.take(flat, lin.reshape(-1), axis=0).reshape(*lin.shape, C)


def grid_sample_2d(img, grid, padding_mode: str = "zeros"):
    """Bilinear sample `img` at normalized grid coords, align_corners=True.

    Args:
        img:  (H, W, C) array.
        grid: (..., 2) array of (x, y) in [-1, 1] (torch grid_sample layout).
        padding_mode: 'zeros' or 'border'.

    Returns:
        (..., C) sampled values.
    """
    H, W, _ = img.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x1i, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y1i, 0, H - 1)

    v00 = _gather_2d(img, y0c, x0c)
    v01 = _gather_2d(img, y0c, x1c)
    v10 = _gather_2d(img, y1c, x0c)
    v11 = _gather_2d(img, y1c, x1c)

    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx

    if padding_mode == "zeros":
        # Zero out contributions from out-of-range corners (per-corner mask,
        # matching torch's behaviour at the boundary).
        mx0 = (x0i >= 0) & (x0i <= W - 1)
        mx1 = (x1i >= 0) & (x1i <= W - 1)
        my0 = (y0i >= 0) & (y0i <= H - 1)
        my1 = (y1i >= 0) & (y1i <= H - 1)
        w00 = jnp.where(my0 & mx0, w00, 0.0)
        w01 = jnp.where(my0 & mx1, w01, 0.0)
        w10 = jnp.where(my1 & mx0, w10, 0.0)
        w11 = jnp.where(my1 & mx1, w11, 0.0)
    elif padding_mode != "border":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    out = (
        v00 * w00[..., None]
        + v01 * w01[..., None]
        + v10 * w10[..., None]
        + v11 * w11[..., None]
    )
    return out


def _gather_3d(vol, iz, iy, ix):
    """vol: (D, H, W, C); iz/iy/ix: int32 index arrays of identical shape."""
    D, H, W, C = vol.shape
    flat = vol.reshape(D * H * W, C)
    lin = (iz * H + iy) * W + ix
    return jnp.take(flat, lin.reshape(-1), axis=0).reshape(*lin.shape, C)


def grid_sample_3d(vol, grid, padding_mode: str = "zeros"):
    """Trilinear sample `vol` at normalized grid coords, align_corners=True.

    Args:
        vol:  (D, H, W, C) array (depth-major, channel-last).
        grid: (..., 3) array of (x, y, z) in [-1, 1]; x indexes W, y indexes H,
              z indexes D — the torch 5-D grid_sample layout (models.py:949).
        padding_mode: 'zeros' or 'border'.

    Returns:
        (..., C) sampled values.
    """
    D, H, W, _ = vol.shape
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    z = (grid[..., 2] + 1.0) * 0.5 * (D - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = x - x0
    wy = y - y0
    wz = z - z0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    out = None
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0i + dx
                yi = y0i + dy
                zi = z0i + dz
                w = (
                    (wx if dx else 1 - wx)
                    * (wy if dy else 1 - wy)
                    * (wz if dz else 1 - wz)
                )
                if padding_mode == "zeros":
                    m = (
                        (xi >= 0) & (xi <= W - 1)
                        & (yi >= 0) & (yi <= H - 1)
                        & (zi >= 0) & (zi <= D - 1)
                    )
                    w = jnp.where(m, w, 0.0)
                elif padding_mode != "border":
                    raise ValueError(f"unsupported padding_mode: {padding_mode}")
                v = _gather_3d(
                    vol,
                    jnp.clip(zi, 0, D - 1),
                    jnp.clip(yi, 0, H - 1),
                    jnp.clip(xi, 0, W - 1),
                )
                term = v * w[..., None]
                out = term if out is None else out + term
    return out


def pack_corners_2d(img, padding_mode: str = "border"):
    """Pack each pixel's 2x2 bilinear corner neighborhood into channels:
    out[y, x] = [img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]] (clamped
    at the high edge). Gather cost on TPU scales with the index count, so
    sampling a packed image needs ONE gather per sample instead of four
    (grid_sample_2d_packed)."""
    H, W, C = img.shape
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    return jnp.concatenate([img, right, down, down_right], axis=-1)


def _axis_patch_weights(coord, size, padding_mode):
    """Per-axis interpolation weights remapped onto a 2-wide patch whose
    start is floor(coord) clipped into [0, size-2]: corner weights land on
    their position within the clipped patch; OOB corners get zero weight
    under 'zeros' ('border' clamps the coordinate first)."""
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
    wp0 = jnp.where(pos0 == 0, w0, 0.0) + jnp.where(pos0 == -1, w1, 0.0)
    wp1 = jnp.where(pos0 == 1, w0, 0.0) + jnp.where(pos0 == 0, w1, 0.0)
    return start, wp0, wp1


def grid_sample_2d_packed(img_packed, grid, padding_mode: str = "border"):
    """grid_sample_2d on a corner-packed image (pack_corners_2d): one
    flattened gather of 4C channels + the weight combine. Exactly equals
    grid_sample_2d(img, grid, padding_mode)."""
    H, W, C4 = img_packed.shape
    C = C4 // 4
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    sx, wx0, wx1 = _axis_patch_weights(x, W, padding_mode)
    sy, wy0, wy1 = _axis_patch_weights(y, H, padding_mode)

    patch = _gather_2d(img_packed, sy, sx)             # (..., 4C)
    v00 = patch[..., :C]
    v01 = patch[..., C:2 * C]
    v10 = patch[..., 2 * C:3 * C]
    v11 = patch[..., 3 * C:]
    return (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None]
            + v10 * (wy1 * wx0)[..., None] + v11 * (wy1 * wx1)[..., None])


def pack_corners_3d(vol):
    """Pack each voxel's 2x2x2 trilinear corner neighborhood into channels
    (edge-clamped), ordered [(dz,dy,dx) for dz in 01 for dy in 01
    for dx in 01] — one gather per sample instead of eight."""
    def shift(v, axis):
        idx = [slice(None)] * 4
        idx[axis] = slice(1, None)
        last = [slice(None)] * 4
        last[axis] = slice(-1, None)
        return jnp.concatenate([v[tuple(idx)], v[tuple(last)]], axis=axis)

    parts = []
    for dz in (0, 1):
        vz = shift(vol, 0) if dz else vol
        for dy in (0, 1):
            vy = shift(vz, 1) if dy else vz
            for dx in (0, 1):
                parts.append(shift(vy, 2) if dx else vy)
    return jnp.concatenate(parts, axis=-1)


def grid_sample_3d_packed(vol_packed, grid, padding_mode: str = "zeros"):
    """grid_sample_3d on a corner-packed volume (pack_corners_3d)."""
    D, H, W, C8 = vol_packed.shape
    C = C8 // 8
    x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    z = (grid[..., 2] + 1.0) * 0.5 * (D - 1)
    sx, wx0, wx1 = _axis_patch_weights(x, W, padding_mode)
    sy, wy0, wy1 = _axis_patch_weights(y, H, padding_mode)
    sz, wz0, wz1 = _axis_patch_weights(z, D, padding_mode)

    patch = _gather_3d(vol_packed, sz, sy, sx)          # (..., 8C)
    out = None
    k = 0
    for wz in (wz0, wz1):
        for wy in (wy0, wy1):
            for wx in (wx0, wx1):
                w = (wz * wy * wx)[..., None]
                term = patch[..., k * C:(k + 1) * C] * w
                out = term if out is None else out + term
                k += 1
    return out


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
    # The sampling grid is FIXED and separable, so the resize is two
    # small hat-matrix matmuls (MXU) instead of a 2-D gather — the
    # gather formulation cost several ms per cost-volume build on TPU.
    # HIGHEST precision keeps f32 weight x value products exact (DEFAULT
    # would truncate operands to bf16); border clamp == torch
    # interpolate's edge behavior.
    ry = _resize_hat(ys, H)                     # (out_h, H)
    rx = _resize_hat(xs, W)                     # (out_w, W)
    t = jnp.einsum("oh,hwc->owc", ry, img,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("owc,xw->oxc", t, rx,
                      precision=jax.lax.Precision.HIGHEST)


def _resize_hat(coords, size: int):
    """(len(coords), size) bilinear weight matrix with border clamp:
    row i holds (1-frac) at clamp(floor(c_i)) and frac at
    clamp(floor(c_i)+1) (weights merge on the same index at the edges,
    summing to 1 — exactly grid_sample border padding)."""
    c0 = jnp.floor(coords)
    frac = (coords - c0)[:, None]
    i0 = jnp.clip(c0.astype(jnp.int32), 0, size - 1)[:, None]
    i1 = jnp.clip(c0.astype(jnp.int32) + 1, 0, size - 1)[:, None]
    ar = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], size), 1)
    return (jnp.where(ar == i0, 1.0 - frac, 0.0)
            + jnp.where(ar == i1, frac, 0.0))
