"""grid_sample parity vs torch (the semantics the reference relies on).

Every reference call site uses align_corners=True; padding 'zeros' or
'border' (utils.py:320,322,378,382,625; models.py:949).
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mvsnerf_tpu.ops import (
    grid_sample_2d,
    grid_sample_3d,
    index_point_feature,
    interpolate_bilinear_resize,
)

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(padding):
    H, W, C = 7, 9, 4
    img = RNG.standard_normal((H, W, C)).astype(np.float32)
    # include far out-of-range coords
    grid = (RNG.standard_normal((5, 11, 2)) * 1.2).astype(np.float32)

    ours = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), padding)
    ref = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode=padding, align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_grid_sample_3d_matches_torch(padding):
    D, H, W, C = 5, 6, 7, 3
    vol = RNG.standard_normal((D, H, W, C)).astype(np.float32)
    grid = (RNG.standard_normal((4, 3, 8, 3)) * 1.2).astype(np.float32)

    ours = grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid), padding)
    # torch: vol (1, C, D, H, W); grid (1, D', H', W', 3) with (x, y, z)
    ref = F.grid_sample(
        torch.from_numpy(vol).permute(3, 0, 1, 2)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode=padding, align_corners=True,
    )[0].permute(1, 2, 3, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_index_point_feature_matches_reference_formula():
    # utils.py:381-382: grid = ndc * 2 - 1, zeros padding.
    D, H, W, C = 4, 5, 6, 8
    vol = RNG.standard_normal((D, H, W, C)).astype(np.float32)
    ndc = RNG.uniform(0, 1, (10, 3)).astype(np.float32)
    ours = index_point_feature(jnp.asarray(vol), jnp.asarray(ndc))
    ref = F.grid_sample(
        torch.from_numpy(vol).permute(3, 0, 1, 2)[None],
        torch.from_numpy(ndc * 2 - 1).view(1, 1, 1, -1, 3),
        mode="bilinear", align_corners=True,
    )[0, :, 0, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("align", [False, True])
def test_bilinear_resize_matches_torch(align):
    H, W, C = 12, 16, 3
    img = RNG.standard_normal((H, W, C)).astype(np.float32)
    oh, ow = 5, 7
    ours = interpolate_bilinear_resize(jnp.asarray(img), oh, ow,
                                       align_corners=align)
    ref = F.interpolate(
        torch.from_numpy(img).permute(2, 0, 1)[None], (oh, ow),
        mode="bilinear", align_corners=align,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_grid_sample_2d_exact_at_pixels():
    H, W, C = 4, 4, 2
    img = RNG.standard_normal((H, W, C)).astype(np.float32)
    # align_corners=True: grid -1 -> pixel 0, +1 -> pixel W-1
    grid = np.array([[[-1.0, -1.0], [1.0, 1.0]]], np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out[0, 0], img[0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], img[H - 1, W - 1], atol=1e-6)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_packed_sampling_matches_unpacked(padding):
    from mvsnerf_tpu.ops.interp import grid_sample_2d_packed, pack_corners_2d
    H, W, C = 9, 11, 3
    img = RNG.standard_normal((H, W, C)).astype(np.float32)
    grid = (RNG.standard_normal((6, 7, 2)) * 1.2).astype(np.float32)
    ref = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), padding)
    packed = pack_corners_2d(jnp.asarray(img))
    out = grid_sample_2d_packed(packed, jnp.asarray(grid), padding)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_packed_3d_matches_unpacked(padding):
    from mvsnerf_tpu.ops.interp import grid_sample_3d_packed, pack_corners_3d
    D, H, W, C = 5, 7, 9, 4
    vol = RNG.standard_normal((D, H, W, C)).astype(np.float32)
    grid = (RNG.standard_normal((6, 8, 3)) * 1.2).astype(np.float32)
    ref = grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid), padding)
    out = grid_sample_3d_packed(pack_corners_3d(jnp.asarray(vol)),
                                jnp.asarray(grid), padding)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
