"""Banded affine warp vs grid_sample_2d (forward and backward)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsnerf_tpu.ops.interp import grid_sample_2d
from mvsnerf_tpu.ops.warp_fast import bilinear_warp_banded
pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

RNG = np.random.default_rng(41)


def make_affine_grid(h, w, hp, wp, d=3, angle=0.05, tx=0.2):
    """Plane-sweep-like grids: near-rectified affine coords per plane."""
    grids = []
    for k in range(d):
        ys, xs = np.meshgrid(np.arange(hp, dtype=np.float32),
                             np.arange(wp, dtype=np.float32), indexing="ij")
        a = angle * (k - d / 2) / d
        xs2 = np.cos(a) * xs - np.sin(a) * ys * 0.1 + tx * k
        ys2 = ys + 0.05 * k * np.sin(a) + np.sin(a) * xs * 0.1
        gx = xs2 / ((w - 1) / 2) - 1
        gy = ys2 / ((h - 1) / 2) - 1
        grids.append(np.stack([gx, gy], -1))
    return jnp.asarray(np.stack(grids).astype(np.float32))


@pytest.mark.parametrize("band", [16, 64])
def test_forward_matches_gather(band):
    h, w, C = 32, 40, 8
    src = jnp.asarray(RNG.standard_normal((h, w, C)).astype(np.float32))
    grid = make_affine_grid(h, w, 24, 36)
    ref = grid_sample_2d(src, grid, "zeros")
    out = bilinear_warp_banded(src, grid, row_block=8, band=band)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_with_heavy_rotation_uses_fallback():
    # 90-degree-ish warp: y-span per block is huge -> fallback path
    h, w, C = 24, 24, 4
    src = jnp.asarray(RNG.standard_normal((h, w, C)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(20, dtype=np.float32),
                         np.arange(20, dtype=np.float32), indexing="ij")
    gx = ys / ((w - 1) / 2) - 1  # transposed coords
    gy = xs / ((h - 1) / 2) - 1
    grid = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))
    ref = grid_sample_2d(src, grid, "zeros")
    out = bilinear_warp_banded(src, grid, row_block=8, band=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_backward_matches_autodiff():
    h, w, C = 32, 40, 8
    src = jnp.asarray(RNG.standard_normal((h, w, C)).astype(np.float32))
    grid = make_affine_grid(h, w, 24, 36)
    cot = jnp.asarray(
        RNG.standard_normal((3, 24, 36, C)).astype(np.float32))

    g_fast = jax.grad(lambda s: jnp.sum(
        bilinear_warp_banded(s, grid, 8, 16) * cot))(src)
    g_ref = jax.grad(lambda s: jnp.sum(
        grid_sample_2d(s, grid, "zeros") * cot))(src)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_backward_fallback_blocks():
    h, w, C = 24, 24, 4
    src = jnp.asarray(RNG.standard_normal((h, w, C)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(16, dtype=np.float32),
                         np.arange(16, dtype=np.float32), indexing="ij")
    gx = ys / ((w - 1) / 2) - 1
    gy = xs / ((h - 1) / 2) - 1
    grid = jnp.asarray(np.stack([gx, gy], -1)[None].astype(np.float32))
    cot = jnp.asarray(RNG.standard_normal((1, 16, 16, C)).astype(np.float32))
    g_fast = jax.grad(lambda s: jnp.sum(
        bilinear_warp_banded(s, grid, 8, 8) * cot))(src)
    g_ref = jax.grad(lambda s: jnp.sum(
        grid_sample_2d(s, grid, "zeros") * cot))(src)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_grid_gradient_matches():
    h, w, C = 16, 20, 4
    src = jnp.asarray(RNG.standard_normal((h, w, C)).astype(np.float32))
    grid = make_affine_grid(h, w, 8, 12, d=2)
    cot = jnp.asarray(RNG.standard_normal((2, 8, 12, C)).astype(np.float32))
    g_fast = jax.grad(lambda n: jnp.sum(
        bilinear_warp_banded(src, n, 8, 16, grid_grad=True) * cot))(grid)
    g_ref = jax.grad(lambda n: jnp.sum(
        grid_sample_2d(src, n, "zeros") * cot))(grid)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_packed_fwd_mode_matches():
    h, w, C = 32, 40, 8
    src = jnp.asarray(RNG.standard_normal((h, w, C)).astype(np.float32))
    grid = make_affine_grid(h, w, 24, 36)
    ref = grid_sample_2d(src, grid, "zeros")
    out = bilinear_warp_banded(src, grid, 8, 16, jnp.float32, False,
                               "packed")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # backward still the banded splat
    cot = jnp.asarray(RNG.standard_normal(ref.shape).astype(np.float32))
    g_fast = jax.grad(lambda s: jnp.sum(
        bilinear_warp_banded(s, grid, 8, 16, jnp.float32, False,
                             "packed") * cot))(src)
    g_ref = jax.grad(lambda s: jnp.sum(
        grid_sample_2d(s, grid, "zeros") * cot))(src)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)
