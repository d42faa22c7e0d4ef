"""v2 y-sorted fused volume gather/splat vs grid_sample_3d autodiff
(interpret mode on CPU; device validation in
scripts/validate_volgather_tpu.py --v2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsnerf_tpu.ops.interp import grid_sample_3d
from mvsnerf_tpu.ops.pallas_volgather2 import (sample_volume_sorted,
                                               volgather2_fits,
                                               sort_rays_by_y)
from tests.test_volume_grad import stratified_ndc

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(11)

D, H, W, C = 16, 24, 14, 4


def sorted_fn(vol, ndc, hb=16, nb=8):
    return sample_volume_sorted(vol, ndc, band_k=4, hb=hb, nb=nb,
                                compute_dtype=jnp.float32)


def test_forward_matches_grid_sample():
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(16, 32, key=1)
    out = sorted_fn(vol, ndc)
    ref = grid_sample_3d(vol, ndc * 2 - 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_contract_is_checked_per_batch():
    """Mid-column-sorted rays with a tight hb must route to the banded
    fallback (still exact), not clamp silently."""
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(16, 32, key=2)
    order, _ = sort_rays_by_y(ndc)
    fits = volgather2_fits(jnp.take(ndc, order, axis=0),
                           vol.shape, 4, 8, 16)
    assert not bool(fits)  # random xy over 24 rows cannot fit 8-row bands
    out = sample_volume_sorted(vol, ndc, band_k=4, hb=8, nb=16,
                               compute_dtype=jnp.float32)
    ref = grid_sample_3d(vol, ndc * 2 - 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_volume_grad_matches_autodiff():
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(16, 32, key=3)
    cot = jnp.asarray(RNG.standard_normal((16, 32, C)).astype(np.float32))

    g_fast = jax.grad(
        lambda v: jnp.sum(sorted_fn(v, ndc) * cot))(vol)
    g_ref = jax.grad(
        lambda v: jnp.sum(grid_sample_3d(v, ndc * 2 - 1) * cot))(vol)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_ndc_grad_matches_autodiff():
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(16, 16, key=4)
    cot = jnp.asarray(RNG.standard_normal((16, 16, C)).astype(np.float32))

    g_fast = jax.grad(
        lambda n: jnp.sum(sorted_fn(vol, n) * cot))(ndc)
    g_ref = jax.grad(
        lambda n: jnp.sum(grid_sample_3d(vol, n * 2 - 1) * cot))(ndc)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_multi_lane_group_and_oob():
    """WL*C > 128 (multiple bwd lane groups) + out-of-bounds xy."""
    d, h, w, c = 16, 16, 40, 8
    vol = jnp.asarray(RNG.standard_normal((d, h, w, c)).astype(np.float32))
    rng = np.random.default_rng(5)
    t = np.linspace(0, 1, 32)
    z = np.broadcast_to(t, (16, 32)).copy()
    z += rng.uniform(-0.01, 0.01, z.shape)
    xy = rng.uniform(-0.2, 1.2, (16, 32, 2))     # heavy OOB
    ndc = jnp.asarray(np.concatenate([xy, z[..., None]], -1)
                      .astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((16, 32, c)).astype(np.float32))

    out = sorted_fn(vol, ndc)
    ref = grid_sample_3d(vol, ndc * 2 - 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    g_fast = jax.grad(
        lambda v: jnp.sum(sorted_fn(v, ndc) * cot))(vol)
    g_ref = jax.grad(
        lambda v: jnp.sum(grid_sample_3d(v, ndc * 2 - 1) * cot))(vol)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_tight_kernel_band_with_safe_fallback():
    """kernel_band_k tighter than the caller's safe band: exact when the
    per-batch contract holds, and the fallback keeps the SAFE band when
    it doesn't (an optimistic kernel band can never corrupt results)."""
    vol = jnp.asarray(RNG.standard_normal((32, H, W, C)).astype(np.float32))
    # ray-structured batch: per-ray constant xy, stratified z with D == S
    # so each column spans ~one sample spacing -> k=2 band fits
    rng = np.random.default_rng(6)
    n, s = 16, 32
    t = np.linspace(0, 1, s)
    z = np.broadcast_to(t, (n, s)).copy()
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    upper = np.concatenate([mids, z[:, -1:]], -1)
    lower = np.concatenate([z[:, :1], mids], -1)
    z = lower + (upper - lower) * rng.uniform(size=z.shape)
    xy = np.broadcast_to(rng.uniform(0, 1, (n, 1, 2)), (n, s, 2))
    ndc = jnp.asarray(np.concatenate([xy, z[..., None]], -1)
                      .astype(np.float32))

    order, _ = sort_rays_by_y(ndc)
    assert bool(volgather2_fits(jnp.take(ndc, order, axis=0),
                                vol.shape, 2, 16, 8))
    out = sample_volume_sorted(vol, ndc, band_k=4, hb=16, nb=8,
                               compute_dtype=jnp.float32, kernel_band_k=2)
    ref = grid_sample_3d(vol, ndc * 2 - 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # random-xy batch: k=2 contract fails -> banded fallback at SAFE k=4
    ndc_bad = stratified_ndc(16, 32, key=7)
    out_bad = sample_volume_sorted(vol, ndc_bad, band_k=4, hb=8, nb=16,
                                   compute_dtype=jnp.float32,
                                   kernel_band_k=2)
    ref_bad = grid_sample_3d(vol, ndc_bad * 2 - 1)
    np.testing.assert_allclose(np.asarray(out_bad), np.asarray(ref_bad),
                               atol=1e-4, rtol=1e-4)
