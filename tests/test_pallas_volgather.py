"""Fused Pallas volume gather/splat vs grid_sample_3d autodiff
(interpret mode on CPU; device validation in
scripts/validate_volgather_tpu.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsnerf_tpu.ops.interp import grid_sample_3d
from mvsnerf_tpu.ops.pallas_volgather import sample_volume_pallas
from tests.test_volume_grad import stratified_ndc

pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

RNG = np.random.default_rng(7)

D, H, W, C = 16, 12, 14, 4     # W -> WL 16 exercises the lane pad


@pytest.mark.parametrize("n_samples", [16, 32])
def test_forward_matches_grid_sample(n_samples):
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(8, n_samples)
    out = sample_volume_pallas(vol, ndc, 4)
    ref = grid_sample_3d(vol, ndc * 2 - 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_volume_grad_matches_autodiff():
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(8, 32, key=1)
    cot = jnp.asarray(RNG.standard_normal((8, 32, C)).astype(np.float32))

    g_fast = jax.grad(
        lambda v: jnp.sum(sample_volume_pallas(v, ndc, 4) * cot))(vol)
    g_ref = jax.grad(
        lambda v: jnp.sum(grid_sample_3d(v, ndc * 2 - 1) * cot))(vol)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_ndc_grad_matches_autodiff():
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(8, 16, key=2)
    cot = jnp.asarray(RNG.standard_normal((8, 16, C)).astype(np.float32))

    g_fast = jax.grad(
        lambda n: jnp.sum(sample_volume_pallas(vol, n, 4) * cot))(ndc)
    g_ref = jax.grad(
        lambda n: jnp.sum(grid_sample_3d(vol, n * 2 - 1) * cot))(ndc)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_multi_lane_group_grad():
    """W large enough that the backward runs > 1 lane group (WL*C > 128)."""
    d, h, w, c = 16, 8, 40, 8    # WL = 64 -> 512 lanes -> 4 groups
    vol = jnp.asarray(RNG.standard_normal((d, h, w, c)).astype(np.float32))
    ndc = stratified_ndc(8, 16, key=3)
    cot = jnp.asarray(RNG.standard_normal((8, 16, c)).astype(np.float32))

    out = sample_volume_pallas(vol, ndc, 4)
    ref = grid_sample_3d(vol, ndc * 2 - 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    g_fast = jax.grad(
        lambda v: jnp.sum(sample_volume_pallas(v, ndc, 4) * cot))(vol)
    g_ref = jax.grad(
        lambda v: jnp.sum(grid_sample_3d(v, ndc * 2 - 1) * cot))(vol)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_bf16_compute_dtype_close():
    """compute_dtype=bf16 quantizes the MXU operands (~2^-9 relative) but
    must stay within interpolation-level tolerance of the exact result."""
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(8, 32, key=4)
    cot = jnp.asarray(RNG.standard_normal((8, 32, C)).astype(np.float32))

    out = sample_volume_pallas(vol, ndc, 4, None, jnp.bfloat16)
    ref = grid_sample_3d(vol, ndc * 2 - 1)
    assert float(jnp.max(jnp.abs(out - ref))) < 3e-2
    g_fast = jax.grad(lambda v: jnp.sum(
        sample_volume_pallas(v, ndc, 4, None, jnp.bfloat16) * cot))(vol)
    g_ref = jax.grad(
        lambda v: jnp.sum(grid_sample_3d(v, ndc * 2 - 1) * cot))(vol)
    assert float(jnp.max(jnp.abs(g_fast - g_ref))) < 3e-2
