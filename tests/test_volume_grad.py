"""Banded-splat volume gradient vs plain autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsnerf_tpu.ops.interp import grid_sample_3d
from mvsnerf_tpu.ops.volume_grad import sample_volume_train
pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

RNG = np.random.default_rng(23)

D, H, W, C = 16, 12, 14, 4


def stratified_ndc(n_rays, n_samples, key=0):
    """NDC samples with the training structure: per-ray stratified z,
    arbitrary xy."""
    rng = np.random.default_rng(key)
    t = np.linspace(0, 1, n_samples)
    z = np.broadcast_to(t, (n_rays, n_samples)).copy()
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    upper = np.concatenate([mids, z[:, -1:]], -1)
    lower = np.concatenate([z[:, :1], mids], -1)
    z = lower + (upper - lower) * rng.uniform(size=z.shape)
    xy = rng.uniform(-0.1, 1.1, (n_rays, n_samples, 2))  # include OOB
    return jnp.asarray(np.concatenate([xy, z[..., None]], -1)
                       .astype(np.float32))


@pytest.mark.parametrize("n_samples", [16, 32])
def test_forward_matches_grid_sample(n_samples):
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(8, n_samples)
    out = sample_volume_train(vol, ndc)
    ref = grid_sample_3d(vol, ndc * 2 - 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("n_samples", [16, 32])
def test_volume_grad_matches_autodiff(n_samples):
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(8, n_samples, key=1)
    cot = jnp.asarray(
        RNG.standard_normal((8, n_samples, C)).astype(np.float32))

    def loss_fast(v):
        return jnp.sum(sample_volume_train(v, ndc) * cot)

    def loss_ref(v):
        return jnp.sum(grid_sample_3d(v, ndc * 2 - 1) * cot)

    g_fast = jax.grad(loss_fast)(vol)
    g_ref = jax.grad(loss_ref)(vol)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_ndc_grad_matches_autodiff():
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(4, 16, key=2)
    cot = jnp.asarray(RNG.standard_normal((4, 16, C)).astype(np.float32))

    g_fast = jax.grad(
        lambda n: jnp.sum(sample_volume_train(vol, n) * cot))(ndc)
    g_ref = jax.grad(
        lambda n: jnp.sum(grid_sample_3d(vol, n * 2 - 1) * cot))(ndc)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_importance_sampled_zs():
    """Merged coarse+fine depths stay column-banded after sort (the
    fine-tuning N_importance path)."""
    n_rays, n_coarse, n_fine = 8, 32, 16
    rng = np.random.default_rng(3)
    t = np.linspace(0, 1, n_coarse)
    z_c = np.broadcast_to(t, (n_rays, n_coarse))
    # fine samples concentrated near z=0.5
    z_f = np.clip(rng.normal(0.5, 0.05, (n_rays, n_fine)), 0, 1)
    z = np.sort(np.concatenate([z_c, z_f], -1), -1)
    xy = rng.uniform(0, 1, (n_rays, n_coarse + n_fine, 2))
    ndc = jnp.asarray(np.concatenate([xy, z[..., None]], -1)
                      .astype(np.float32))
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    cot = jnp.asarray(RNG.standard_normal(ndc.shape[:2] + (C,))
                      .astype(np.float32))
    g_fast = jax.grad(
        lambda v: jnp.sum(sample_volume_train(v, ndc) * cot))(vol)
    g_ref = jax.grad(
        lambda v: jnp.sum(grid_sample_3d(v, ndc * 2 - 1) * cot))(vol)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_banded_forward_matches_gather():
    from mvsnerf_tpu.ops.volume_grad import sample_volume_banded
    vol = jnp.asarray(RNG.standard_normal((D, H, W, C)).astype(np.float32))
    ndc = stratified_ndc(8, 16, key=5)
    ref = grid_sample_3d(vol, ndc * 2 - 1)
    out32 = sample_volume_banded(vol, ndc, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out32), np.asarray(ref), atol=1e-5)
    out16 = sample_volume_banded(vol, ndc)  # bf16 multiply
    assert float(jnp.abs(out16 - ref).max()) < 0.05
