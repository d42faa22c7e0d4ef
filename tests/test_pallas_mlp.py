"""Fused v0 MLP train kernel (ops/pallas_mlp.py) vs the XLA reference
implementation (models/nerf_mlp.mlp_v0_apply): forward parity, parameter
gradients, and the feats-slice input gradient. Interpret mode on CPU;
device validation in scripts/validate_mlp_tpu.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsnerf_tpu.models import init_mlp, mlp_apply
from mvsnerf_tpu.ops.pallas_mlp import (IN_CH, IN_FEAT, IN_PTS,
                                        mlp_v0_fits, mlp_v0_train,
                                        pack_mlp_v0, unpack_grads_v0)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    params = init_mlp(jax.random.PRNGKey(0), "v0")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64, IN_CH)).astype(np.float32))
    return params, x


def _ref(params, x):
    import mvsnerf_tpu.models.nerf_mlp as nm
    import mvsnerf_tpu.ops.precision as pr
    old = nm._MLP_PRECISION
    nm._MLP_PRECISION = pr._LEVELS["highest"]
    try:
        return mlp_apply(params, x, "v0", IN_PTS, 3)
    finally:
        nm._MLP_PRECISION = old


def test_forward_parity(setup):
    params, x = setup
    ref = _ref(params, x)
    out = mlp_v0_train(params, x, "high", True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=0)


def test_pack_unpack_roundtrip_structure(setup):
    params, _ = setup
    w, b = pack_mlp_v0(params)
    assert w.shape == (13, 128, 128) and b.shape == (16, 128)
    g = unpack_grads_v0(params, w, b)
    assert jax.tree.structure(g) == jax.tree.structure(params)
    for a, bb in zip(jax.tree.leaves(g), jax.tree.leaves(params)):
        assert a.shape == bb.shape


def test_param_grads_match_autodiff(setup):
    params, x = setup
    cot = jnp.asarray(np.random.default_rng(2).standard_normal(
        (4, 64, 4)).astype(np.float32))

    ref_g = jax.grad(lambda p: jnp.sum(_ref(p, x) * cot))(params)
    ker_g = jax.grad(
        lambda p: jnp.sum(mlp_v0_train(p, x, "high", True) * cot))(params)

    flat_k = jax.tree.leaves(ker_g)
    flat_r = jax.tree.leaves(ref_g)
    for a, b in zip(flat_k, flat_r):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2 * scale, rtol=0)


def test_feats_input_grad(setup):
    params, x = setup
    cot = jnp.asarray(np.random.default_rng(3).standard_normal(
        (4, 64, 4)).astype(np.float32))

    ref_gx = jax.grad(lambda xx: jnp.sum(_ref(params, xx) * cot))(x)
    ker_gx = jax.grad(
        lambda xx: jnp.sum(mlp_v0_train(params, xx, "high", True) * cot))(x)

    feats = slice(IN_PTS, IN_PTS + IN_FEAT)
    scale = float(jnp.max(jnp.abs(ref_gx[..., feats])))
    np.testing.assert_allclose(np.asarray(ker_gx[..., feats]),
                               np.asarray(ref_gx[..., feats]),
                               atol=2e-2 * scale, rtol=0)
    # pts/views slices are structurally zero by the training contract
    assert float(jnp.max(jnp.abs(ker_gx[..., :IN_PTS]))) == 0.0
    assert float(jnp.max(jnp.abs(ker_gx[..., IN_PTS + IN_FEAT:]))) == 0.0


def test_fits_gate(setup):
    params, x = setup
    assert mlp_v0_fits(params, x)
    assert not mlp_v0_fits(params, x[..., :-1])
    assert not mlp_v0_fits({"pts_linears": []}, x)


def test_default_precision_runs(setup):
    params, x = setup
    out = mlp_v0_train(params, x, "default", True)
    ref = _ref(params, x)
    # bf16 single-pass: loose tolerance, just sanity (rgb in [0,1])
    assert float(jnp.max(jnp.abs(out - ref))) < 0.2
