"""Depth-band Pallas U-Net conv kernels (ops/pallas_costreg.py) vs the
dense lax convs (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsnerf_tpu.ops import pallas_costreg as pc

pytestmark = pytest.mark.slow  # interpret-mode Pallas tier

RNG = np.random.default_rng(21)


def _dense_conv_s1(x_cm, kernel, stride=1):
    """Reference: lax conv on the channel-last layout."""
    x = jnp.transpose(x_cm, (1, 2, 3, 0))[None]         # (1, D, H, W, C)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,) * 3,
        padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return jnp.transpose(y[0], (3, 0, 1, 2))            # (Cout, D, H, W)


def _setup(cin=5, cout=8, d=16, h=16, w=128):
    x = jnp.asarray(RNG.standard_normal((cin, d, h, w)).astype(np.float32))
    k = jnp.asarray(
        RNG.standard_normal((3, 3, 3, cin, cout)).astype(np.float32) * 0.2)
    return x, k


def test_s1_forward_matches_dense():
    x, k = _setup()
    ref = _dense_conv_s1(x, k)
    a = pc.build_a(k, P=8)
    out = pc.conv3d_s1_dband(pc.pad_dh(x), a, p=8, rh=8, interpret=True,
                             precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_s1_forward_block_sizes():
    x, k = _setup(cin=3, cout=4, d=8, h=8, w=128)
    ref = _dense_conv_s1(x, k)
    for p, rh in ((4, 4), (8, 2), (2, 8)):
        a = pc.build_a(k, P=p)
        out = pc.conv3d_s1_dband(pc.pad_dh(x), a, p=p, rh=rh,
                                 interpret=True,
                                 precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=f"p={p} rh={rh}")


def test_s1_grads_match_dense():
    x, k = _setup(cin=5, cout=4, d=8, h=8, w=128)

    def loss_ref(x_, k_):
        y = _dense_conv_s1(x_, k_)
        return jnp.sum(y ** 2 + 0.3 * y)

    def loss_db(x_, k_):
        y = pc.conv3d_s1(x_, k_, 4, 4, True, jax.lax.Precision.HIGHEST)
        return jnp.sum(y ** 2 + 0.3 * y)

    ga = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gb = jax.grad(loss_db, argnums=(0, 1))(x, k)
    for u, v, name in zip(ga, gb, ("d_x", "d_kernel")):
        scale = max(1e-6, float(jnp.max(jnp.abs(u))))
        np.testing.assert_allclose(np.asarray(v) / scale,
                                   np.asarray(u) / scale, atol=1e-5,
                                   err_msg=name)
