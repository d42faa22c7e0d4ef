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


def _dense_up(x_cm, kernel):
    """Reference: layers.py conv_transpose3d on channel-last."""
    from mvsnerf_tpu.models.layers import conv_transpose3d
    x = jnp.transpose(x_cm, (1, 2, 3, 0))[None]
    y = conv_transpose3d({"kernel": kernel}, x)
    return jnp.transpose(y[0], (3, 0, 1, 2))


def test_s2_forward_matches_dense():
    x, k = _setup(cin=5, cout=8, d=16, h=16, w=128)
    ref = _dense_conv_s1(x, k, stride=2)
    a = pc.build_a(k, P=4, stride=2)
    xe, xo = pc.split_w(pc.pad_dh(x))
    out = pc.conv3d_s2_dband(xe, xo, a, p=4, rh=4, interpret=True,
                             precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_up_forward_matches_dense():
    x, k = _setup(cin=6, cout=4, d=8, h=8, w=128)
    ref = _dense_up(x, k)
    a = pc.build_a_up(k, P=4)
    oe, oo = pc.conv3d_up_dband(pc.pad_dh(x), a, p=4, rh=4,
                                interpret=True,
                                precision=jax.lax.Precision.HIGHEST)
    out = pc.interleave_w(oe, oo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def _grad_check(loss_ref, loss_db, x, k, atol=1e-5):
    ga = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gb = jax.grad(loss_db, argnums=(0, 1))(x, k)
    for u, v, name in zip(ga, gb, ("d_x", "d_kernel")):
        scale = max(1e-6, float(jnp.max(jnp.abs(u))))
        np.testing.assert_allclose(np.asarray(v) / scale,
                                   np.asarray(u) / scale, atol=atol,
                                   err_msg=name)


def test_s2_grads_match_dense():
    x, k = _setup(cin=5, cout=4, d=16, h=16, w=128)

    def loss(y):
        return jnp.sum(y ** 2 + 0.3 * y)

    _grad_check(
        lambda x_, k_: loss(_dense_conv_s1(x_, k_, stride=2)),
        lambda x_, k_: loss(pc.conv3d_s2(x_, k_, 4, 4, True,
                                         jax.lax.Precision.HIGHEST)),
        x, k)


def test_up_grads_match_dense():
    x, k = _setup(cin=6, cout=4, d=8, h=8, w=128)

    def loss(y):
        return jnp.sum(y ** 2 + 0.3 * y)

    _grad_check(
        lambda x_, k_: loss(_dense_up(x_, k_)),
        lambda x_, k_: loss(pc.conv3d_up(x_, k_, 4, 4, True,
                                         jax.lax.Precision.HIGHEST)),
        x, k)


def test_costreg_dband_matches_plain():
    from mvsnerf_tpu.models import init_mvsnet
    from mvsnerf_tpu.models.mvsnet import cost_reg_apply
    p = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]
    x = jnp.asarray(
        RNG.standard_normal((1, 32, 16, 24, 41)).astype(np.float32))
    ref = cost_reg_apply(p, x)[0]
    x_cm = jnp.transpose(x[0], (3, 0, 1, 2))
    out = pc.cost_reg_dband_apply(p, x_cm, interpret=True,
                                  precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_costreg_dband_grads_match_plain():
    from mvsnerf_tpu.models import init_mvsnet
    from mvsnerf_tpu.models.mvsnet import cost_reg_apply
    p = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]
    x = jnp.asarray(
        RNG.standard_normal((1, 16, 8, 8, 41)).astype(np.float32))

    def loss_ref(p_, x_):
        y = cost_reg_apply(p_, x_)
        return jnp.sum(y ** 2 + 0.1 * y)

    def loss_db(p_, x_):
        y = pc.cost_reg_dband_apply(
            p_, jnp.transpose(x_[0], (3, 0, 1, 2)), interpret=True,
            precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(y ** 2 + 0.1 * y)

    ga = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    gb = jax.grad(loss_db, argnums=(0, 1))(p, x)
    # 2e-3: BN-stat grads chain E[x^2]-E[x]^2 through 10 layers, so f32
    # summation-order differences amplify (each conv's own grads match to
    # 1e-5, test_s*_grads_match_dense; the forward matches to 5e-5)
    for u, v in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = max(1e-6, float(jnp.max(jnp.abs(u))))
        np.testing.assert_allclose(np.asarray(v) / scale,
                                   np.asarray(u) / scale, atol=2e-3)


def test_mvsnet_dband_impl_matches_packed():
    """mvsnet_apply(costreg_impl='dband') over the fused Pallas sweep's
    cmajor layout matches the packed path end-to-end."""
    from mvsnerf_tpu.models import init_mvsnet
    from mvsnerf_tpu.models.mvsnet import mvsnet_apply
    from tests.test_pallas_sweep import _scene

    h, w, c, d, pad, V = 26, 26, 8, 16, 3, 3
    feats, imgs_small, projs, depths = _scene(V, h, w, c, d)
    del feats, imgs_small
    imgs = jnp.asarray(
        RNG.uniform(0.1, 0.9, (V, 4 * h, 4 * w, 3)).astype(np.float32))
    params = init_mvsnet(jax.random.PRNGKey(2))
    ref = mvsnet_apply(params, imgs, projs, jnp.asarray([2.0, 5.0]),
                       pad=pad, n_planes=d, warp_mode="pallas",
                       costreg_impl="packed")[0]
    out = mvsnet_apply(params, imgs, projs, jnp.asarray([2.0, 5.0]),
                       pad=pad, n_planes=d, warp_mode="pallas",
                       costreg_impl="dband")[0]
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-3, rtol=1e-3)


def test_costreg_dband_bf16_hard_errors():
    """The bf16 dband variant never compiled on device (Mosaic relocates
    bf16 inputs to VMEM where window-DMA slice rules differ) and f32
    dband lost its device A/B decisively, so the flag hard-errors with
    the recorded explanation (VERDICT r3 weak #6 / task 8) instead of
    silently running interpret-only."""
    from mvsnerf_tpu.models import init_mvsnet
    p = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]
    x_cm = jnp.asarray(
        RNG.standard_normal((41, 16, 8, 8)).astype(np.float32))
    with pytest.raises(NotImplementedError, match="dband bf16"):
        pc.cost_reg_dband_apply(p, x_cm, interpret=True,
                                dtype=jnp.bfloat16)


def test_costreg_dband_rows_not_multiple_of_8():
    # Production DTU 640x512 hits H=44/22 at the deep levels; the row
    # block must then span the whole axis (Mosaic: second-to-last block
    # dim % 8 == 0 or == axis). Levels here: H 24 -> 12 -> 6 -> 3.
    from mvsnerf_tpu.models import init_mvsnet
    from mvsnerf_tpu.models.mvsnet import cost_reg_apply
    assert pc._pick_rows(44) == 44 and pc._pick_rows(22) == 22
    assert pc._pick_rows(176) == 8 and pc._pick_rows(88) == 8
    p = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]
    x = jnp.asarray(
        RNG.standard_normal((1, 16, 24, 16, 41)).astype(np.float32))
    ref = cost_reg_apply(p, x)[0]
    out = pc.cost_reg_dband_apply(p, jnp.transpose(x[0], (3, 0, 1, 2)),
                                  interpret=True,
                                  precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
