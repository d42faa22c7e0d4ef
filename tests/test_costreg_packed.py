"""Depth-packed CostRegNet (models/costreg_packed.py) equivalence with the
plain implementation, and the packed16 cost layout of build_cost_volume."""

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.models import init_mvsnet
from mvsnerf_tpu.models.mvsnet import cost_reg_apply, resolve_costreg_impl
from mvsnerf_tpu.models.costreg_packed import (cost_reg_packed_apply,
                                               pack_volume, unpack_volume)
import pytest
pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

RNG = np.random.default_rng(7)


def _setup(d=32, h=16, w=24, cin=41):
    p = init_mvsnet(jax.random.PRNGKey(0))["cost_reg_2"]
    x = jnp.asarray(RNG.standard_normal((1, d, h, w, cin)).astype(np.float32))
    return p, x


def test_pack_unpack_roundtrip():
    x = jnp.asarray(RNG.standard_normal((1, 32, 4, 6, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_volume(
        pack_volume(x, 16), 16)), np.asarray(x))


def test_packed_forward_matches_plain():
    p, x = _setup()
    a = cost_reg_apply(p, x)
    b = cost_reg_packed_apply(p, x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_packed_forward_matches_plain_running_stats():
    p, x = _setup()
    # perturb running stats so the branch is actually exercised
    p = {name: {k: ({s: v + 0.05 for s, v in sub.items()} if k == "bn"
                    else sub)
                for k, sub in layer.items()}
         for name, layer in p.items()}
    a = cost_reg_apply(p, x, use_running_stats=True)
    b = cost_reg_packed_apply(p, x, use_running_stats=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                               rtol=1e-5)


def test_packed_p0_8_matches_plain():
    p, x = _setup()
    a = cost_reg_apply(p, x)
    b = cost_reg_packed_apply(p, x, p0=8)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_packed_input_layout():
    p, x = _setup()
    a = cost_reg_packed_apply(p, x)
    b = cost_reg_packed_apply(p, pack_volume(x, 16), packed_input=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_grads_match_plain():
    p, x = _setup(d=32, h=8, w=8)

    def loss(fn, p_, x_):
        return jnp.sum(fn(p_, x_) ** 2 + 0.1 * fn(p_, x_))

    ga = jax.grad(lambda p_, x_: loss(cost_reg_apply, p_, x_),
                  argnums=(0, 1))(p, x)
    gb = jax.grad(lambda p_, x_: loss(cost_reg_packed_apply, p_, x_),
                  argnums=(0, 1))(p, x)
    for u, v in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = max(1e-6, float(jnp.max(jnp.abs(u))))
        np.testing.assert_allclose(np.asarray(v) / scale,
                                   np.asarray(u) / scale, atol=2e-4)


def test_packed_bf16_close_to_f32():
    p, x = _setup()
    a = cost_reg_packed_apply(p, x)
    b = cost_reg_packed_apply(p, x, dtype=jnp.bfloat16)
    # bf16 convs with f32 ABN stats: post-BN activations are O(1), so
    # absolute agreement at bf16 resolution
    assert float(jnp.max(jnp.abs(a - b))) < 0.15


def test_cost_layout_packed16_matches_dense():
    from mvsnerf_tpu.ops.homography import build_cost_volume

    h, w, c, d, pad, V = 26, 26, 8, 16, 3, 3
    feats = jnp.asarray(
        RNG.standard_normal((V, h, w, c)).astype(np.float32))
    imgs = jnp.asarray(
        RNG.uniform(0, 1, (V, 4 * h, 4 * w, 3)).astype(np.float32))
    intr = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]],
                    np.float32)
    ref4 = np.eye(4, dtype=np.float32)
    ref4[:3] = intr @ np.eye(4)[:3]
    ref_inv = np.linalg.inv(ref4)
    projs = []
    for i in range(V):
        a = 0.03 * (i - 1)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = [0.013 * i + 0.007, 0.003, 0.0]
        p4 = np.eye(4, dtype=np.float32)
        p4[:3] = intr @ w2c[:3]
        projs.append((p4 @ ref_inv)[:3])
    projs = jnp.asarray(np.stack(projs))
    depths = jnp.linspace(2.0, 5.0, d)

    for mode in ("pallas", "packed"):
        dense = build_cost_volume(imgs, feats, projs, depths, pad=pad,
                                  warp_fwd_mode=mode, warp_band=16)[0]
        packed = build_cost_volume(imgs, feats, projs, depths, pad=pad,
                                   warp_fwd_mode=mode, warp_band=16,
                                   cost_layout="packed16")[0]
        ct = dense.shape[-1]
        np.testing.assert_allclose(
            np.asarray(unpack_volume(packed, 16)[0, ..., :ct]),
            np.asarray(dense), atol=1e-5, err_msg=mode)


def test_resolve_costreg_impl():
    assert resolve_costreg_impl("auto", 128, 176, 208) == "packed"
    assert resolve_costreg_impl("auto", 128, 177, 208) == "plain"
    assert resolve_costreg_impl("auto", 8, 176, 208) == "plain"
    assert resolve_costreg_impl("plain", 128, 176, 208) == "plain"
