"""Space-to-depth packed FeatureNet (models/featurenet_packed.py)
equivalence with the plain implementation."""

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.models.mvsnet import (feature_net_apply, init_feature_net,
                                       resolve_featurenet_impl)
from mvsnerf_tpu.models.featurenet_packed import (feature_net_packed_apply,
                                                  pack_image, unpack_image)
import pytest
pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

RNG = np.random.default_rng(11)


def _setup(b=2, h=32, w=48):
    p = init_feature_net(jax.random.PRNGKey(3))
    x = jnp.asarray(RNG.standard_normal((b, h, w, 3)).astype(np.float32))
    return p, x


def test_pack_unpack_roundtrip():
    x = jnp.asarray(RNG.standard_normal((2, 16, 24, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_image(
        pack_image(x, 4), 4)), np.asarray(x))


def test_packed_forward_matches_plain():
    p, x = _setup()
    a = feature_net_apply(p, x)
    b = feature_net_packed_apply(p, x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_packed_forward_matches_plain_running_stats():
    p, x = _setup()
    p = {name: ([{k: ({s: v + 0.05 for s, v in sub.items()} if k == "bn"
                      else sub) for k, sub in layer.items()}
                 for layer in group] if isinstance(group, list) else group)
         for name, group in p.items()}
    a = feature_net_apply(p, x, use_running_stats=True)
    b = feature_net_packed_apply(p, x, use_running_stats=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                               rtol=1e-5)


def test_packed_grads_match_plain():
    p, x = _setup(b=1, h=16, w=16)

    def loss(fn, p_, x_):
        return jnp.sum(fn(p_, x_) ** 2 + 0.1 * fn(p_, x_))

    ga = jax.grad(lambda p_, x_: loss(feature_net_apply, p_, x_),
                  argnums=(0, 1))(p, x)
    gb = jax.grad(lambda p_, x_: loss(feature_net_packed_apply, p_, x_),
                  argnums=(0, 1))(p, x)
    for u, v in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        scale = max(1e-6, float(jnp.max(jnp.abs(u))))
        np.testing.assert_allclose(np.asarray(v) / scale,
                                   np.asarray(u) / scale, atol=2e-4)


def test_packed_matches_golden_checkpoint():
    """With the real mvsnerf-v0 FeatureNet weights (when present): the
    packed path must track the plain one, which is itself golden-tested
    against torch (tests/test_models_golden.py)."""
    import os
    ckpt = "/root/reference/ckpts/mvsnerf-v0.tar"
    if not os.path.exists(ckpt):
        pytest.skip("reference checkpoint not in image")
    from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
    p = load_reference_checkpoint(ckpt)["mvsnet"]["feature"]
    x = jnp.asarray(RNG.standard_normal((3, 64, 80, 3)).astype(np.float32))
    a = feature_net_apply(p, x)
    b = feature_net_packed_apply(p, x)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_resolve_featurenet_impl():
    assert resolve_featurenet_impl("auto", 512, 640) == "packed"
    assert resolve_featurenet_impl("auto", 510, 640) == "plain"
    assert resolve_featurenet_impl("plain", 512, 640) == "plain"
    assert resolve_featurenet_impl("packed", 510, 640) == "packed"
