"""Fused Pallas render kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

CKPT = "/root/reference/ckpts/mvsnerf-v0.tar"

RNG = np.random.default_rng(21)


@pytest.fixture(scope="module")
def mlp():
    import os
    if os.path.exists(CKPT):
        from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
        return load_reference_checkpoint(CKPT)["mlp"]
    from mvsnerf_tpu.models import init_mlp
    return init_mlp(jax.random.PRNGKey(0), "v0")


def test_fused_render_matches_xla(mlp):
    from mvsnerf_tpu.ops.pallas_kernels import (fused_render_v0,
                                                pack_v0_weights)
    from mvsnerf_tpu.render.renderer import run_network
    from mvsnerf_tpu.ops.compositing import raw2outputs

    N, S = 37, 16
    xyz = jnp.asarray(RNG.uniform(0, 1, (N, S, 3)).astype(np.float32))
    feats = jnp.asarray(RNG.standard_normal((N, S, 20)).astype(np.float32))
    dirs = jnp.asarray(RNG.standard_normal((N, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    z_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (N, S))

    # XLA reference
    raw = run_network(mlp, xyz, dirs, feats, net_type="v0")
    ref = raw2outputs(raw, z_vals)

    out = fused_render_v0(pack_v0_weights(mlp), xyz, feats, dirs, z_vals,
                          rays_per_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["acc"]),
                               np.asarray(ref["acc"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["weights"]),
                               np.asarray(ref["weights"]), atol=2e-4)


def test_fused_render_pads_ragged_tiles(mlp):
    from mvsnerf_tpu.ops.pallas_kernels import (fused_render_v0,
                                                pack_v0_weights)
    N, S = 10, 8  # N not divisible by rays_per_tile
    xyz = jnp.asarray(RNG.uniform(0, 1, (N, S, 3)).astype(np.float32))
    feats = jnp.asarray(RNG.standard_normal((N, S, 20)).astype(np.float32))
    dirs = jnp.ones((N, 3)) / np.sqrt(3)
    z_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (N, S))
    out = fused_render_v0(pack_v0_weights(mlp), xyz, feats, dirs, z_vals,
                          rays_per_tile=8, interpret=True)
    assert out["rgb"].shape == (N, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
