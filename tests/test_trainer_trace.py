"""FAST-tier trace tests: every trainer's step closure is TRACED (via
jax.eval_shape — no compilation) so Python-level defects inside the
traced functions (NameError from a missing import, shape mismatches)
surface in the fast tier.

Why: round 4 shipped a NameError in FinetuneSystem's render_fn
(`resolve_mlp_impl` used but not imported) that only the middle tier
exercises — the fast tier was green while the fine-tune path was broken
(ADVICE r4 high). These tests trace the exact closures the trainers jit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsnerf_tpu.config import config_parser

pytestmark = pytest.mark.slow  # system construction is compile-heavy (see pytest.ini)

from test_train import PAD, FakeDTUDataset, FakeSceneDataset, H, W


def _args(extra=""):
    return config_parser(cmd=f"--pad {PAD} --N_samples 16 --batch_size 64 "
                             f"--with_rgb_loss --ckpt None {extra}")


@pytest.mark.parametrize("extra", ["", "--mlp_impl pallas"])
def test_finetune_step_traces(extra):
    from mvsnerf_tpu.train import FinetuneSystem

    ds = FakeSceneDataset()
    sys_ = FinetuneSystem(_args(extra), ds)
    rays = jnp.asarray(ds.all_rays[:64])
    rgbs = jnp.asarray(ds.all_rgbs[:64])
    out = jax.eval_shape(sys_._step, sys_.params, sys_.opt_state, rays,
                         rgbs, jax.random.PRNGKey(0))
    assert out[2].shape == ()  # loss scalar


def test_generalizable_step_traces():
    from mvsnerf_tpu.train import GeneralizableSystem

    args = _args("--with_depth_loss --with_depth")
    sys_ = GeneralizableSystem(args)
    ds = FakeDTUDataset(n=1)
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()}
    _, loss_fn = sys_._make_step((H, W), args.batch_size, args.N_samples,
                                 100)
    (loss, aux), _ = jax.eval_shape(
        jax.value_and_grad(loss_fn, has_aux=True), sys_.params, batch,
        jax.random.PRNGKey(0))
    assert loss.shape == ()


def test_fusion_step_traces():
    from mvsnerf_tpu.train import FusionFinetuneSystem

    ds = FakeSceneDataset()
    FusionFinetuneSystem.VOLUME_DIM = (16, 16, 16)
    sys_ = FusionFinetuneSystem(_args(), ds)
    rays = jnp.asarray(ds.all_rays[:64])
    rgbs = jnp.asarray(ds.all_rgbs[:64])
    out = jax.eval_shape(sys_._step, sys_.params, sys_.opt_state, rays,
                         rgbs, jax.random.PRNGKey(0), sys_.density_volume)
    assert out[2].shape == ()
