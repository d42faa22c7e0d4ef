"""Multi-device semantics on the virtual 8-device CPU mesh: ray-sharded
rendering equals single-device rendering; the DP train step runs and learns.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from mvsnerf_tpu.models import init_mlp
from mvsnerf_tpu.parallel import make_mesh, shard_rays_render, \
    data_parallel_step, replicate
from mvsnerf_tpu.render import render_rays
pytestmark = [pytest.mark.slow, pytest.mark.e2e]  # train-loop tier (see pytest.ini)

RNG = np.random.default_rng(11)

V, H, W, D = 3, 16, 16, 8
N_RAYS, N_SAMPLES = 64, 8


def make_inputs():
    mlp = init_mlp(jax.random.PRNGKey(0), "v0")
    volume = jnp.asarray(RNG.standard_normal((D, 12, 12, 8)).astype(np.float32))
    pts_world = jnp.asarray(
        RNG.standard_normal((N_RAYS, N_SAMPLES, 3)).astype(np.float32))
    pts_ndc = jnp.asarray(
        RNG.uniform(0, 1, (N_RAYS, N_SAMPLES, 3)).astype(np.float32))
    z_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, N_SAMPLES),
                              (N_RAYS, N_SAMPLES))
    rays_dir = jnp.asarray(
        RNG.standard_normal((N_RAYS, 3)).astype(np.float32))
    w2c = jnp.eye(4)
    w2cs = jnp.broadcast_to(w2c, (V, 4, 4))
    intr = jnp.asarray([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])
    intrs = jnp.broadcast_to(intr, (V, 3, 3))
    imgs = jnp.asarray(RNG.uniform(0, 1, (V, H, W, 3)).astype(np.float32))
    return mlp, volume, pts_world, pts_ndc, z_vals, rays_dir, w2c, w2cs, \
        intrs, imgs


def test_sharded_render_matches_single_device():
    assert len(jax.devices()) == 8
    (mlp, volume, pts_world, pts_ndc, z_vals, rays_dir, w2c, w2cs, intrs,
     imgs) = make_inputs()

    def render(pw, pn, zv, rd, mlp_p, vol):
        out = render_rays(mlp_p, vol, pw, pn, zv, rd, w2c_ref=w2c,
                          w2cs=w2cs, intrinsics=intrs, imgs=imgs)
        return out["rgb"]

    mesh = make_mesh()
    sharded = shard_rays_render(render, mesh, n_ray_args=4)
    rgb_sharded = sharded(pts_world, pts_ndc, z_vals, rays_dir, mlp, volume)
    rgb_single = render(pts_world, pts_ndc, z_vals, rays_dir, mlp, volume)
    np.testing.assert_allclose(np.asarray(rgb_sharded),
                               np.asarray(rgb_single), atol=1e-5)


def test_data_parallel_step_learns():
    (mlp, volume, pts_world, pts_ndc, z_vals, rays_dir, w2c, w2cs, intrs,
     imgs) = make_inputs()
    params = {"mlp": mlp, "volume": volume}
    target = jnp.asarray(RNG.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))

    def loss_fn(params, batch, key):
        out = render_rays(params["mlp"], params["volume"], batch["pts_world"],
                          batch["pts_ndc"], batch["z_vals"],
                          batch["rays_dir"], w2c_ref=w2c, w2cs=w2cs,
                          intrinsics=intrs, imgs=imgs)
        return jnp.mean((out["rgb"] - batch["target"]) ** 2)

    mesh = make_mesh()
    opt = optax.adam(5e-3)
    params = replicate(params, mesh)
    opt_state = opt.init(params)
    step = data_parallel_step(loss_fn, opt, mesh)

    batch = {"pts_world": pts_world, "pts_ndc": pts_ndc, "z_vals": z_vals,
             "rays_dir": rays_dir, "target": target}
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(20):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_data_parallel_step_matches_full_batch():
    """8-device sharded grads == single-device full-batch grads: with a
    key-independent loss, one DP step must produce the same params as the
    unsharded step on the same global batch (equal-size shards, pmean)."""
    (mlp, volume, pts_world, pts_ndc, z_vals, rays_dir, w2c, w2cs, intrs,
     imgs) = make_inputs()
    params = {"mlp": mlp, "volume": volume}
    target = jnp.asarray(RNG.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))

    def loss_fn(params, batch, key):
        out = render_rays(params["mlp"], params["volume"], batch["pts_world"],
                          batch["pts_ndc"], batch["z_vals"],
                          batch["rays_dir"], w2c_ref=w2c, w2cs=w2cs,
                          intrinsics=intrs, imgs=imgs)
        return jnp.mean((out["rgb"] - batch["target"]) ** 2)

    batch = {"pts_world": pts_world, "pts_ndc": pts_ndc, "z_vals": z_vals,
             "rays_dir": rays_dir, "target": target}
    key = jax.random.PRNGKey(3)

    mesh = make_mesh()
    # sgd, not adam: adam's sign normalization amplifies O(1e-9) grad
    # noise into O(lr) param differences wherever the true grad is ~0
    opt = optax.sgd(0.1)
    params_dp = replicate(params, mesh)
    opt_state = opt.init(params_dp)
    step = data_parallel_step(loss_fn, opt, mesh)
    params_dp, _, loss_dp = step(params_dp, opt_state, batch, key)

    loss0, grads = jax.value_and_grad(loss_fn)(params, batch, key)
    updates, _ = opt.update(grads, opt.init(params), params)
    params_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_dp), float(loss0), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _toy_generalizable_batch(v=4, h=32, w=32):
    intr = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                    np.float32)
    intr_s4 = intr.copy()
    intr_s4[:2] /= 4
    w2cs, projs = [], []
    ref_inv = None
    for i in range(v):
        a = 0.05 * (i - 1)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = [0.2 * (i - 1), 0.0, 0.0]
        w2cs.append(w2c)
        p = np.eye(4, dtype=np.float32)
        p[:3] = intr_s4 @ w2c[:3]
        if ref_inv is None:
            ref_inv = np.linalg.inv(p)
        projs.append((p @ ref_inv)[:3])
    w2cs = np.stack(w2cs)
    return {
        "images": jnp.asarray(
            RNG.uniform(0, 1, (v, h, w, 3)).astype(np.float32)),
        "proj_mats": jnp.asarray(np.stack(projs)),
        "near_fars": jnp.broadcast_to(jnp.asarray([2.0, 6.0]), (v, 2)),
        "w2cs": jnp.asarray(w2cs),
        "c2ws": jnp.asarray(np.linalg.inv(w2cs)),
        "intrinsics": jnp.broadcast_to(jnp.asarray(intr), (v, 3, 3)),
    }


def test_generalizable_sharded_step_global_batch():
    """The generalizable DP step preserves the reference's global ray batch
    (1024 rays/step regardless of device count, train_mvs_nerf_pl.py:117):
    each of the 8 shards draws batch_size/8 rays and the reported loss is
    the mean of the 8 per-shard losses with device-folded keys."""
    import argparse
    from mvsnerf_tpu.train.generalizable import GeneralizableSystem

    h = w = 32
    args = argparse.Namespace(
        ckpt="", net_type="v0", netdepth=6, netwidth=128, pad=4,
        use_disp=False, warp_mode="auto", costreg_impl="auto",
        white_bkgd=False, with_depth_loss=False, lrate=5e-4,
        batch_size=64, N_samples=8, num_epochs=1)
    mesh = make_mesh()
    system = GeneralizableSystem(args, mesh=mesh)
    step, loss_fn = system._make_step((h, w), args.batch_size,
                                      args.N_samples, steps_total=10)
    batch = _toy_generalizable_batch(v=4, h=h, w=w)
    key = jax.random.PRNGKey(7)

    params0 = jax.tree.map(jnp.copy, system.params)
    shard_losses = [
        float(loss_fn(params0, batch, jax.random.fold_in(key, i))[0])
        for i in range(8)
    ]
    _, _, loss, _ = step(system.params, system.opt_state, batch, key)
    np.testing.assert_allclose(float(loss), np.mean(shard_losses), rtol=1e-5)

    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        system._make_step((h, w), 63, args.N_samples, steps_total=10)


def test_data_parallel_step_2d_mesh():
    """Multi-host formulation on a single process: a 2x4 (data x rays) mesh
    with the batch sharded over BOTH axes matches the full-batch step
    (make_mesh_2d + axis_name tuple; SURVEY.md §5.8 DCN story)."""
    from mvsnerf_tpu.parallel import make_mesh_2d

    (mlp, volume, pts_world, pts_ndc, z_vals, rays_dir, w2c, w2cs, intrs,
     imgs) = make_inputs()
    params = {"mlp": mlp, "volume": volume}
    target = jnp.asarray(RNG.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))

    def loss_fn(params, batch, key):
        out = render_rays(params["mlp"], params["volume"], batch["pts_world"],
                          batch["pts_ndc"], batch["z_vals"],
                          batch["rays_dir"], w2c_ref=w2c, w2cs=w2cs,
                          intrinsics=intrs, imgs=imgs)
        return jnp.mean((out["rgb"] - batch["target"]) ** 2)

    batch = {"pts_world": pts_world, "pts_ndc": pts_ndc, "z_vals": z_vals,
             "rays_dir": rays_dir, "target": target}
    key = jax.random.PRNGKey(5)

    mesh = make_mesh_2d(n_data=2)
    assert mesh.shape == {"data": 2, "rays": 4}
    opt = optax.sgd(0.1)
    params_dp = replicate(params, mesh)
    opt_state = opt.init(params_dp)
    step = data_parallel_step(loss_fn, opt, mesh,
                              axis_name=mesh.axis_names)
    params_dp, _, loss_dp = step(params_dp, opt_state, batch, key)

    loss0, grads = jax.value_and_grad(loss_fn)(params, batch, key)
    updates, _ = opt.update(grads, opt.init(params), params)
    params_ref = optax.apply_updates(params, updates)

    np.testing.assert_allclose(float(loss_dp), float(loss0), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_dp), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_init_distributed_noop_single_process(monkeypatch):
    from mvsnerf_tpu.parallel import init_distributed
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert init_distributed() is False
