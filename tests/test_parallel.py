"""Multi-device semantics on the virtual 8-device CPU mesh: ray-sharded
rendering equals single-device rendering; the DP train step runs and learns.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mvsnerf_tpu.models import init_mlp
from mvsnerf_tpu.parallel import make_mesh, shard_rays_render, \
    data_parallel_step, replicate
from mvsnerf_tpu.render import render_rays

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
