"""Benchmark: per-scene fine-tuning training throughput (rays/sec/chip).

Anchor: the reference's only published wall-clock figure for this workload —
10k fine-tuning iterations at 1024 rays/batch in ~15 min on one RTX 2080 Ti
(/root/reference/README.md:135, opt.py:22), i.e. 10,240,000 rays / 900 s
= 11,378 rays/s. This benchmark runs the same training configuration
(batch 1024 rays x 128 samples, Adam, MLP + trainable encoding volume, MSE
loss) on one TPU chip and reports steady-state rays/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
from functools import partial
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

BASELINE_RAYS_PER_SEC = 10_240_000 / 900.0  # RTX 2080 Ti, README.md:135

CKPT = "/root/reference/ckpts/mvsnerf-v0.tar"

H, W = 512, 640          # DTU fine-tune resolution (data/dtu_ft.py:24)
PAD = 24                 # opt.py:19 default
N_RAYS = 1024            # opt.py:22 default batch_size
N_SAMPLES = 128          # opt.py:64 default


def main():
    from mvsnerf_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from mvsnerf_tpu.models import init_mlp, init_mvsnet, mvsnet_apply
    from mvsnerf_tpu.render import render_rays
    from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels

    rng = np.random.default_rng(0)

    # --- parameters: imported pretrained weights when available ------------
    if os.path.exists(CKPT):
        from mvsnerf_tpu.io import load_reference_checkpoint
        ck = load_reference_checkpoint(CKPT)
        mlp, mvs = ck["mlp"], ck["mvsnet"]
    else:
        mlp = init_mlp(jax.random.PRNGKey(0), "v0")
        mvs = init_mvsnet(jax.random.PRNGKey(1))

    # --- synthetic 3-view scene at the fine-tune resolution ----------------
    v = 3
    imgs = jnp.asarray(rng.uniform(0, 1, (v, H, W, 3)).astype(np.float32))
    intr = np.array([[722.0, 0, W / 2], [0, 722.0, H / 2], [0, 0, 1]],
                    np.float32)
    intr_s4 = intr.copy()
    intr_s4[:2] /= 4
    w2cs, projs = [], []
    ref4 = np.eye(4, dtype=np.float32)
    ref4[:3] = intr_s4 @ np.eye(4)[:3]
    ref_inv = np.linalg.inv(ref4)
    for i in range(v):
        a = 0.04 * (i - 1)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = [0.3 * (i - 1), 0.0, 0.0]
        w2cs.append(w2c)
        p = np.eye(4, dtype=np.float32)
        p[:3] = intr_s4 @ w2c[:3]
        projs.append((p @ ref_inv)[:3])
    w2cs = jnp.asarray(np.stack(w2cs))
    projs = jnp.asarray(np.stack(projs))
    intrs = jnp.broadcast_to(jnp.asarray(intr), (v, 3, 3))
    near_far = jnp.asarray([2.125, 4.525])  # data/dtu_ft.py:33

    # --- encoding volume (built once, as in fine-tuning init_volume) -------
    build_volume = jax.jit(lambda p, im: mvsnet_apply(
        p, im, projs, near_far, pad=PAD)[0])
    volume = build_volume(mvs, imgs)
    jax.block_until_ready(volume)

    params = {"mlp": mlp, "volume": volume}
    c2w_t = jnp.linalg.inv(w2cs[0])
    inv_scale = jnp.asarray([W - 1.0, H - 1.0])

    def loss_fn(params, xs, ys, target, key):
        rays_o, rays_d = rays_from_pixels(xs, ys, jnp.asarray(intr), c2w_t)
        t = jnp.linspace(0.0, 1.0, N_SAMPLES)
        z = near_far[0] * (1 - t) + near_far[1] * t
        z_vals = jnp.broadcast_to(z, (N_RAYS, N_SAMPLES))
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], -1)
        lower = jnp.concatenate([z_vals[:, :1], mids], -1)
        z_vals = lower + (upper - lower) * jax.random.uniform(
            key, z_vals.shape)
        pts_world = rays_o[None, None] + z_vals[..., None] * rays_d[:, None]
        pts_ndc = get_ndc_coordinate(w2cs[0], jnp.asarray(intr), pts_world,
                                     inv_scale, near=near_far[0],
                                     far=near_far[1], pad=PAD)
        out = render_rays(params["mlp"], params["volume"], pts_world,
                          pts_ndc, z_vals, rays_d, w2c_ref=w2cs[0],
                          w2cs=w2cs, intrinsics=intrs, imgs=imgs,
                          fast_volume_grad=True, volume_band_k=4)
        return jnp.mean((out["rgb"] - target) ** 2)

    opt = optax.adam(5e-4)
    opt_state = opt.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, xs, ys, target, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs, ys, target, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)
    xs = jnp.asarray(rng.uniform(0, W - 1, N_RAYS).astype(np.float32))
    ys = jnp.asarray(rng.uniform(0, H - 1, N_RAYS).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))

    # warmup / compile
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, xs, ys, target,
                                       jax.random.fold_in(key, i))
    jax.block_until_ready(loss)

    # best of 3 windows: dispatch-tunnel hiccups only ever slow a window
    # down, so max is the steady-state number
    n_iters, best_dt = 50, float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(n_iters):
            params, opt_state, loss = step(
                params, opt_state, xs, ys, target,
                jax.random.fold_in(key, 100 + rep * n_iters + i))
        jax.block_until_ready(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    rays_per_sec = N_RAYS * n_iters / best_dt
    print(json.dumps({
        "metric": "finetune_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
