"""Bisect which backward component breaks the generalizable step on TPU."""

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.models import (cost_reg_apply, feature_net_apply,
                                init_mvsnet, mvsnet_apply)
from mvsnerf_tpu.ops.homography import build_cost_volume

H, W, PAD, D = 512, 640, 24, 128
h, w = H // 4, W // 4
HP, WP = h + 2 * PAD, w + 2 * PAD

rng = np.random.default_rng(0)
mvs = init_mvsnet(jax.random.PRNGKey(0))
imgs = jnp.asarray(rng.uniform(-1, 1, (3, H, W, 3)).astype(np.float32))
intr_s4 = np.array([[180.0, 0, w / 2], [0, 180.0, h / 2], [0, 0, 1]],
                   np.float32)
projs = []
ref4 = np.eye(4, dtype=np.float32)
ref4[:3] = intr_s4 @ np.eye(4)[:3]
ref_inv = np.linalg.inv(ref4)
for i in range(3):
    a = 0.04 * (i - 1)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    p = np.eye(4, dtype=np.float32)
    p[:3] = intr_s4 @ w2c[:3]
    projs.append((p @ ref_inv)[:3])
projs = jnp.asarray(np.stack(projs))
near_far = jnp.asarray([2.125, 4.525])
feats = jnp.asarray(rng.standard_normal((3, h, w, 32)).astype(np.float32))
depths = jnp.linspace(2.125, 4.525, D)
cost = jnp.asarray(rng.standard_normal((1, D, HP, WP, 41)).astype(np.float32))


def attempt(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"{name:44s} OK", flush=True)
    except Exception as e:
        print(f"{name:44s} FAIL {type(e).__name__}: {str(e)[:80]}",
              flush=True)


attempt("featurenet bwd",
        jax.grad(lambda p: jnp.sum(feature_net_apply(p, imgs) ** 2)), mvs["feature"])
attempt("costreg bwd",
        jax.grad(lambda p: jnp.sum(cost_reg_apply(p, cost) ** 2)),
        mvs["cost_reg_2"])
attempt("costvolume bwd wrt feats (fast warp)",
        jax.grad(lambda f: jnp.sum(
            build_cost_volume(imgs, f, projs, depths, pad=PAD)[0] ** 2)),
        feats)
attempt("costvolume bwd wrt feats (gather warp)",
        jax.grad(lambda f: jnp.sum(
            build_cost_volume(imgs, f, projs, depths, pad=PAD,
                              fast_warp=False)[0] ** 2)),
        feats)
attempt("full mvsnet bwd",
        jax.grad(lambda p: jnp.sum(
            mvsnet_apply(p, imgs, projs, near_far, pad=PAD)[0] ** 2)), mvs)
