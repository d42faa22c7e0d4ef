"""Profile the generalizable training step (config 4) on the real TPU:
MVSNet forward, full step fwd+bwd, and component costs at DTU resolution."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mvsnerf_tpu.config import config_parser
from mvsnerf_tpu.train.generalizable import GeneralizableSystem
from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

H, W = 512, 640

# extra CLI args append/override (e.g. --costreg_impl dband
# --featurenet_impl plain) for implementation A/Bs
args = config_parser(cmd="--pad 24 --N_samples 128 --batch_size 1024 "
                         "--with_depth_loss --with_depth --ckpt None "
                         "--net_type v0 " + " ".join(sys.argv[1:]))

rng = np.random.default_rng(0)
intr = np.array([[722.0, 0, W / 2], [0, 722.0, H / 2], [0, 0, 1]],
                np.float32)
intr_s4 = intr.copy()
intr_s4[:2] /= 4
w2cs, projs, c2ws = [], [], []
ref4 = np.eye(4, dtype=np.float32)
ref4[:3] = intr_s4 @ np.eye(4)[:3]
ref_inv = np.linalg.inv(ref4)
for i in range(4):
    a = 0.04 * (i - 1.5)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = [0.3 * (i - 1.5), 0, 0]
    w2cs.append(w2c)
    c2ws.append(np.linalg.inv(w2c).astype(np.float32))
    p = np.eye(4, dtype=np.float32)
    p[:3] = intr_s4 @ w2c[:3]
    projs.append((p @ ref_inv)[:3])

batch = {
    "images": jnp.asarray(rng.uniform(-1, 1, (4, H, W, 3)).astype(np.float32)),
    "proj_mats": jnp.asarray(np.stack(projs)),
    "near_fars": jnp.asarray(np.tile([2.125, 4.525], (4, 1)).astype(np.float32)),
    "w2cs": jnp.asarray(np.stack(w2cs)),
    "c2ws": jnp.asarray(np.stack(c2ws)),
    "intrinsics": jnp.asarray(np.stack([intr] * 4)),
    "depths_h": jnp.asarray(rng.uniform(2, 5, (4, H, W)).astype(np.float32)),
}

sys_ = GeneralizableSystem(args)
step, loss_fn = sys_._make_step((H, W), args.batch_size, args.N_samples,
                                10000)


def timeit(name, fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)
    return out


from mvsnerf_tpu.models import mvsnet_apply
timeit("mvsnet fwd (volume build)", jax.jit(
    lambda p, im: mvsnet_apply(p, im, batch["proj_mats"][:3],
                               batch["near_fars"][0], pad=args.pad)[0]),
    sys_.params["mvsnet"], batch["images"][:3])

key = jax.random.PRNGKey(0)
timeit("loss fwd only", jax.jit(
    lambda p: loss_fn(p, batch, key)[0]), sys_.params)

params, opt_state = sys_.params, sys_.opt_state
out = step(params, opt_state, batch, key)
jax.block_until_ready(out[2])
# the step donates (params, opt_state) — continue from the returned
# buffers, not the originals (reusing donated arrays is INVALID_ARGUMENT)
p, o = out[0], out[1]
t0 = time.perf_counter()
iters = 10
for i in range(iters):
    p, o, loss, aux = step(p, o, batch, jax.random.fold_in(key, i))
_ = float(loss)  # force value fetch — axon block_until_ready returns early
dt = (time.perf_counter() - t0) / iters
print(f"{'full train step (fwd+bwd+adam)':34s} {dt * 1e3:9.2f} ms "
      f"({args.batch_size / dt:.0f} rays/s)")
print(f"6 DTU epochs (~49*88*7 steps) would take "
      f"{dt * 49 * 88 * 7 / 3600:.1f} h/chip (reference: ~30 h on 2080 Ti)")
