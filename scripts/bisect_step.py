"""Clean-process checks: full MVSNet backward, then the full generalizable
train step (everything passed as arguments)."""

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.config import config_parser
from mvsnerf_tpu.models import init_mvsnet, mvsnet_apply
from mvsnerf_tpu.train.generalizable import GeneralizableSystem

H, W, PAD = 512, 640, 24

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


def attempt(name, fn, *args):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:40s} OK", flush=True)
        return out
    except Exception as e:
        print(f"{name:40s} FAIL {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return None


mvs = init_mvsnet(jax.random.PRNGKey(0))
attempt("full mvsnet bwd (args)",
        jax.jit(jax.grad(lambda p, im, pm, nf: jnp.sum(
            mvsnet_apply(p, im, pm, nf, pad=PAD)[0] ** 2))),
        mvs, batch["images"][:3], batch["proj_mats"][:3],
        batch["near_fars"][0])

args = config_parser(cmd="--pad 24 --N_samples 128 --batch_size 1024 "
                         "--with_depth_loss --with_depth --ckpt None")
sys_ = GeneralizableSystem(args)
step, _ = sys_._make_step((H, W), args.batch_size, args.N_samples, 10000)
import time
out = attempt("full train step",
              step, sys_.params, sys_.opt_state, batch, jax.random.PRNGKey(0))
if out is not None:
    p, o = out[0], out[1]
    t0 = time.perf_counter()
    for i in range(5):
        p, o, loss, aux = step(p, o, batch, jax.random.fold_in(
            jax.random.PRNGKey(0), i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / 5
    print(f"step time {dt * 1e3:.1f} ms ({args.batch_size / dt:.0f} rays/s); "
          f"181k reference steps would take {dt * 181000 / 3600:.1f} h "
          f"(reference: ~30 h)")

# variant: no sweep remat (saves the 230 ms forward recompute if it fits HBM)
import mvsnerf_tpu.ops.homography as homog
_orig = homog.build_cost_volume
def _noremat(*a, **k):
    k["sweep_remat"] = False
    return _orig(*a, **k)
homog.build_cost_volume = _noremat
import mvsnerf_tpu.models.mvsnet as mvsmod
mvsmod.build_cost_volume = _noremat
sys2 = GeneralizableSystem(args)
step2, _ = sys2._make_step((H, W), args.batch_size, args.N_samples, 10000)
out = attempt("full train step (no sweep remat)", step2, sys2.params,
              sys2.opt_state, batch, jax.random.PRNGKey(0))
if out is not None:
    p, o = out[0], out[1]
    t0 = time.perf_counter()
    for i in range(5):
        p, o, loss, aux = step2(p, o, batch,
                                jax.random.fold_in(jax.random.PRNGKey(0), i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / 5
    print(f"no-remat step time {dt * 1e3:.1f} ms "
          f"({args.batch_size / dt:.0f} rays/s)")
