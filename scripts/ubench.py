"""Scan-chained on-device micro-benchmark utility.

The axon remote backend does not reliably block in `block_until_ready` for
every executable (some single-op graphs report ~0.05 ms regardless of cost),
so host-side timing loops over identical arguments are untrustworthy. This
helper runs N iterations inside ONE jitted `lax.scan` whose carry feeds back
into the inputs (preventing both loop-invariant hoisting and any
result-caching), then forces a scalar to the host.

Cost of the injected dependency: one elementwise multiply over the perturbed
input per iteration. Pass the SMALLEST input as `perturb` to keep it
negligible, and subtract `baseline_ms` (the same scan with `fn=identity`)
for sub-millisecond measurements.
"""

import functools
import time

import jax
import jax.numpy as jnp


def scan_time(fn, args, perturb_idx=0, iters=20, warmup=True):
    """Time `fn(*args)` on device: returns ms per iteration.

    perturb_idx: which positional arg gets the carry-dependency multiply
    (choose a small one). The arg must be a float array (or pytree of them:
    the first leaf is perturbed).
    """

    def run(n_iters, *args):
        # args must be jit ARGUMENTS: closing big arrays over jit embeds
        # them as HLO constants, which the axon compile tunnel rejects/hangs
        # on past ~100 MB.
        def body(c, _):
            a = list(args)
            leaves, treedef = jax.tree.flatten(a[perturb_idx])
            leaves[0] = leaves[0] * (1.0 + 0.0 * c)
            a[perturb_idx] = jax.tree.unflatten(treedef, leaves)
            out = fn(*a)
            first = jax.tree.leaves(out)[0]
            c = first.ravel()[0].astype(jnp.float32)
            return c, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return c

    compiled = {}

    def timed(n):
        if n not in compiled:
            compiled[n] = jax.jit(functools.partial(run, n))
        t0 = time.perf_counter()
        c = compiled[n](*args)
        float(c)  # host fetch forces completion through the tunnel
        return time.perf_counter() - t0

    if warmup:
        timed(1)
    t1 = timed(1)          # overhead: dispatch + tunnel round trip + 1 iter
    tn = timed(iters + 1)
    return (tn - t1) / iters * 1e3


def report(name, fn, args, **kw):
    ms = scan_time(fn, args, **kw)
    print(f"{name:46s} {ms:9.2f} ms", flush=True)
    return ms
