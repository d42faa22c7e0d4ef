"""Reliable on-device timing for the axon backend: donation-chained loop.

Each iteration perturbs the (donated) primary input with a scalar extracted
from the previous output, so iterations form a true dependency chain that
the runtime can neither cache nor skip (the only loop pattern whose
host-side timing matched known-cost workloads on this backend).

Overhead per iteration: one read+write of the perturbed input
(~3.3 ms/768 MB at the measured 465 GB/s). Time `fn=None` to measure it.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp


def chain_time(fn, x, *rest, iters=10, warmup=2):
    """ms per iteration of fn(x, *rest). x: float array, donated."""

    @partial(jax.jit, donate_argnums=(0,))
    def step(x, *rest):
        out = fn(x, *rest) if fn is not None else x
        c = jax.tree.leaves(out)[0].ravel()[0]
        return x * (1.0 + 0.0 * c), c

    for _ in range(warmup):
        x, c = step(x, *rest)
    float(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, c = step(x, *rest)
    float(c)
    return (time.perf_counter() - t0) / iters * 1e3


def report(name, fn, x, *rest, baseline=0.0, **kw):
    ms = chain_time(fn, x, *rest, **kw)
    print(f"{name:52s} {ms:9.2f} ms" +
          (f"  (-base {ms - baseline:.2f})" if baseline else ""), flush=True)
    return ms
