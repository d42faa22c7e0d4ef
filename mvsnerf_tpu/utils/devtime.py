"""Device-looped timing: measure per-iteration device time by repeating
the op inside ONE compiled executable (lax.scan with a data dependency
between iterations), immune to host dispatch overhead.

Why: per-dispatch overhead through the axon TPU tunnel is large and
erratic (measured 100 ms - 9 s per Python-loop call while the true
device time of the same op was 0.74 ms — scripts/probe_axon_timing.py),
so Python-loop wall-clock timing measures the tunnel, not the chip.
Differencing two loop lengths cancels the remaining constant dispatch +
fetch cost of the single call.

Hoisting guard: each iteration perturbs one float input leaf by
`s * 1e-30` where `s` is a scalar extracted from the previous iteration's
output — a data dependence XLA cannot remove, with no measurable numeric
effect.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp


def _chained_loop(fn, args, iters: int):
    """AOT-compiled (args -> scalar) running fn(*args) `iters` times,
    chained. Compiled via jit(...).lower(...).compile() so callers can
    read `cost_analysis()` off the SAME executable that is timed (no
    second lower+compile — that doubled bench compile time, BENCH_r04
    rc=124)."""
    leaves, treedef = jax.tree.flatten(args)
    fi = next(i for i, l in enumerate(leaves)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                        jnp.floating))

    def loop(args):
        leaves0 = jax.tree.leaves(args)

        def body(s, _):
            ls = list(leaves0)
            ls[fi] = ls[fi] + s.astype(ls[fi].dtype) * 1e-30
            out = fn(*jax.tree.unflatten(treedef, ls))
            # chain EVERY inexact output leaf, not just the first: a
            # multi-output fn (e.g. value_and_grad) whose extra outputs
            # feed nothing gets those outputs DEAD-CODE-ELIMINATED by
            # XLA — fwd+bwd timings silently measured fwd only (caught
            # round 4: banded fwd+bwd == fwd exactly).
            acc = jnp.float32(0)
            for leaf in jax.tree.leaves(out):
                if hasattr(leaf, "dtype") and jnp.issubdtype(
                        leaf.dtype, jnp.inexact):
                    acc = acc + leaf.ravel()[0].astype(jnp.float32)
            return acc, None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return s

    return jax.jit(loop).lower(args).compile()


def device_time(fn, *args, iters: int = 10, reps: int = 3,
                base_iters: int = 1, return_cost: bool = False):
    """Per-iteration device seconds of fn(*args), best of `reps`.

    Times a `iters`-long and a `base_iters`-long chained loop and
    differences them, cancelling the constant per-call dispatch/fetch
    cost. Compile happens once per length (persistent cache applies).

    return_cost=True additionally returns the XLA cost_analysis dict of
    the compiled base loop (XLA counts a while/scan body once, so the
    program cost ~= one fn iteration) — read off the SAME executable
    that runs, no recompile.
    """
    long_loop = _chained_loop(fn, args, iters)
    base_loop = _chained_loop(fn, args, base_iters)
    cost = {}
    if return_cost:
        try:
            ca = base_loop.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            cost = dict(ca) if ca else {}
        except Exception:  # noqa: BLE001 — cost fields are best-effort
            cost = {}

    def run(loop):
        out = loop(args)
        return float(out)          # value fetch: forces real completion

    run(long_loop)                 # compile both
    run(base_loop)
    t_long, t_base = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(base_loop)
        t_base.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(long_loop)
        t_long.append(time.perf_counter() - t0)
    # min per length first: dispatch hiccups only ever ADD time, so the
    # minima are the clean estimates and their difference is the device
    # time of (iters - base_iters) iterations.
    sec = max(0.0, (min(t_long) - min(t_base)) / (iters - base_iters))
    if return_cost:
        return sec, cost
    return sec


def scan_train_steps(update, n: int, donate: bool = True):
    """jit((state, inputs) -> (state, last_loss)) running `update` n times
    inside one executable. `update(state, inputs, i) -> (state, loss)`
    must be a pure function (not already jitted-with-donation).
    """
    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def steps(state, inputs):
        def body(c, i):
            c, loss = update(c, inputs, i)
            return c, loss

        state2, losses = jax.lax.scan(body, state, jnp.arange(n))
        return state2, losses[-1]

    return steps


def wall(fn, *args, value_fetch=True):
    """Wall seconds of one fn(*args) call incl. a value fetch (axon
    block_until_ready can return early)."""
    t0 = time.perf_counter()
    out = fn(*args)
    if value_fetch:
        lead = next(l for l in jax.tree.leaves(out)
                    if hasattr(l, "dtype"))
        _ = jax.device_get(lead.ravel()[0] if lead.ndim else lead)
    return time.perf_counter() - t0, out
