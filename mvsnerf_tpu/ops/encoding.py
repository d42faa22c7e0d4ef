"""NeRF positional encoding.

Mirrors the reference `Embedder.embed` (models.py:17-68). Note the exact
channel ordering of the vectorized reference embed(): the output is

    [x, sin(x * f_0), ..., sin(x * f_{K-1}), cos(x * f_0), ..., cos(x * f_{K-1})]

i.e. ALL sines (frequency-major, each a full 3-vector) then ALL cosines —
not interleaved per-frequency. This ordering is load-bearing for the
mvsnerf-v0 checkpoint (pts_linears.0 expects it, 63 = 3 + 30 + 30 channels).
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(x, num_freqs: int, max_freq_log2: int | None = None,
                        log_sampling: bool = True, include_input: bool = True):
    """Positional-encode the trailing dimension of `x`.

    Args:
        x: (..., d) input.
        num_freqs: number of frequency bands (reference `multires`).
        max_freq_log2: defaults to num_freqs - 1 (reference get_embedder).
        log_sampling: frequencies are 2**linspace(0, max_freq_log2, num_freqs).
        include_input: prepend the raw input.

    Returns:
        (..., d * (include_input + 2 * num_freqs)) encoding.
    """
    if num_freqs == 0:
        return x
    if max_freq_log2 is None:
        max_freq_log2 = num_freqs - 1
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, max_freq_log2, num_freqs)
    else:
        freqs = jnp.linspace(2.0 ** 0.0, 2.0 ** max_freq_log2, num_freqs)
    # (..., num_freqs, d) -> (..., num_freqs * d), frequency-major.
    scaled = (x[..., None, :] * freqs[:, None]).reshape(*x.shape[:-1], -1)
    parts = ([x] if include_input else []) + [jnp.sin(scaled), jnp.cos(scaled)]
    return jnp.concatenate(parts, axis=-1)


def embedder_out_dim(input_dims: int, num_freqs: int,
                     include_input: bool = True) -> int:
    return input_dims * (int(include_input) + 2 * num_freqs)
