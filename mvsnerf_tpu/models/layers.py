"""Primitive layers: linear, conv+ABN blocks, transposed conv, attention.

Functional style: every layer is `apply(params, x)` over a plain dict pytree.
Param layouts (all channel-last / HWIO so XLA:TPU gets its native conv
layouts):

    linear:        {'kernel': (in, out), 'bias': (out,)}   (bias optional)
    conv2d:        {'kernel': (kh, kw, in, out)}
    conv3d:        {'kernel': (kd, kh, kw, in, out)}
    abn:           {'scale': (C,), 'bias': (C,), 'mean': (C,), 'var': (C,)}
    mha:           {'w_qs'/'w_ks'/'w_vs'/'fc': linear(no bias),
                    'layer_norm': {'scale', 'bias'}}

The ABN block replicates `inplace_abn.InPlaceABN` semantics (fused
BatchNorm + LeakyReLU(0.01), eps 1e-5; reference models.py:661-685). The
reference keeps MVSNet in train mode even at inference (SURVEY.md §2.6), so
the default here is batch statistics; `use_running_stats=True` switches to
the stored running stats. The in-place memory trick is irrelevant under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------- linear ----

def linear(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True,
                kaiming: bool = True):
    """Kaiming-normal init matching the reference weights_init (models.py:10-14)."""
    kk, _ = jax.random.split(key)
    if kaiming:
        std = jnp.sqrt(2.0 / in_dim)
        kernel = std * jax.random.normal(kk, (in_dim, out_dim))
    else:
        bound = 1.0 / jnp.sqrt(in_dim)
        kernel = jax.random.uniform(kk, (in_dim, out_dim), minval=-bound,
                                    maxval=bound)
    p = {"kernel": kernel.astype(jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


# ------------------------------------------------------------------- abn ----

def abn(p, x, use_running_stats: bool = False, eps: float = 1e-5,
        slope: float = 0.01):
    """BatchNorm (over all leading axes) + LeakyReLU(slope).

    `x` is channel-last; statistics reduce over every axis but the last.
    Batch mode uses biased variance (torch BN train-mode semantics).
    """
    axes = tuple(range(x.ndim - 1))
    if use_running_stats:
        mean, var = p["mean"], p["var"]
    else:
        # Stats always in f32: E[x^2]-E[x]^2 cancels catastrophically in
        # bf16. For f32 inputs the casts are no-ops; for bf16 inputs XLA
        # fuses the upcast into the reduction and the normalize, so only
        # the bf16 result is materialized.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes)
        var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
    y = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + eps) \
        * p["scale"] + p["bias"]
    return jnp.where(y >= 0, y, slope * y).astype(x.dtype)


def init_abn(c: int):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


# ----------------------------------------------------------------- convs ----

def conv2d(p, x, stride: int = 1, padding: int = 1):
    """x: (N, H, W, Cin) -> (N, H', W', Cout). No bias (ABN follows)."""
    return lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3d(p, x, stride: int = 1, padding: int = 1):
    """x: (N, D, H, W, Cin) -> (N, D', H', W', Cout)."""
    return lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(stride,) * 3,
        padding=((padding, padding),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv_transpose3d(p, x, stride: int = 2, padding: int = 1,
                     output_padding: int = 1, kernel_size: int = 3):
    """Transposed 3-D conv with torch ConvTranspose3d semantics.

    Implemented as an input-dilated forward conv: insert (stride-1) zeros
    between input voxels, pad low by (k-1-p) and high by (k-1-p+op), and
    correlate with the (already spatially-flipped, IO-swapped) kernel.
    `p['kernel']` layout: (kd, kh, kw, in, out) pre-flipped at import time.
    """
    lo = kernel_size - 1 - padding
    hi = kernel_size - 1 - padding + output_padding
    return lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(1, 1, 1),
        padding=((lo, hi),) * 3,
        lhs_dilation=(stride,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def init_conv2d(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    bound = 1.0 / jnp.sqrt(fan_in)
    return {"kernel": jax.random.uniform(
        key, (kh, kw, cin, cout), minval=-bound, maxval=bound)}


def init_conv3d(key, kd, kh, kw, cin, cout):
    fan_in = kd * kh * kw * cin
    bound = 1.0 / jnp.sqrt(fan_in)
    return {"kernel": jax.random.uniform(
        key, (kd, kh, kw, cin, cout), minval=-bound, maxval=bound)}


# ------------------------------------------------------------- attention ----

def layer_norm(p, x, eps: float = 1e-6):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), -1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def multi_head_attention(p, q, k, v, n_head: int, d_k: int, d_v: int,
                         mask=None):
    """Residual + LayerNorm MHA over tiny (3-token) source-view sequences
    (reference models.py:70-141). Shapes: q/k/v (B, L, d_model)."""
    B, Lq, _ = q.shape
    Lk = k.shape[1]
    residual = q
    qh = linear(p["w_qs"], q).reshape(B, Lq, n_head, d_k).transpose(0, 2, 1, 3)
    kh = linear(p["w_ks"], k).reshape(B, Lk, n_head, d_k).transpose(0, 2, 1, 3)
    vh = linear(p["w_vs"], v).reshape(B, Lk, n_head, d_v).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qh / (d_k ** 0.5), kh)
    if mask is not None:
        # reference masked_fill(mask==0, -1e9) with mask broadcast (B,1,L,1)
        attn = jnp.where(mask[:, None] == 0, -1e9, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, n_head * d_v)
    out = linear(p["fc"], out) + residual
    return layer_norm(p["layer_norm"], out), attn


def init_mha(key, n_head: int, d_model: int, d_k: int, d_v: int):
    ks = jax.random.split(key, 4)
    return {
        "w_qs": init_linear(ks[0], d_model, n_head * d_k, bias=False,
                            kaiming=False),
        "w_ks": init_linear(ks[1], d_model, n_head * d_k, bias=False,
                            kaiming=False),
        "w_vs": init_linear(ks[2], d_model, n_head * d_v, bias=False,
                            kaiming=False),
        "fc": init_linear(ks[3], n_head * d_v, d_model, bias=False,
                          kaiming=False),
        "layer_norm": {"scale": jnp.ones((d_model,)),
                       "bias": jnp.zeros((d_model,))},
    }
