"""Pallas TPU kernels for the render hot path.

`fused_render_v0` fuses, in a single kernel over ray tiles:
    positional encoding -> v0 NeRF MLP (6 layers + viewdir head, with the
    multiplicative pts_bias and the layer-4 skip) -> alpha compositing
    (alpha = 1 - exp(-sigma), transmittance, rgb/depth/acc maps).

Why this fusion wins on TPU: the XLA path runs ~10 separate matmul kernels
whose (N x 128) activations round-trip HBM between layers (~1.2 GB of
traffic per 131k-sample batch); here the MLP weights (~150 KB) live in VMEM
and each ray tile's activations never leave the chip. The skip/viewdir
concats are decomposed into split matmuls (cat(a,b) @ W == a @ W_top +
b @ W_bot) so no in-kernel concatenation of misaligned tiles is needed.

The kernel covers the inference/eval path (renderer.ipynb's chunk loop,
validation renders, video). Training keeps the XLA path (autodiff).

Measured on v5e (batch 1024 rays x 128 samples), validated on-device
(scripts/validate_pallas_tpu.py, max |err| 7e-5 vs the f32 reference):
fused kernel 3.66 ms vs XLA path 3.59 ms at the production (full-precision
MLP) setting — at 'highest' both are MXU-pass-bound, so the fusion's HBM
saving no longer dominates and the XLA path remains the production default.
The kernel is kept as the single-kernel render option and for future
sample-masked variants. Keep rays_per_tile <= 64: the full-precision
kernel at 128-ray tiles exceeds the 128 MB VMEM budget.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


N_FREQS = 10


def _freq_matrix(n_freqs: int = N_FREQS):
    """(3, 3*n_freqs) selector so that `x @ F` equals the freq-major scaled
    coords [x*1, y*1, z*1, x*2, ...] of the reference PE (models.py:47-51).
    Turning the PE into matmuls (instead of a 21-way concat of (rows, 3)
    slices, each lane-padded to 128) is what keeps the kernel inside VMEM."""
    f = [[0.0] * (3 * n_freqs) for _ in range(3)]
    for k in range(n_freqs):
        for j in range(3):
            f[j][3 * k + j] = float(2.0 ** k)
    return jnp.asarray(f, jnp.float32)


def _split_pe_kernel(kernel, n_freqs: int = N_FREQS):
    """Split a (63, C) weight acting on [x, sin, cos] into its three bands
    so the PE concat becomes three matmuls."""
    s = 3 * n_freqs
    return kernel[:3], kernel[3:3 + s], kernel[3 + s:]


def _mlp_rows(xyz, feats, dirs_small, S, w):
    """The v0 NeRF MLP on a (rows, *) tile with the positional-encoding
    concat decomposed into split matmuls (cat(a,b,c) @ W == a @ Wa + b @ Wb
    + c @ Wc); w is the flat weight dict already loaded from VMEM refs.
    dirs_small is the per-RAY (R, 3) dirs; its head contribution is computed
    at (R, 64) then broadcast over samples."""
    sc = xyz @ w["pe_f"]                 # (rows, 30) freq-major scaled
    sin_sc = jnp.sin(sc)
    cos_sc = jnp.cos(sc)
    bias = feats @ w["bias_k"] + w["bias_b"]

    h = (xyz @ w["k0_x"] + sin_sc @ w["k0_s"] + cos_sc @ w["k0_c"]
         + w["b0"])
    h = jax.nn.relu(h * bias)
    for i in (1, 2, 3, 4):
        h = h @ w[f"k{i}"] + w[f"b{i}"]
        h = jax.nn.relu(h * bias)
    # skip at layer index 4: cat([pe, h]) @ k5 == pe-bands @ k5_top + h @ k5_bot
    h = (xyz @ w["k5_x"] + sin_sc @ w["k5_s"] + cos_sc @ w["k5_c"]
         + h @ w["k5_bot"] + w["b5"])
    h = jax.nn.relu(h * bias)

    sigma = jax.nn.relu(h @ w["ak"] + w["ab"])            # (rows, 1)
    feature = h @ w["fk"] + w["fb"]
    dv = dirs_small @ w["vk_bot"]                         # (R, 64)
    R = dirs_small.shape[0]
    hv = (feature @ w["vk_top"]).reshape(R, S, -1) + dv[:, None, :] + w["vb"]
    hv = jax.nn.relu(hv).reshape(R * S, -1)
    rgb = jax.nn.sigmoid(hv @ w["rk"] + w["rb"])          # (rows, 3)
    return rgb, sigma


_WEIGHT_ORDER = ["pe_f", "k0_x", "k0_s", "k0_c", "b0", "k1", "b1", "k2",
                 "b2", "k3", "b3", "k4", "b4",
                 "k5_x", "k5_s", "k5_c", "k5_bot", "b5", "bias_k", "bias_b",
                 "ak", "ab", "fk", "fb", "vk_top", "vk_bot", "vb", "rk",
                 "rb"]


def pack_v0_weights(mlp_params, in_ch_pts: int = 63):
    """Flatten an imported v0 MLP pytree (io/torch_ckpt layout) into the
    kernel's weight list. Biases become (1, C) rows (TPU scalars must be
    >= 2-D); PE-facing kernels are split into [x, sin, cos] bands."""
    p = mlp_params
    row = lambda b: b.reshape(1, -1)
    k5 = p["pts_linears"][5]["kernel"]           # (63 + 128, 128)
    vk = p["views_linears"][0]["kernel"]         # (128 + 3, 64)
    k0_x, k0_s, k0_c = _split_pe_kernel(p["pts_linears"][0]["kernel"])
    k5_x, k5_s, k5_c = _split_pe_kernel(k5[:in_ch_pts])
    w = {
        "pe_f": _freq_matrix(),
        "k0_x": k0_x,
        "k0_s": k0_s,
        "k0_c": k0_c,
        "b0": row(p["pts_linears"][0]["bias"]),
        "k1": p["pts_linears"][1]["kernel"],
        "b1": row(p["pts_linears"][1]["bias"]),
        "k2": p["pts_linears"][2]["kernel"],
        "b2": row(p["pts_linears"][2]["bias"]),
        "k3": p["pts_linears"][3]["kernel"],
        "b3": row(p["pts_linears"][3]["bias"]),
        "k4": p["pts_linears"][4]["kernel"],
        "b4": row(p["pts_linears"][4]["bias"]),
        "k5_x": k5_x,
        "k5_s": k5_s,
        "k5_c": k5_c,
        "k5_bot": k5[in_ch_pts:],
        "b5": row(p["pts_linears"][5]["bias"]),
        "bias_k": p["pts_bias"]["kernel"],
        "bias_b": row(p["pts_bias"]["bias"]),
        "ak": p["alpha_linear"]["kernel"],
        "ab": row(p["alpha_linear"]["bias"]),
        "fk": p["feature_linear"]["kernel"],
        "fb": row(p["feature_linear"]["bias"]),
        "vk_top": vk[:-3],
        "vk_bot": vk[-3:],
        "vb": row(p["views_linears"][0]["bias"]),
        "rk": p["rgb_linear"]["kernel"],
        "rb": row(p["rgb_linear"]["bias"]),
    }
    return [w[name] for name in _WEIGHT_ORDER]


def _kernel(xyz_ref, feats_ref, dirs_ref, z_ref, *rest):
    # rest = weight refs, then 4 output refs.
    # Mosaic's default f32 matmul runs the MXU at reduced (bf16-level)
    # precision — measured 0.15 abs error on the (rows,128)@(128,1) sigma
    # head vs XLA's 5e-6, amplified to ~0.7 rgb through the pts_bias
    # cascade. Follow the MLP precision policy (ops/precision.py).
    from .precision import MLP as _MLP_PRECISION
    with jax.default_matmul_precision(_MLP_PRECISION.name.lower()):
        _kernel_body(xyz_ref, feats_ref, dirs_ref, z_ref, *rest)


def _kernel_body(xyz_ref, feats_ref, dirs_ref, z_ref, *rest):
    w_refs = rest[:len(_WEIGHT_ORDER)]
    rgb_out, depth_out, acc_out, weights_out = rest[len(_WEIGHT_ORDER):]

    R, S, _ = xyz_ref.shape
    rows = R * S
    w = {name: ref[:] for name, ref in zip(_WEIGHT_ORDER, w_refs)}

    xyz = xyz_ref[:].reshape(rows, 3)
    feats = feats_ref[:].reshape(rows, feats_ref.shape[-1])
    dirs = dirs_ref[:]                          # (R, 3)

    rgb, sigma = _mlp_rows(xyz, feats, dirs, S, w)

    # compositing (renderer.py:18-26, 65-92): alpha = 1 - exp(-sigma)
    alpha = 1.0 - jnp.exp(-sigma.reshape(R, S))
    # T_i = prod_{j<i} (1 - a_j + 1e-10) via an exclusive log-prefix-sum.
    # Mosaic has no cumsum primitive; a strictly-lower-triangular matmul
    # IS the exclusive prefix sum and runs on the MXU (S x S, S = 128).
    # The 1 - alpha term is clamped at 0 (at alpha == 1.0 the unclamped
    # value can round to a tiny negative -> log(neg) = nan).
    log_t = jnp.log(jnp.maximum(1.0 - alpha, 0.0) + 1e-10)
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    tril_excl = (row < col).astype(jnp.float32)   # strictly lower (k^T form)
    t = jnp.exp(jnp.dot(log_t, tril_excl,
                        preferred_element_type=jnp.float32))
    weights = alpha * t                          # (R, S)

    rgb = rgb.reshape(R, S, 3)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)    # (R, 3)
    z_vals = z_ref[:]
    depth = jnp.sum(weights * z_vals, axis=-1, keepdims=True)
    acc = jnp.sum(weights, axis=-1, keepdims=True)

    rgb_out[:] = rgb_map
    depth_out[:] = depth
    acc_out[:] = acc
    weights_out[:] = weights


def fused_render_v0(weights_list, xyz_ndc, feats, dirs, z_vals,
                    rays_per_tile: int = 64, interpret: bool = False):
    """Fused PE + v0 MLP + compositing.

    Args:
        weights_list: pack_v0_weights(mlp_params).
        xyz_ndc: (N, S, 3) sample coords (the MLP's position input).
        feats:   (N, S, F) per-sample features (F = 20 for mvsnerf-v0).
        dirs:    (N, 3) reference-frame view dirs (unit).
        z_vals:  (N, S).

    Returns:
        dict rgb (N, 3), depth (N,), acc (N,), weights (N, S).
    """
    N, S, _ = xyz_ndc.shape
    F = feats.shape[-1]
    R = min(rays_per_tile, N)
    pad = (-N) % R
    if pad:
        padf = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        xyz_ndc, feats, dirs, z_vals = map(padf,
                                           (xyz_ndc, feats, dirs, z_vals))
    n_pad = xyz_ndc.shape[0]
    grid = (n_pad // R,)

    def tile_spec(s):
        return pl.BlockSpec((R, *s), lambda i: (i, *([0] * len(s))),
                            memory_space=pltpu.VMEM)

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)
               for _ in _WEIGHT_ORDER]
    out_shapes = (
        jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, S), jnp.float32),
    )
    out_specs = (tile_spec((3,)), tile_spec((1,)), tile_spec((1,)),
                 tile_spec((S,)))

    rgb, depth, acc, w_ = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[tile_spec((S, 3)), tile_spec((S, F)), tile_spec((3,)),
                  tile_spec((S,))] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xyz_ndc, feats, dirs, z_vals, *weights_list)

    return {"rgb": rgb[:N], "depth": depth[:N, 0], "acc": acc[:N, 0],
            "weights": w_[:N]}
