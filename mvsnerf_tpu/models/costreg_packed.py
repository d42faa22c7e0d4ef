"""Depth-packed CostRegNet: the same 3-D U-Net as `cost_reg_apply`
(reference models.py:725-769) with P depth slices folded into channels so
every level runs at exactly 128 feature channels.

Why: XLA:TPU lays conv activations out with the feature dim in the 128-wide
lane axis. The reference U-Net's channel counts (8/16/32/64) therefore get
tile-padded up to 16x, and the full-resolution tensors —
(128, 176, 208, 8) at DTU scale — cost ~2.4 GB of HBM traffic each instead
of 150 MB. Measured: the U-Net is ~60% of the generalizable train step and
entirely HBM-bound (bf16 makes no difference).

The packing: level l holds (1, D/P_l, H_l, W_l, P_l*C_l) with packed channel
index p*C_l + c and P_l chosen so P_l*C_l = 128 (P = 16, 8, 4, 2 for
C = 8, 16, 32, 64). Each conv becomes a conv over the slab axis with a
sparse packed kernel: KP[kd', ., ., p_in*Cin + ci, p_out*Cout + co] =
K[kd, ., ., ci, co] wherever the packed-depth arithmetic maps (kd', p_in,
p_out) onto tap kd. The packed kernel is built from the SAME master
parameters by a (static 0/1 selection tensor x kernel) einsum each call, so
autodiff routes gradients back to the dense kernels and the checkpoint
format is unchanged. Numerics are identical up to float summation order
(the extra taps are exact zeros).

FLOP cost: the packed contraction carries ~3x the taps of the dense conv,
but the dense conv was already wasting 16x on lane padding — the MXU time
is a wash while the HBM traffic drops ~14x.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .layers import abn

# kind: 's1' same-res, 's2' stride-2 down, 'up' transposed stride-2 up.


def _layers(p0: int):
    """(name, kind, Cout, P_in, P_out) per layer for base packing p0.

    p0=16 runs every level at exactly 128 channels (no lane padding,
    ~3x redundant taps at the top level); p0=8 runs at 64 channels
    (2x lane padding, but half the MACs). Which wins is measured, not
    derived — see scripts/ablate_gen_step.py.
    """
    assert p0 % 8 == 0 or p0 == 8, p0
    p = [p0, p0 // 2, p0 // 4, p0 // 8]
    return [
        ("conv0", "s1", 8, p[0], p[0]),
        ("conv1", "s2", 16, p[0], p[1]),
        ("conv2", "s1", 16, p[1], p[1]),
        ("conv3", "s2", 32, p[1], p[2]),
        ("conv4", "s1", 32, p[2], p[2]),
        ("conv5", "s2", 64, p[2], p[3]),
        ("conv6", "s1", 64, p[3], p[3]),
        ("conv7", "up", 32, p[3], p[2]),
        ("conv9", "up", 16, p[2], p[1]),
        ("conv11", "up", 8, p[1], p[0]),
    ]


@functools.lru_cache(maxsize=None)
def _selection(kind: str, p_in: int, p_out: int):
    """Static 0/1 tensor S[kd', pi, po, kd] mapping dense depth taps onto
    the packed (slab-window, packed-in, packed-out) coordinates.

    s1  (window 3, slab pad 1):  in_abs = P*(j + kd'-1) + pi must equal
        out_abs + kd - 1 = P*j + po + kd - 1.
    s2  (window 2, slab pad (1,0)): in_abs = P_in*(j + kd'-1) + pi must
        equal 2*(P_out*j + po) + kd - 1, P_in = 2*P_out.
    up  (window 2, slab pad (0,1)): torch ConvTranspose3d(k3,s2,p1,op1)
        with the spatially pre-flipped stored kernel (layers.py
        conv_transpose3d): out(d) += K[kd]*in((d-1+kd)/2) when integral;
        in_abs = q = (P_out*j + po - 1 + kd)/2 = P_in*(j + kd') + pi.
    """
    n_win = 3 if kind == "s1" else 2
    s = np.zeros((n_win, p_in, p_out, 3), np.float32)
    for kdp in range(n_win):
        for pi in range(p_in):
            for po in range(p_out):
                for kd in range(3):
                    if kind == "s1":
                        ok = pi - po + p_in * (kdp - 1) == kd - 1
                    elif kind == "s2":
                        ok = (p_in * (kdp - 1) + pi
                              == 2 * po + kd - 1)
                    else:  # up
                        if (po - 1 + kd) % 2 != 0:
                            ok = False
                        else:
                            ok = (po - 1 + kd) // 2 == p_in * kdp + pi
                    if ok:
                        s[kdp, pi, po, kd] = 1.0
    return s  # numpy: caching a traced-context jax array would leak tracers


def _pack_kernel(kernel, kind: str, p_in: int, p_out: int):
    """Dense (3,3,3,Cin,Cout) -> packed (win,3,3,P_in*Cin,P_out*Cout)."""
    cin, cout = kernel.shape[3], kernel.shape[4]
    s = _selection(kind, p_in, p_out)
    kp = jnp.einsum("apqk,khwio->ahwpiqo", s, kernel,
                    preferred_element_type=jnp.float32)
    return kp.reshape(s.shape[0], 3, 3, p_in * cin, p_out * cout)


def _abn_packed(p, x, P: int, use_running_stats: bool, dtype):
    """ABN where the last axis is (P, C) packed: stats per true channel."""
    c = p["scale"].shape[0]
    shp = x.shape
    y = abn(p, x.reshape(shp[:-1] + (P, c)),
            use_running_stats=use_running_stats)
    return y.reshape(shp)


def pack_volume(x, P: int):
    """(B, D, H, W, C) -> (B, D/P, H, W, P*C), packed index p*C + c."""
    b, d, h, w, c = x.shape
    y = x.reshape(b, d // P, P, h, w, c)
    return y.transpose(0, 1, 3, 4, 2, 5).reshape(b, d // P, h, w, P * c)


def unpack_volume(x, P: int):
    b, n, h, w, pc = x.shape
    c = pc // P
    y = x.reshape(b, n, h, w, P, c).transpose(0, 1, 4, 2, 3, 5)
    return y.reshape(b, n * P, h, w, c)


def _conv_packed(kp, x, kind: str):
    if kind == "s1":
        return lax.conv_general_dilated(
            x, kp, window_strides=(1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if kind == "s2":
        return lax.conv_general_dilated(
            x, kp, window_strides=(1, 2, 2),
            padding=((1, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # 'up': slab window 2 pad (0,1); spatial lhs-dilated x2, pad (1,2).
    return lax.conv_general_dilated(
        x, kp, window_strides=(1, 1, 1),
        padding=((0, 1), (1, 2), (1, 2)),
        lhs_dilation=(1, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def cost_reg_packed_apply(params, x, use_running_stats: bool = False,
                          dtype=None, packed_input: bool = False,
                          p0: int = 16):
    """Drop-in equivalent of `cost_reg_apply` (same params pytree, same
    output) for inputs with D % 16 == 0 and H, W % 8 == 0.

    `dtype=jnp.bfloat16` runs the packed convs in bf16 (f32 masters, f32
    ABN stats, f32 output) — worthwhile here because packing removes the
    HBM bound that made bf16 a no-op for the plain implementation.

    `packed_input=True` takes x already in the (B, D/16, H, W, 16*Cin)
    packed layout (e.g. straight from build_cost_volume
    cost_layout="packed16"), skipping the pack transpose.
    """
    if packed_input:
        _, n0, h0, w0, _ = x.shape
        d0 = n0 * p0
    else:
        _, d0, h0, w0, _ = x.shape
    assert d0 % max(p0, 8) == 0 and h0 % 8 == 0 and w0 % 8 == 0, \
        (d0, h0, w0)

    def cast(v):
        return v.astype(dtype) if dtype is not None else v

    y = cast(x) if packed_input else pack_volume(cast(x), p0)
    skips = {}
    for name, kind, cout, p_in, p_out in _layers(p0):
        p = params[name]
        kernel = p["conv"]["kernel"] if "conv" in p else p["deconv"]["kernel"]
        kp = cast(_pack_kernel(kernel, kind, p_in, p_out))
        y = _conv_packed(kp, y, kind)
        y = _abn_packed(p["bn"], y, p_out, use_running_stats, dtype)
        if kind == "up":
            y = y + skips.pop({"conv7": "conv4", "conv9": "conv2",
                               "conv11": "conv0"}[name])
        if name in ("conv0", "conv2", "conv4"):
            skips[name] = y
    return unpack_volume(y, p0).astype(jnp.float32)
