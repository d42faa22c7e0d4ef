"""Depth-band Pallas TPU kernels for the CostRegNet 3-D U-Net convs.

Why: the U-Net's channel counts (8..64) lane-pad up to 16x under XLA;
the depth-packed formulation (models/costreg_packed.py) fixes the HBM
traffic but carries ~16x redundant MXU taps at the top level (the packed
kernel is mostly zeros). This kernel reaches the ~(P+2)/3 tap-waste floor
of a banded formulation while keeping HBM traffic at the channel-major
minimum.

Layout: channel-major (C, D, H, W) throughout — composing with the fused
sweep kernel's natural (cc, N) output (ops/pallas_sweep.py), which kills
the packed16 relayout. W (lane axis) is never haloed; D and H carry a
1-halo (callers pass x padded by 1 in D and H — the pad is fused into the
previous ABN's output write, see cost_reg_dband_apply).

Per grid block (slab s of P output planes x row block r of RH rows):

    window (Cin, P+2, RH+2, W) <- one async copy from x_pad  [double-buffered]
    for rh, kh:  B = window[:, :, rh+kh] viewed (Cin*(P+2), W)
        for kw:  C = A[kh, kw] @ B            # MXU, M = Cout*P
                 out[rh] += lane-shift_kw(C)  # zero-fill shift = zero pad

with A[kh, kw] ((Cout*P), (Cin*(P+2))) the banded weight matrix
A[(co,p), (ci,q)] = K[q-p, kh, kw, ci, co] for q-p in {0,1,2} (built in
XLA from the dense master kernel by a static 0/1-selection einsum, so
autodiff through the A build routes wgrad to the dense kernel — but the
custom VJP below computes grads with dedicated kernels instead).

The lane-shift trick: C[m, j] is the tap response with input COLUMN j, so
out[m, w] += C[m, w + kw - 1]; shifting C by 1 lane with zero fill
reproduces the dense conv's zero padding exactly (out-of-range column ==
zero input).

MAC cost: (P+2)/3 of the ideal dense conv (vs ~16x for lane-padded dense
and ~5x for depth-packed at the 8-channel level).

Reference semantics: models.py:725-769 (CostRegNet), models.py:661-685
(ConvBnReLU3D) — stride-1/stride-2 3x3x3 convs and the stride-2
transposed deconvs, all 'same'-style padding 1.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precision import INTERP


def _sel_band(P: int, win: int, stride: int = 1):
    """0/1 selection S[p, q, kd] (P, win, 3): window plane q feeds dense
    depth tap kd of output plane p iff q == stride*p + kd (window starts
    one plane before the block's first input plane; x is pre-padded so
    the offset is always exactly 1)."""
    s = np.zeros((P, win, 3), np.float32)
    for p in range(P):
        for kd in range(3):
            q = stride * p + kd
            if q < win:
                s[p, q, kd] = 1.0
    return s


def build_a(kernel, P: int, stride: int = 1):
    """Dense (3,3,3,Cin,Cout) -> A (3, 3, Cout*P, Cin*win) banded weight
    matrices; win = stride*(P-1) + 3 window planes cover the P output
    planes' receptive fields."""
    win = stride * (P - 1) + 3
    cin, cout = kernel.shape[3], kernel.shape[4]
    s = jnp.asarray(_sel_band(P, win, stride))
    # A[kh, kw, (co, p), (ci, q)]
    a = jnp.einsum("pqk,khwio->hwopiq", s, kernel,
                   preferred_element_type=jnp.float32)
    return a.reshape(3, 3, cout * P, cin * win)


def _shift_lanes(c, kw: int):
    """out[m, w] += C[m, w + kw - 1]: kw=0 -> right shift w/ zero lane 0;
    kw=1 -> identity; kw=2 -> left shift w/ zero last lane."""
    m, w = c.shape
    if kw == 1:
        return c
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, w), 1)
    if kw == 0:
        return jnp.where(lane == 0, 0.0, pltpu.roll(c, 1, 1))
    return jnp.where(lane == w - 1, 0.0, pltpu.roll(c, w - 1, 1))


def _make_s1_kernel(shp, prec):
    """Forward stride-1 kernel. shp = (Cin, Cout, P, RH, W, SB, RB)."""
    (cin, cout, P, RH, W, SB, RB) = shp
    win = P + 2
    k0 = cin * win

    def kernel(a_ref, x_hbm, out_ref, wbuf, sem):
        s = pl.program_id(0)
        r = pl.program_id(1)
        i = s * RB + r
        nblk = SB * RB

        def dma(slot, si, ri):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(si * P, win), pl.ds(ri * RH, RH + 2), :],
                wbuf.at[slot], sem.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, s, r).start()

        nr = jnp.where(r + 1 < RB, r + 1, 0)
        ns = jnp.where(r + 1 < RB, s, s + 1)

        @pl.when(i + 1 < nblk)
        def _():
            dma((i + 1) % 2, ns, nr).start()

        dma(i % 2, s, r).wait()
        window = wbuf[i % 2]                       # (cin, win, RH+2, W)

        for rh in range(RH):
            acc = jnp.zeros((cout * P, W), jnp.float32)
            for kh in range(3):
                b = window[:, :, rh + kh, :].reshape(k0, W)
                for kw in range(3):
                    c = jax.lax.dot_general(
                        a_ref[kh, kw], b, (((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                    acc = acc + _shift_lanes(c, kw)
            out_ref[:, :, rh, :] = acc.reshape(cout, P, W)

    return kernel


@functools.partial(jax.jit, static_argnames=("p", "rh", "interpret",
                                             "precision"))
def conv3d_s1_dband(x_pad, a, *, p: int = 8, rh: int = 8,
                    interpret: bool = False, precision=None):
    """Stride-1 3x3x3 'same' conv, channel-major.

    Args:
        x_pad: (Cin, D+2, H+2, W) input with a 1-halo in D and H (zeros).
        a: (3, 3, Cout*P, Cin*(P+2)) banded weights from `build_a`.
        p: output planes per block (divides D); rh: rows per block
           (divides H).

    Returns:
        (Cout, D, H, W) float32.
    """
    cin, d2, h2, w = x_pad.shape
    d, h = d2 - 2, h2 - 2
    assert d % p == 0 and h % rh == 0, (d, h, p, rh)
    win = p + 2
    cout = a.shape[2] // p
    assert a.shape == (3, 3, cout * p, cin * win), (a.shape, cin, win)
    sb, rb = d // p, h // rh

    kern = _make_s1_kernel((cin, cout, p, rh, w, sb, rb),
                           INTERP if precision is None else precision)
    return pl.pallas_call(
        kern,
        grid=(sb, rb),
        in_specs=[
            pl.BlockSpec(a.shape, lambda s, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((cout, p, rh, w), lambda s, r: (0, s, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, d, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, cin, win, rh + 2, w), x_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(a, x_pad)


def pad_dh(x):
    """Zero 1-halo in D and H (channel-major (C, D, H, W)); XLA fuses the
    pad into the producing elementwise op's output write."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


# ---------------------------------------------------------------- wgrad ----


def _make_s1_wgrad_kernel(shp, prec):
    """Accumulate WG[kh, kw, (ci, q), (co, p)] = sum_blocks B_kh @ G_kw^T
    over the whole volume; the dense (3,3,3,Cin,Cout) gradient is a cheap
    banded extraction in XLA afterwards (same selection as build_a)."""
    (cin, cout, P, RH, W, SB, RB) = shp
    win = P + 2
    k0 = cin * win

    def kernel(gy_ref, x_hbm, wg_ref, wbuf, sem):
        s = pl.program_id(0)
        r = pl.program_id(1)
        i = s * RB + r
        nblk = SB * RB

        def dma(slot, si, ri):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(si * P, win), pl.ds(ri * RH, RH + 2), :],
                wbuf.at[slot], sem.at[slot])

        @pl.when(i == 0)
        def _():
            dma(0, s, r).start()
            wg_ref[...] = jnp.zeros_like(wg_ref)

        nr = jnp.where(r + 1 < RB, r + 1, 0)
        ns = jnp.where(r + 1 < RB, s, s + 1)

        @pl.when(i + 1 < nblk)
        def _():
            dma((i + 1) % 2, ns, nr).start()

        dma(i % 2, s, r).wait()
        window = wbuf[i % 2]                       # (cin, win, RH+2, W)

        for rh in range(RH):
            g = gy_ref[:, :, rh, :].reshape(cout * P, W)
            # fwd: out[w] += C_kw[w + kw - 1]  =>  wgrad tap kw pairs
            # B column j with gy column j - kw + 1 (zero-fill shift)
            g_sh = [_shift_lanes(g, 2 - kw) for kw in range(3)]
            for kh in range(3):
                b = window[:, :, rh + kh, :].reshape(k0, W)
                for kw in range(3):
                    c = jax.lax.dot_general(
                        b, g_sh[kw], (((1,), (1,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                    wg_ref[kh, kw] += c

    return kernel


@functools.partial(jax.jit, static_argnames=("p", "rh", "interpret",
                                             "precision"))
def _s1_wgrad_dband(x_pad, gy, *, p: int = 8, rh: int = 8,
                    interpret: bool = False, precision=None):
    """WG (3, 3, Cin*(P+2), Cout*P) accumulated over all blocks."""
    cin, d2, h2, w = x_pad.shape
    d, h = d2 - 2, h2 - 2
    cout = gy.shape[0]
    win = p + 2
    sb, rb = d // p, h // rh
    kern = _make_s1_wgrad_kernel((cin, cout, p, rh, w, sb, rb),
                                 INTERP if precision is None else precision)
    return pl.pallas_call(
        kern,
        grid=(sb, rb),
        in_specs=[
            pl.BlockSpec((cout, p, rh, w), lambda s, r: (0, s, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((3, 3, cin * win, cout * p),
                               lambda s, r: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin * win, cout * p),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, cin, win, rh + 2, w), x_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(gy, x_pad)


def _wgrad_extract(wg, cin, cout, P: int, stride: int = 1):
    """(3, 3, Cin*win, Cout*P) -> dense (3, 3, 3, Cin, Cout) via the
    banded selection (transpose of build_a's expansion)."""
    win = stride * (P - 1) + 3
    s = jnp.asarray(_sel_band(P, win, stride))
    wg6 = wg.reshape(3, 3, cin, win, cout, P)
    return jnp.einsum("pqk,hwiqop->khwio", s, wg6,
                      preferred_element_type=jnp.float32)


# ------------------------------------------------------------ custom VJP ---


def _flip_swap(kernel):
    """(3,3,3,Cin,Cout) -> spatially flipped, io-swapped — the dgrad
    kernel of a stride-1 'same' conv."""
    return jnp.flip(kernel, (0, 1, 2)).transpose(0, 1, 2, 4, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv3d_s1(x, kernel, p: int = 8, rh: int = 8,
              interpret: bool | None = None, precision=None):
    """Differentiable stride-1 3x3x3 'same' conv, channel-major
    (C, D, H, W) x -> (Cout, D, H, W). D % p == 0, H % rh == 0 required.

    Forward/dgrad/wgrad all run the depth-band Pallas kernels; gradients
    flow to both x and the dense kernel."""
    return _s1_fwd(x, kernel, p, rh, interpret, precision)


def _interp_flag(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


def _s1_fwd(x, kernel, p, rh, interpret, precision):
    a = build_a(kernel, P=p)
    return conv3d_s1_dband(pad_dh(x), a, p=p, rh=rh,
                           interpret=_interp_flag(interpret),
                           precision=precision)


def _s1_fwd_rule(x, kernel, p, rh, interpret, precision):
    return _s1_fwd(x, kernel, p, rh, interpret, precision), (x, kernel)


def _s1_bwd_rule(p, rh, interpret, precision, res, gy):
    x, kernel = res
    itp = _interp_flag(interpret)
    a_t = build_a(_flip_swap(kernel), P=p)
    gx = conv3d_s1_dband(pad_dh(gy), a_t, p=p, rh=rh, interpret=itp,
                         precision=precision)
    wg = _s1_wgrad_dband(pad_dh(x), gy, p=p, rh=rh, interpret=itp,
                         precision=precision)
    gk = _wgrad_extract(wg, x.shape[0], gy.shape[0], P=p)
    return gx, gk


conv3d_s1.defvjp(_s1_fwd_rule, _s1_bwd_rule)
