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


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _round128(n: int) -> int:
    return -(-n // 128) * 128


def _pad_w(x, wt: int):
    """Zero-pad the lane axis (last dim) up to `wt`. Mosaic requires HBM
    window-DMA slices along the lane dim be 128-aligned (measured on
    device: W=208/64 FAIL, W=128/256 OK — scripts/probe_axon_timing.py),
    so every dband kernel operand is padded to a 128 multiple and the
    result sliced back. Zero lanes reproduce the 'same'-conv zero
    boundary, so values in the logical region are unchanged."""
    if x.shape[-1] == wt:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, wt - x.shape[-1])])


def _pad_rows(x, rows: int):
    """Zero-pad the row axis (dim 2 of (C, D, H, W)) up to `rows`: the
    manual window DMAs slice the 8-tiled sublane axis, so each block's
    row window is rounded up to whole tiles and edge blocks over-read."""
    if x.shape[2] >= rows:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, rows - x.shape[2]), (0, 0)))


def _check_blocks(rh_in: int, rb: int, w: int, interpret: bool):
    """Mosaic window-DMA alignment contract (fails with an opaque Mosaic
    error or silent misbehavior otherwise): row-window starts (ri*rh on
    the 8-tiled sublane axis) must be 8-aligned unless there is a single
    row block, and the lane axis must be whole 128-lane tiles (probed on
    device: W=208/64 FAIL, 128/256 OK). `rh_in` is the INPUT row stride
    per block (2*rh for the stride-2 kernels). Interpret mode has no
    tiling, so the contract is only enforced for compiled kernels."""
    if interpret:
        return
    assert rh_in % 8 == 0 or rb == 1, \
        (f"row block {rh_in} with {rb} blocks starts unaligned sublane "
         "window DMAs (need rh % 8 == 0 or a single row block)")
    assert w % 128 == 0, \
        (f"lane axis W={w} must be a multiple of 128 on device; "
         "wrap with _pad_w/_round128 (see conv3d_s1/_s2/_up)")



# every pallas_call in this file compiles under _VMEM_LIMIT; the window
# guard rejects earlier, at _VMEM_GUARD, leaving ~10 MiB headroom for the
# non-window operands the limit also covers.
_VMEM_LIMIT = 110 * 1024 * 1024
_VMEM_GUARD = 100 * 1024 * 1024


def _check_vmem(window_bytes: int, tag: str):
    """Guard the double-buffered window scratch against the VMEM budget
    (_VMEM_GUARD, under the _VMEM_LIMIT passed to every pallas_call) —
    whole-axis row blocks (rh spanning H when H % 8 != 0) scale the
    window with H, which can silently explode for large unaligned
    levels."""
    assert window_bytes <= _VMEM_GUARD, \
        (f"{tag}: window scratch {window_bytes / 2**20:.0f} MiB exceeds "
         "the VMEM budget; use cost_reg_apply/cost_reg_packed_apply for "
         "this shape or shrink the row block")


def _make_s1_kernel(shp, prec):
    """Forward stride-1 kernel. shp = (Cin, Cout, P, RH, RWIN, W, SB, RB)."""
    (cin, cout, P, RH, RWIN, W, SB, RB) = shp
    win = P + 2
    k0 = cin * win

    def kernel(a_ref, x_hbm, out_ref, wbuf, sem):
        s = pl.program_id(0)
        r = pl.program_id(1)
        i = s * RB + r
        nblk = SB * RB

        def dma(slot, si, ri):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(si * P, win), pl.ds(ri * RH, RWIN), :],
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
    _check_blocks(rh, rb, w, interpret)
    rwin = _round8(rh + 2)
    x_pad = _pad_rows(x_pad, (rb - 1) * rh + rwin)
    _check_vmem(2 * cin * win * rwin * w * x_pad.dtype.itemsize,
                tag="dband window")

    kern = _make_s1_kernel((cin, cout, p, rh, rwin, w, sb, rb),
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
            pltpu.VMEM((2, cin, win, rwin, w), x_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(a, x_pad)


def pad_dh(x):
    """Zero 1-halo in D and H (channel-major (C, D, H, W)); XLA fuses the
    pad into the producing elementwise op's output write."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


# ------------------------------------------------------------- stride 2 ----


def split_w(x_pad):
    """Even/odd lane split for the stride-2 kernels (XLA relayout; fused
    into the producer where possible): (C, D+2, H+2, W) -> two
    (C, D+2, H+2, W/2)."""
    return x_pad[..., 0::2], x_pad[..., 1::2]


def _make_s2_kernel(shp, prec):
    """Stride-2 forward. Column taps map to parity planes: abs col
    2w+kw-1 is x_odd[w-1] (kw=0, right-shift), x_even[w] (kw=1),
    x_odd[w] (kw=2)."""
    (cin, cout, P, RH, RWIN, W2, SB, RB) = shp
    win = 2 * P + 1
    rwin = RWIN
    k0 = cin * win

    def kernel(a_ref, xe_hbm, xo_hbm, out_ref, we, wo, sem):
        s = pl.program_id(0)
        r = pl.program_id(1)
        i = s * RB + r
        nblk = SB * RB

        def dma(slot, si, ri, hbm, buf, t):
            return pltpu.make_async_copy(
                hbm.at[:, pl.ds(2 * si * P, win),
                       pl.ds(2 * ri * RH, rwin), :],
                buf.at[slot], sem.at[slot, t])

        def start(slot, si, ri):
            dma(slot, si, ri, xe_hbm, we, 0).start()
            dma(slot, si, ri, xo_hbm, wo, 1).start()

        def wait(slot, si, ri):
            dma(slot, si, ri, xe_hbm, we, 0).wait()
            dma(slot, si, ri, xo_hbm, wo, 1).wait()

        @pl.when(i == 0)
        def _():
            start(0, s, r)

        nr = jnp.where(r + 1 < RB, r + 1, 0)
        ns = jnp.where(r + 1 < RB, s, s + 1)

        @pl.when(i + 1 < nblk)
        def _():
            start((i + 1) % 2, ns, nr)

        wait(i % 2, s, r)
        vwe, vwo = we[i % 2], wo[i % 2]

        for rh in range(RH):
            acc = jnp.zeros((cout * P, W2), jnp.float32)
            for kh in range(3):
                be = vwe[:, :, 2 * rh + kh, :].reshape(k0, W2)
                bo = vwo[:, :, 2 * rh + kh, :].reshape(k0, W2)
                dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
                    a, b, (((1,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)
                acc = (acc + _shift_lanes(dot(a_ref[kh, 0], bo), 0)
                       + dot(a_ref[kh, 1], be) + dot(a_ref[kh, 2], bo))
            out_ref[:, :, rh, :] = acc.reshape(cout, P, W2)

    return kernel


@functools.partial(jax.jit, static_argnames=("p", "rh", "interpret",
                                             "precision"))
def conv3d_s2_dband(xe, xo, a, *, p: int = 8, rh: int = 8,
                    interpret: bool = False, precision=None):
    """Stride-2 3x3x3 conv (pad 1), channel-major.

    Args:
        xe, xo: (Cin, D+2, H+2, W/2) even/odd lane splits of the padded
            input (`split_w(pad_dh(x))`).
        a: (3, 3, Cout*P, Cin*(2P+1)) from `build_a(kernel, p, stride=2)`.

    Returns:
        (Cout, D/2, H/2, W/2) float32. (D/2) % p == 0, (H/2) % rh == 0.
    """
    cin, d2, h2, w2 = xe.shape
    do, ho = (d2 - 2) // 2, (h2 - 2) // 2
    assert do % p == 0 and ho % rh == 0, (do, ho, p, rh)
    win = 2 * p + 1
    cout = a.shape[2] // p
    assert a.shape == (3, 3, cout * p, cin * win), (a.shape, cin, win)
    sb, rb = do // p, ho // rh
    _check_blocks(2 * rh, rb, w2, interpret)
    rwin = _round8(2 * rh + 1)
    xe = _pad_rows(xe, (rb - 1) * 2 * rh + rwin)
    xo = _pad_rows(xo, (rb - 1) * 2 * rh + rwin)
    _check_vmem(2 * 2 * cin * win * rwin * w2 * xe.dtype.itemsize,
                tag="dband s2 windows")

    kern = _make_s2_kernel((cin, cout, p, rh, rwin, w2, sb, rb),
                           INTERP if precision is None else precision)
    return pl.pallas_call(
        kern,
        grid=(sb, rb),
        in_specs=[
            pl.BlockSpec(a.shape, lambda s, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((cout, p, rh, w2), lambda s, r: (0, s, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cout, do, ho, w2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, cin, win, rwin, w2), xe.dtype),
            pltpu.VMEM((2, cin, win, rwin, w2), xe.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(a, xe, xo)


# ----------------------------------------------------------- transposed ----


def _sel_band_up(P: int):
    """S_up[od, q, kd] (2P, P+1, 3) for the stored (pre-flipped) deconv
    kernel semantics out[o] = sum_kd K'[kd] x[(o-1+kd)/2] (layers.py
    conv_transpose3d): od=2p -> (q=p, kd=1); od=2p+1 -> (q=p, kd=0),
    (q=p+1, kd=2)."""
    s = np.zeros((2 * P, P + 1, 3), np.float32)
    for p in range(P):
        s[2 * p, p, 1] = 1.0
        s[2 * p + 1, p, 0] = 1.0
        s[2 * p + 1, p + 1, 2] = 1.0
    return s


def build_a_up(kernel, P: int):
    """Stored deconv (3,3,3,Cin,Cout) -> A (3, 3, Cout*2P, Cin*(P+1))."""
    cin, cout = kernel.shape[3], kernel.shape[4]
    s = jnp.asarray(_sel_band_up(P))
    a = jnp.einsum("dqk,khwio->hwodiq", s, kernel,
                   preferred_element_type=jnp.float32)
    return a.reshape(3, 3, cout * 2 * P, cin * (P + 1))


def _make_up_kernel(shp, prec):
    """Transposed stride-2 forward: out rows/planes interleave in-kernel
    (parity in the banded A and the kh pairing); out column parities come
    out as two W-wide tensors, interleaved in XLA."""
    (cin, cout, P, RH, RWIN, W, SB, RB) = shp
    win = P + 1
    rwin = RWIN
    k0 = cin * win
    m = cout * 2 * P

    def kernel(a_ref, x_hbm, oute_ref, outo_ref, wbuf, sem):
        s = pl.program_id(0)
        r = pl.program_id(1)
        i = s * RB + r
        nblk = SB * RB

        def dma(slot, si, ri):
            # row window starts one row EARLY (at ri*RH, 8-aligned for the
            # tiled sublane axis) — in-window row index = input row + 1
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(si * P + 1, win),
                         pl.ds(ri * RH, rwin), :],
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
        window = wbuf[i % 2]                      # (cin, P+1, RH+1, W)

        dot = lambda a, b: jax.lax.dot_general(   # noqa: E731
            a, b, (((1,), (0,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32)

        for rh in range(RH):
            for ph in range(2):
                # (kh, window-row) pairs feeding output row 2rh+ph
                # (+1: the window starts one row above the block)
                rows = ([(1, rh + 1)] if ph == 0
                        else [(0, rh + 1), (2, rh + 2)])
                acc_e = jnp.zeros((m, W), jnp.float32)
                acc_o = jnp.zeros((m, W), jnp.float32)
                for kh, wr in rows:
                    b = window[:, :, wr, :].reshape(k0, W)
                    acc_e = acc_e + dot(a_ref[kh, 1], b)
                    acc_o = (acc_o + dot(a_ref[kh, 0], b)
                             + _shift_lanes(dot(a_ref[kh, 2], b), 2))
                oute_ref[:, :, 2 * rh + ph, :] = acc_e.reshape(cout,
                                                               2 * P, W)
                outo_ref[:, :, 2 * rh + ph, :] = acc_o.reshape(cout,
                                                               2 * P, W)

    return kernel


@functools.partial(jax.jit, static_argnames=("p", "rh", "interpret",
                                             "precision"))
def conv3d_up_dband(x_pad, a, *, p: int = 8, rh: int = 8,
                    interpret: bool = False, precision=None):
    """Transposed stride-2 conv (torch ConvTranspose3d(3, s2, p1, op1)
    semantics with the stored pre-flipped kernel), channel-major.

    Args:
        x_pad: (Cin, D+2, H+2, W) — `pad_dh(x)` (only the high halo is
            read; the shared layout keeps one padded buffer per tensor).
        a: (3, 3, Cout*2P, Cin*(P+1)) from `build_a_up`.

    Returns:
        (out_even, out_odd): (Cout, 2D, 2H, W) column-parity pair;
        interleave with `interleave_w`. D % p == 0, H % rh == 0.
    """
    cin, d2, h2, w = x_pad.shape
    d, h = d2 - 2, h2 - 2
    assert d % p == 0 and h % rh == 0, (d, h, p, rh)
    win = p + 1
    cout = a.shape[2] // (2 * p)
    assert a.shape == (3, 3, cout * 2 * p, cin * win), (a.shape,)
    sb, rb = d // p, h // rh
    _check_blocks(rh, rb, w, interpret)
    rwin = _round8(rh + 2)
    x_pad = _pad_rows(x_pad, (rb - 1) * rh + rwin)
    _check_vmem(2 * cin * win * rwin * w * x_pad.dtype.itemsize,
                tag="dband window")

    kern = _make_up_kernel((cin, cout, p, rh, rwin, w, sb, rb),
                           INTERP if precision is None else precision)
    out_sds = jax.ShapeDtypeStruct((cout, 2 * d, 2 * h, w), jnp.float32)
    out_spec = pl.BlockSpec((cout, 2 * p, 2 * rh, w),
                            lambda s, r: (0, s, r, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(sb, rb),
        in_specs=[
            pl.BlockSpec(a.shape, lambda s, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(out_sds, out_sds),
        scratch_shapes=[
            pltpu.VMEM((2, cin, win, rwin, w), x_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(a, x_pad)


def interleave_w(out_e, out_o):
    """(C, D, H, W) even/odd column pair -> (C, D, H, 2W)."""
    c, d, h, w = out_e.shape
    return jnp.stack([out_e, out_o], axis=-1).reshape(c, d, h, 2 * w)


# ---------------------------------------------------------------- wgrad ----


def _make_s1_wgrad_kernel(shp, prec):
    """Accumulate WG[kh, kw, (ci, q), (co, p)] = sum_blocks B_kh @ G_kw^T
    over the whole volume; the dense (3,3,3,Cin,Cout) gradient is a cheap
    banded extraction in XLA afterwards (same selection as build_a)."""
    (cin, cout, P, RH, RWIN, W, SB, RB) = shp
    win = P + 2
    k0 = cin * win

    def kernel(gy_ref, x_hbm, wg_ref, wbuf, sem):
        s = pl.program_id(0)
        r = pl.program_id(1)
        i = s * RB + r
        nblk = SB * RB

        def dma(slot, si, ri):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(si * P, win), pl.ds(ri * RH, RWIN), :],
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
    _check_blocks(rh, rb, w, interpret)
    rwin = _round8(rh + 2)
    x_pad = _pad_rows(x_pad, (rb - 1) * rh + rwin)
    _check_vmem(2 * cin * win * rwin * w * x_pad.dtype.itemsize,
                tag="dband window")
    kern = _make_s1_wgrad_kernel((cin, cout, p, rh, rwin, w, sb, rb),
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
            pltpu.VMEM((2, cin, win, rwin, w), x_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
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


def _make_s2_wgrad_kernel(shp, prec):
    """WG[kh, kw, (ci, q), (co, p)] accumulation for the stride-2 conv:
    tap kw pairs B_even (kw=1) / B_odd columns with gy columns per the
    forward's shift rules."""
    (cin, cout, P, RH, RWIN, W2, SB, RB) = shp
    win = 2 * P + 1
    rwin = RWIN
    k0 = cin * win

    def kernel(gy_ref, xe_hbm, xo_hbm, wg_ref, we, wo, sem):
        s = pl.program_id(0)
        r = pl.program_id(1)
        i = s * RB + r
        nblk = SB * RB

        def dma(slot, si, ri, hbm, buf, t):
            return pltpu.make_async_copy(
                hbm.at[:, pl.ds(2 * si * P, win),
                       pl.ds(2 * ri * RH, rwin), :],
                buf.at[slot], sem.at[slot, t])

        def start(slot, si, ri):
            dma(slot, si, ri, xe_hbm, we, 0).start()
            dma(slot, si, ri, xo_hbm, wo, 1).start()

        @pl.when(i == 0)
        def _():
            start(0, s, r)
            wg_ref[...] = jnp.zeros_like(wg_ref)

        nr = jnp.where(r + 1 < RB, r + 1, 0)
        ns = jnp.where(r + 1 < RB, s, s + 1)

        @pl.when(i + 1 < nblk)
        def _():
            start((i + 1) % 2, ns, nr)

        dma(i % 2, s, r, xe_hbm, we, 0).wait()
        dma(i % 2, s, r, xo_hbm, wo, 1).wait()
        vwe, vwo = we[i % 2], wo[i % 2]

        dot_t = lambda b, g: jax.lax.dot_general(  # noqa: E731
            b, g, (((1,), (1,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32)

        for rh in range(RH):
            g = gy_ref[:, :, rh, :].reshape(cout * P, W2)
            g_l = _shift_lanes(g, 2)   # pairs B_odd[j] with gy[j+1] (kw=0)
            for kh in range(3):
                be = vwe[:, :, 2 * rh + kh, :].reshape(k0, W2)
                bo = vwo[:, :, 2 * rh + kh, :].reshape(k0, W2)
                wg_ref[kh, 0] += dot_t(bo, g_l)
                wg_ref[kh, 1] += dot_t(be, g)
                wg_ref[kh, 2] += dot_t(bo, g)

    return kernel


@functools.partial(jax.jit, static_argnames=("p", "rh", "interpret",
                                             "precision"))
def _s2_wgrad_dband(xe, xo, gy, *, p: int = 8, rh: int = 8,
                    interpret: bool = False, precision=None):
    cin, d2, h2, w2 = xe.shape
    do, ho = (d2 - 2) // 2, (h2 - 2) // 2
    cout = gy.shape[0]
    win = 2 * p + 1
    sb, rb = do // p, ho // rh
    _check_blocks(2 * rh, rb, w2, interpret)
    rwin = _round8(2 * rh + 1)
    xe = _pad_rows(xe, (rb - 1) * 2 * rh + rwin)
    xo = _pad_rows(xo, (rb - 1) * 2 * rh + rwin)
    _check_vmem(2 * 2 * cin * win * rwin * w2 * xe.dtype.itemsize,
                tag="dband s2 windows")
    kern = _make_s2_wgrad_kernel((cin, cout, p, rh, rwin, w2, sb, rb),
                                 INTERP if precision is None else precision)
    return pl.pallas_call(
        kern,
        grid=(sb, rb),
        in_specs=[
            pl.BlockSpec((cout, p, rh, w2), lambda s, r: (0, s, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((3, 3, cin * win, cout * p),
                               lambda s, r: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin * win, cout * p),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, cin, win, rwin, w2), xe.dtype),
            pltpu.VMEM((2, cin, win, rwin, w2), xe.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(gy, xe, xo)


# ------------------------------------------------------------ custom VJP ---


def _flip_swap(kernel):
    """(3,3,3,Cin,Cout) -> spatially flipped, io-swapped — the dgrad
    kernel of a stride-1 'same' conv."""
    return jnp.flip(kernel, (0, 1, 2)).transpose(0, 1, 2, 4, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def conv3d_s1(x, kernel, p: int = 8, rh: int = 8,
              interpret: bool | None = None, precision=None,
              dtype=None):
    """Differentiable stride-1 3x3x3 'same' conv, channel-major
    (C, D, H, W) x -> (Cout, D, H, W). D % p == 0, H % rh == 0 required.

    Forward/dgrad/wgrad all run the depth-band Pallas kernels; gradients
    flow to both x and the dense kernel."""
    return _s1_fwd(x, kernel, p, rh, interpret, precision, dtype)


def _interp_flag(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


def _cast_prec(dtype, precision):
    """(cast fn, effective precision): with a reduced compute dtype the
    matmul precision must be DEFAULT (bf16 operands reject f32 contract
    levels in Mosaic); accumulation stays f32 either way."""
    if dtype is None:
        return (lambda v: v), precision
    return (lambda v: v.astype(dtype)), jax.lax.Precision.DEFAULT


def _s1_fwd(x, kernel, p, rh, interpret, precision, dtype):
    cast, precision = _cast_prec(dtype, precision)
    a = cast(build_a(kernel, P=p))
    w = x.shape[3]
    y = conv3d_s1_dband(cast(_pad_w(pad_dh(x), _round128(w))), a, p=p,
                        rh=rh, interpret=_interp_flag(interpret),
                        precision=precision)
    return y[..., :w]


def _s1_fwd_rule(x, kernel, p, rh, interpret, precision, dtype):
    return _s1_fwd(x, kernel, p, rh, interpret, precision,
                       dtype), (x, kernel)


def _s1_bwd_rule(p, rh, interpret, precision, dtype, res, gy):
    x, kernel = res
    itp = _interp_flag(interpret)
    cast, precision = _cast_prec(dtype, precision)
    w, wt = x.shape[3], _round128(x.shape[3])
    a_t = cast(build_a(_flip_swap(kernel), P=p))
    gx = conv3d_s1_dband(cast(_pad_w(pad_dh(gy), wt)), a_t, p=p, rh=rh,
                         interpret=itp, precision=precision)[..., :w]
    wg = _s1_wgrad_dband(cast(_pad_w(pad_dh(x), wt)),
                         cast(_pad_w(gy, wt)), p=p, rh=rh,
                         interpret=itp, precision=precision)
    gk = _wgrad_extract(wg, x.shape[0], gy.shape[0], P=p)
    return gx, gk


conv3d_s1.defvjp(_s1_fwd_rule, _s1_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def conv3d_s2(x, kernel, p: int = 8, rh: int = 8,
              interpret: bool | None = None, precision=None,
              dtype=None):
    """Differentiable stride-2 3x3x3 conv (pad 1), channel-major
    (Cin, D, H, W) -> (Cout, D/2, H/2, W/2). (D/2) % p == 0,
    (H/2) % rh == 0, W even."""
    return _s2_fwd(x, kernel, p, rh, interpret, precision, dtype)


def _s2_fwd(x, kernel, p, rh, interpret, precision, dtype):
    cast, precision = _cast_prec(dtype, precision)
    a = cast(build_a(kernel, P=p, stride=2))
    w2 = x.shape[3] // 2
    xe, xo = split_w(cast(_pad_w(pad_dh(x), 2 * _round128(w2))))
    return conv3d_s2_dband(xe, xo, a, p=p, rh=rh,
                           interpret=_interp_flag(interpret),
                           precision=precision)[..., :w2]


def _s2_fwd_rule(x, kernel, p, rh, interpret, precision, dtype):
    return _s2_fwd(x, kernel, p, rh, interpret, precision,
                       dtype), (x, kernel)


def _s2_bwd_rule(p, rh, interpret, precision, dtype, res, gy):
    x, kernel = res
    itp = _interp_flag(interpret)
    cast, precision = _cast_prec(dtype, precision)
    w2 = gy.shape[3]
    wt2 = _round128(w2)
    # dgrad: the transposed structure == the up kernel with the flipped/
    # swapped kernel (gx[i] = sum_kd K[kd] gy[(i+1-kd)/2])
    a_up = cast(build_a_up(_flip_swap(kernel), P=p))
    oe, oo = conv3d_up_dband(cast(_pad_w(pad_dh(gy), wt2)), a_up, p=p,
                             rh=rh, interpret=itp, precision=precision)
    gx = interleave_w(oe[..., :w2], oo[..., :w2])
    xe, xo = split_w(cast(_pad_w(pad_dh(x), 2 * wt2)))
    wg = _s2_wgrad_dband(xe, xo, cast(_pad_w(gy, wt2)), p=p, rh=rh,
                         interpret=itp, precision=precision)
    gk = _wgrad_extract(wg, x.shape[0], gy.shape[0], P=p, stride=2)
    return gx, gk


conv3d_s2.defvjp(_s2_fwd_rule, _s2_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def conv3d_up(x, kernel, p: int = 8, rh: int = 8,
              interpret: bool | None = None, precision=None,
              dtype=None):
    """Differentiable transposed stride-2 conv (layers.py conv_transpose3d
    semantics, stored pre-flipped kernel), channel-major
    (Cin, D, H, W) -> (Cout, 2D, 2H, 2W). D % p == 0, H % rh == 0."""
    return _up_fwd(x, kernel, p, rh, interpret, precision, dtype)


def _up_fwd(x, kernel, p, rh, interpret, precision, dtype):
    cast, precision = _cast_prec(dtype, precision)
    a = cast(build_a_up(kernel, P=p))
    w = x.shape[3]
    oe, oo = conv3d_up_dband(cast(_pad_w(pad_dh(x), _round128(w))), a,
                             p=p, rh=rh,
                             interpret=_interp_flag(interpret),
                             precision=precision)
    return interleave_w(oe[..., :w], oo[..., :w])


def _up_fwd_rule(x, kernel, p, rh, interpret, precision, dtype):
    return _up_fwd(x, kernel, p, rh, interpret, precision,
                       dtype), (x, kernel)


def _up_bwd_rule(p, rh, interpret, precision, dtype, res, gy):
    x, kernel = res
    itp = _interp_flag(interpret)
    cast, precision = _cast_prec(dtype, precision)
    w, wt = x.shape[3], _round128(x.shape[3])
    # dgrad: gx[i] = sum_kd K'[kd] gy[2i+1-kd] == the stride-2 kernel with
    # the flipped/swapped kernel
    a2 = cast(build_a(_flip_swap(kernel), P=p, stride=2))
    ge, go = split_w(cast(_pad_w(pad_dh(gy), 2 * wt)))
    gx = conv3d_s2_dband(ge, go, a2, p=p, rh=rh, interpret=itp,
                         precision=precision)[..., :w]
    # wgrad by duality: gw_up[kd, ci, co] = gw_s2(a=gy, b=x)[2-kd, co, ci]
    wg = _s2_wgrad_dband(ge, go, cast(_pad_w(x, wt)), p=p, rh=rh,
                         interpret=itp, precision=precision)
    gk = _flip_swap(_wgrad_extract(wg, gy.shape[0], x.shape[0], P=p,
                                   stride=2))
    return gx, gk


conv3d_up.defvjp(_up_fwd_rule, _up_bwd_rule)


# ------------------------------------------------------------- the U-Net ---


def _abn_cm(p, x, use_running_stats: bool = False, eps: float = 1e-5,
            slope: float = 0.01):
    """layers.abn for channel-MAJOR (C, D, H, W) tensors (stats over
    D, H, W per channel; biased variance, leaky 0.01)."""
    if use_running_stats:
        mean, var = p["mean"], p["var"]
    else:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, (1, 2, 3))
        var = jnp.mean(jnp.square(xf), (1, 2, 3)) - jnp.square(mean)
    bc = (slice(None), None, None, None)
    y = (x.astype(jnp.float32) - mean[bc]) \
        * jax.lax.rsqrt(var + eps)[bc] * p["scale"][bc] + p["bias"][bc]
    return jnp.where(y >= 0, y, slope * y).astype(x.dtype)


def _pick_block(n: int, cap: int = 8) -> int:
    for b in range(min(n, cap), 0, -1):
        if n % b == 0:
            return b
    return 1


def _pick_rows(h: int) -> int:
    """Row-block size for the (sublane) H axis: Mosaic requires the
    second-to-last block dim be a multiple of 8 or span the whole axis
    (deep U-Net levels hit H=44/22 at DTU 640x512)."""
    return 8 if h % 8 == 0 else h


def cost_reg_dband_apply(params, x_cm, use_running_stats: bool = False,
                         interpret: bool | None = None, precision=None,
                         dtype=None):
    """CostRegNet via the depth-band Pallas kernels (drop-in third
    implementation next to cost_reg_apply / cost_reg_packed_apply — same
    params pytree, same output up to float summation order).

    Args:
        x_cm: (Cin, D, H, W) channel-major cost volume (the fused sweep
            kernel's natural layout) with D, H, W divisible by 8.

    Returns:
        (D, H, W, 8) channel-last encoding volume (float32).
    """
    cin, d0, h0, w0 = x_cm.shape
    assert d0 % 8 == 0 and h0 % 8 == 0 and w0 % 8 == 0, (d0, h0, w0)
    if dtype is not None and dtype != jnp.float32:
        # Validated dead end, kept as a hard error rather than a silent
        # miscompile: Mosaic relocates bf16 inputs to VMEM where the
        # window-DMA slice rules differ, and the compile fails at the
        # production shape (docs/status.md round 3). f32 dband itself
        # lost the device A/B decisively (36.1 vs packed 10.2 ms
        # fwd+bwd), so the bf16 variant is not worth a workaround.
        raise NotImplementedError(
            "dband bf16 does not compile on device (Mosaic VMEM slice "
            "rules); use dtype=None/f32, or costreg_impl='packed'")

    def blocks(conv, y):
        # block sizes constrain the kernel's grid: output dims for the
        # encoders (halved by s2), input dims for the up decoders
        d, h = y.shape[1], y.shape[2]
        if conv is conv3d_s2:
            d, h = d // 2, h // 2
        return dict(p=_pick_block(d), rh=_pick_rows(h),
                    interpret=interpret, precision=precision, dtype=dtype)

    def enc(name, y, conv):
        p = params[name]
        y = conv(y, p["conv"]["kernel"], **blocks(conv, y))
        return _abn_cm(p["bn"], y, use_running_stats=use_running_stats)

    def dec(name, y):
        p = params[name]
        y = conv3d_up(y, p["deconv"]["kernel"], **blocks(conv3d_up, y))
        return _abn_cm(p["bn"], y, use_running_stats=use_running_stats)

    conv0 = enc("conv0", x_cm, conv3d_s1)
    conv2 = enc("conv2", enc("conv1", conv0, conv3d_s2), conv3d_s1)
    conv4 = enc("conv4", enc("conv3", conv2, conv3d_s2), conv3d_s1)
    y = enc("conv6", enc("conv5", conv4, conv3d_s2), conv3d_s1)
    y = conv4 + dec("conv7", y)
    y = conv2 + dec("conv9", y)
    y = conv0 + dec("conv11", y)
    return y.transpose(1, 2, 3, 0)
