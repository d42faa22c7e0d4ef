"""Space-to-depth packed FeatureNet: the same 2-D CNN as
`feature_net_apply` (reference models.py:688-722) with spatial pixel
blocks folded into channels so the wide early levels run at (or near)
128 feature channels.

Why: XLA:TPU lays conv activations out with the feature dim in the
128-wide lane axis. The FeatureNet's channel counts (8/16/32) get
tile-padded up to 16x, and the full-resolution tensors — (V, 512, 640, 8)
at DTU scale — cost ~670 MB of HBM traffic each instead of 42 MB.
Measured: the FeatureNet is ~31 ms of the generalizable train step and
entirely HBM-bound (see docs/status.md round-2 log).

The packing: level l holds (B, H/Ph_l, W/Pw_l, Ph_l*Pw_l*C_l) with packed
lane index (ph*Pw + pw)*C + c. Blocks per level: 4x4 at C=8 (exactly 128
lanes), 2x2 at C=16 (64 lanes), 1x1 at C=32 (natural layout — the packed
net hands off to the plain convs there). Each conv becomes a conv over
the block grid with a sparse packed kernel built per-dimension:
KP[khp, kwp, (pih,piw,ci), (poh,pow,co)] =
Sh[khp,pih,poh,kh] * Sw[kwp,piw,pow,kw] * K[kh,kw,ci,co], where the 0/1
selection S encodes the dense tap arithmetic (stride-2 levels halve the
block size per dim: P_in = stride * P_out, exactly as the depth packing
in models/costreg_packed.py). The packed kernel is built from the SAME
master parameters by a static-selection einsum each call, so autodiff
routes gradients back to the dense kernels and the checkpoint format is
unchanged. Block-granular zero padding reproduces the dense conv's zero
padding exactly (out-of-range taps carry zero selection weights), so
numerics are identical up to float summation order.

Reference: models.py:688-722 (FeatureNet), models.py:661-672 (ConvBnReLU).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp
from jax import lax

from .costreg_packed import _abn_packed

# Per conv: (group, idx, K, stride, pad, Cin, Cout, Pin, Pout) with P the
# per-dim block size (same both dims). Mirrors _FEATURE_CFG in mvsnet.py.
_PACKED_CFG = [
    ("conv0", 0, 3, 1, 1, 3, 8, 4, 4),
    ("conv0", 1, 3, 1, 1, 8, 8, 4, 4),
    ("conv1", 0, 5, 2, 2, 8, 16, 4, 2),
    ("conv1", 1, 3, 1, 1, 16, 16, 2, 2),
    ("conv1", 2, 3, 1, 1, 16, 16, 2, 2),
    ("conv2", 0, 5, 2, 2, 16, 32, 2, 1),
]
# conv2[1], conv2[2], toplayer run at 1x1 blocks == the plain layout.


@functools.lru_cache(maxsize=None)
def _sel1d(K: int, s: int, p: int, p_in: int, p_out: int):
    """0/1 selection S[kdp, pi, po, kd]: packed window tap (kdp, pi) feeds
    dense tap kd of output sub-position po iff the absolute input
    coordinates match: P_in*(kdp - 1) + pi == s*po + kd - p (window of 3
    blocks centred on the output block; requires P_in == s*P_out so the
    relation is independent of the block index)."""
    assert p_in == s * p_out, (p_in, s, p_out)
    sel = np.zeros((3, p_in, p_out, K), np.float32)
    for kdp in range(3):
        for pi in range(p_in):
            for po in range(p_out):
                for kd in range(K):
                    if p_in * (kdp - 1) + pi == s * po + kd - p:
                        sel[kdp, pi, po, kd] = 1.0
    # the 3-block window must cover the dense receptive field
    lo, hi = -p, s * (p_out - 1) + K - 1 - p
    assert -p_in <= lo and hi <= 2 * p_in - 1, (K, s, p, p_in, lo, hi)
    return sel  # numpy: caching a traced jax array would leak tracers


def _pack_kernel2d(kernel, K: int, s: int, p: int, p_in: int, p_out: int):
    """Dense (K, K, Cin, Cout) -> packed (3, 3, Pin^2*Cin, Pout^2*Cout)."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    sel = jnp.asarray(_sel1d(K, s, p, p_in, p_out))
    kp = jnp.einsum("aimx,bjny,xyco->abijcmno", sel, sel, kernel,
                    preferred_element_type=jnp.float32)
    return kp.reshape(3, 3, p_in * p_in * cin, p_out * p_out * cout)


def pack_image(x, P: int):
    """(B, H, W, C) -> (B, H/P, W/P, P*P*C), lane index (ph*P + pw)*C + c."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // P, P, w // P, P, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // P, w // P,
                                                 P * P * c)


def unpack_image(x, P: int):
    b, hb, wb, pc = x.shape
    c = pc // (P * P)
    y = x.reshape(b, hb, wb, P, P, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hb * P, wb * P, c)


def feature_net_packed_apply(params, x, use_running_stats: bool = False,
                             dtype=None):
    """Drop-in equivalent of `feature_net_apply` (same params pytree, same
    output) for inputs with H % 4 == 0 and W % 4 == 0.

    `dtype=jnp.bfloat16` runs the packed convs in bf16 (f32 masters, f32
    ABN stats, f32 output)."""
    from .mvsnet import _FEATURE_CFG, conv2d_bias
    from .layers import abn, conv2d

    b, h, w, _ = x.shape
    assert h % 4 == 0 and w % 4 == 0, (h, w)

    def cast(v):
        return v.astype(dtype) if dtype is not None else v

    y = pack_image(cast(x), 4)
    for group, idx, K, s, p, cin, cout, p_in, p_out in _PACKED_CFG:
        prm = params[group][idx]
        kp = cast(_pack_kernel2d(prm["conv"]["kernel"], K, s, p,
                                 p_in, p_out))
        y = lax.conv_general_dilated(
            y, kp, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _abn_packed(prm["bn"], y, p_out * p_out,
                        use_running_stats=use_running_stats, dtype=dtype)
    # conv2[0] lands at 1x1 blocks == the natural (B, H/4, W/4, 32) layout
    for i in (1, 2):
        prm = params["conv2"][i]
        k, s, p, _, _ = _FEATURE_CFG["conv2"][i]
        y = conv2d({"kernel": cast(prm["conv"]["kernel"])}, y,
                   stride=s, padding=p)
        y = abn(prm["bn"], y, use_running_stats=use_running_stats)
    y = conv2d_bias({"kernel": cast(params["toplayer"]["kernel"]),
                     "bias": cast(params["toplayer"]["bias"])}, y)
    return y.astype(jnp.float32)
