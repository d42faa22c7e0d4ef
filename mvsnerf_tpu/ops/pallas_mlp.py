"""Fused Pallas v0 NeRF-MLP forward+backward for TRAINING steps.

Why: the fine-tune step's XLA MLP backward costs ~5.4 ms of the ~21 ms
step and is precision-INdependent (scripts/decompose_finetune_fwd.py,
scripts/probe_mlp_bwd.py) — it is bound by streaming ~20 f32
(131072, 128) activation tensors through HBM, not by MXU passes. Keeping
one R-row block's activations VMEM-resident and recomputing them in the
backward removes that traffic entirely: per block the only HBM moves are
x (R, 128), the cotangent (R, 128), d_feats (R, 128), and the
VMEM-resident parameter-gradient accumulators written once at the end.

Semantics match `models/nerf_mlp.mlp_v0_apply` (reference
models.py:145-222: Renderer_ours — multiplicative pts_bias cascade, skip
concat after layer 4, relu alpha head, sigmoid rgb head) for the
checkpoint geometry in_ch_pts=63, in_ch_feat=20, in_ch_views=3, W=128,
D=6, skips=(4,), view head width 64.

Packed layout (everything 128-lane MXU-native, no in-kernel lane
slicing):
  x row (128,): [pts_pe 0:63 | feats 63:83 | views 83:86 | zeros]
  weight stack (13, 128, 128), zero-padded rows/cols:
    0 Wb   pts_bias      rows 63:83
    1 W0   pts_linears.0 rows 0:63
    2-5    pts_linears.1-4
    6 W5p  pts_linears.5 rows 0:63  (skip-concat pts half)
    7 W5h  pts_linears.5 rows 63:191 -> 0:128 (h half)
    8 Wa   alpha_linear  col 3      (alpha lands on out lane 3 directly)
    9 Wf   feature_linear
    10 Wvf views_linears.0 rows 0:128, cols 0:64
    11 Wvv views_linears.0 rows 128:131 -> x rows 83:86, cols 0:64
    12 Wr  rgb_linear    rows 0:64, cols 0:3
  bias stack (16, 128): rows [bb, b0..b5, ba(lane 3), bf, bv, br] zero-pad
  output row (128,): [rgb 0:3 | alpha 3 | zeros]

GRADIENT CONTRACT: the input cotangent is returned ONLY for the feats
lanes 63:83 (the pts_bias path) — pts_pe and viewdirs gradients are
structurally ZERO in both trainers (geometry and view directions are
never trainable; feats carry the volume/MVSNet gradients), so the
`mlp_v0_train` custom VJP returns zeros for them and must not be used
for e.g. pose refinement. `d feats` is exact.

Training-numerics knob: `precision` — 'default' = one bf16 MXU pass per
dot (operands truncated exactly like every other DEFAULT-precision
matmul in the step), 'high' = 3-pass bf16 split emulation (~6e-3 abs rgb
error vs f32 on the v0 checkpoint; Mosaic has no native HIGH lowering).
Parameter-gradient accumulation is always f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_volgather import _auto_interpret

IN_PTS, IN_FEAT, IN_VIEWS = 63, 20, 3
IN_CH = IN_PTS + IN_FEAT + IN_VIEWS          # 86
_W, _VH = 128, 64                             # trunk width, view head width
_NW, _NB = 13, 16                             # weight / bias stack rows


def _plain_dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)


def _split_dot(a, b, dims):
    """3-pass bf16 emulation of a float32 dot (lax.Precision.HIGH, which
    Mosaic does not lower in-kernel): hi/lo split, drop lo*lo."""
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(dims, ((), ())),
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))


_DOTS = {"default": _plain_dot, "high": _split_dot}


def _forward(x, w, b, dot):
    """Shared fwd recompute; returns every tensor the backward needs."""
    mm = lambda a, k: dot(a, w[k], ((1,), (0,)))  # noqa: E731
    bias = mm(x, 0) + b[0]
    pres, hs = [], []
    h = x
    for i in range(5):                        # layers 0..4 (stack 1..5)
        pre = mm(h if i else x, 1 + i) + b[1 + i]
        t = pre * bias
        h = jax.nn.relu(t)
        pres.append(pre)
        hs.append(h)
    pre5 = mm(x, 6) + mm(h, 7) + b[6]
    t5 = pre5 * bias
    h5 = jax.nn.relu(t5)
    pre_a = mm(h5, 8) + b[7]                  # alpha on lane 3
    feat = mm(h5, 9) + b[8]
    pre_v = mm(feat, 10) + mm(x, 11) + b[9]
    hv = jax.nn.relu(pre_v)
    pre_r = mm(hv, 12) + b[10]
    return bias, pres, hs, pre5, h5, pre_a, feat, pre_v, hv, pre_r


def _out_block(pre_a, pre_r, lane):
    rgb = jax.nn.sigmoid(pre_r)
    return (jnp.where(lane < 3, rgb, 0.0)
            + jnp.where(lane == 3, jax.nn.relu(pre_a), 0.0))


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, *, r, precision):
    dot = _DOTS[precision]
    x = x_ref[:]
    w = [w_ref[k] for k in range(_NW)]
    b = [b_ref[k:k + 1, :] for k in range(_NB)]
    (_, _, _, _, _, pre_a, _, _, _, pre_r) = _forward(x, w, b, dot)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, _W), 1)
    out_ref[:] = _out_block(pre_a, pre_r, lane)


def _bwd_kernel(x_ref, g_ref, w_ref, b_ref, dx_ref, dw_ref, db_ref, *,
                r, precision):
    dot = _DOTS[precision]
    i_blk = pl.program_id(0)

    @pl.when(i_blk == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[:]
    g = g_ref[:]
    w = [w_ref[k] for k in range(_NW)]
    b = [b_ref[k:k + 1, :] for k in range(_NB)]
    (bias, pres, hs, pre5, h5, pre_a, feat, pre_v, hv,
     pre_r) = _forward(x, w, b, dot)

    cT = lambda a, bb: dot(a, bb, ((0,), (0,)))   # noqa: E731  a^T @ b
    cO = lambda a, k: dot(a, w[k], ((1,), (1,)))  # noqa: E731  a @ W^T

    lane = jax.lax.broadcasted_iota(jnp.int32, (r, _W), 1)
    sig = jax.nn.sigmoid(pre_r)
    d_pre_r = jnp.where(lane < 3, g, 0.0) * sig * (1.0 - sig)
    d_pre_a = jnp.where(lane == 3, g, 0.0) * (pre_a > 0.0)

    dw_ref[12] += cT(hv, d_pre_r)
    db_ref[10:11] += jnp.sum(d_pre_r, axis=0, keepdims=True)
    dhv = cO(d_pre_r, 12)
    d_pre_v = dhv * (pre_v > 0.0)
    dw_ref[10] += cT(feat, d_pre_v)
    dw_ref[11] += cT(x, d_pre_v)
    db_ref[9:10] += jnp.sum(d_pre_v, axis=0, keepdims=True)
    dfeat = cO(d_pre_v, 10)

    dw_ref[8] += cT(h5, d_pre_a)
    db_ref[7:8] += jnp.sum(d_pre_a, axis=0, keepdims=True)
    dw_ref[9] += cT(h5, dfeat)
    db_ref[8:9] += jnp.sum(dfeat, axis=0, keepdims=True)
    dh = cO(dfeat, 9) + cO(d_pre_a, 8)

    dt5 = dh * (pre5 * bias > 0.0)
    dbias = dt5 * pre5
    dpre5 = dt5 * bias
    dw_ref[6] += cT(x, dpre5)
    dw_ref[7] += cT(hs[4], dpre5)
    db_ref[6:7] += jnp.sum(dpre5, axis=0, keepdims=True)
    dh = cO(dpre5, 7)

    for i in (4, 3, 2, 1, 0):
        dt = dh * (pres[i] * bias > 0.0)
        dbias = dbias + dt * pres[i]
        dpre = dt * bias
        dw_ref[1 + i] += cT(hs[i - 1] if i else x, dpre)
        db_ref[1 + i:2 + i] += jnp.sum(dpre, axis=0, keepdims=True)
        if i:
            dh = cO(dpre, 1 + i)

    dw_ref[0] += cT(x, dbias)
    db_ref[0:1] += jnp.sum(dbias, axis=0, keepdims=True)
    dx_ref[:] = cO(dbias, 0)      # feats lanes only (Wb rows 63:83)


# ------------------------------------------------------- pack / unpack ---


def _pk(kernel, rows, cols, r0=0, c0=0):
    return jnp.zeros((_W, _W), jnp.float32).at[
        r0:r0 + rows, c0:c0 + cols].set(kernel.astype(jnp.float32))


def pack_mlp_v0(params):
    """(13, 128, 128) weight stack + (16, 128) bias stack (layout above)."""
    pls = params["pts_linears"]
    vl = params["views_linears"][0]
    w = jnp.stack([
        _pk(params["pts_bias"]["kernel"], IN_FEAT, _W, r0=IN_PTS),
        _pk(pls[0]["kernel"], IN_PTS, _W),
        _pk(pls[1]["kernel"], _W, _W),
        _pk(pls[2]["kernel"], _W, _W),
        _pk(pls[3]["kernel"], _W, _W),
        _pk(pls[4]["kernel"], _W, _W),
        _pk(pls[5]["kernel"][:IN_PTS], IN_PTS, _W),
        _pk(pls[5]["kernel"][IN_PTS:], _W, _W),
        _pk(params["alpha_linear"]["kernel"], _W, 1, c0=3),
        _pk(params["feature_linear"]["kernel"], _W, _W),
        _pk(vl["kernel"][:_W], _W, _VH),
        _pk(vl["kernel"][_W:], IN_VIEWS, _VH, r0=IN_PTS + IN_FEAT),
        _pk(params["rgb_linear"]["kernel"], _VH, 3),
    ])
    z = jnp.zeros((_W,), jnp.float32)
    row = lambda v, c0=0: z.at[c0:c0 + v.shape[0]].set(  # noqa: E731
        v.astype(jnp.float32))
    b = jnp.stack([
        row(params["pts_bias"]["bias"]),
        row(pls[0]["bias"]), row(pls[1]["bias"]), row(pls[2]["bias"]),
        row(pls[3]["bias"]), row(pls[4]["bias"]), row(pls[5]["bias"]),
        row(params["alpha_linear"]["bias"], c0=3),
        row(params["feature_linear"]["bias"]),
        row(vl["bias"]),
        row(params["rgb_linear"]["bias"]),
        z, z, z, z, z,
    ])
    return w, b


def unpack_grads_v0(params, dw, db):
    """Slice the packed (13,128,128)/(16,128) grads back into the v0
    params pytree structure (zero-pad rows/cols discarded)."""
    g = lambda k, rows, cols, r0=0, c0=0: (  # noqa: E731
        dw[k, r0:r0 + rows, c0:c0 + cols])
    out = {
        "pts_bias": {"kernel": g(0, IN_FEAT, _W, r0=IN_PTS),
                     "bias": db[0]},
        "pts_linears": [
            {"kernel": g(1, IN_PTS, _W), "bias": db[1]},
            {"kernel": g(2, _W, _W), "bias": db[2]},
            {"kernel": g(3, _W, _W), "bias": db[3]},
            {"kernel": g(4, _W, _W), "bias": db[4]},
            {"kernel": g(5, _W, _W), "bias": db[5]},
            {"kernel": jnp.concatenate([g(6, IN_PTS, _W), g(7, _W, _W)]),
             "bias": db[6]},
        ],
        "alpha_linear": {"kernel": g(8, _W, 1, c0=3), "bias": db[7, 3:4]},
        "feature_linear": {"kernel": g(9, _W, _W), "bias": db[8]},
        "views_linears": [
            {"kernel": jnp.concatenate(
                [g(10, _W, _VH),
                 g(11, IN_VIEWS, _VH, r0=IN_PTS + IN_FEAT)]),
             "bias": db[9, :_VH]},
        ],
        "rgb_linear": {"kernel": g(12, _VH, 3), "bias": db[10, :3]},
    }
    return jax.tree.map(lambda ref, gg: gg.astype(ref.dtype), params, out)


def mlp_v0_fits(params, x) -> bool:
    """Static shape gate for the fused kernel (checkpoint geometry only)."""
    try:
        pls = params["pts_linears"]
        return (x.shape[-1] == IN_CH and len(pls) == 6
                and pls[0]["kernel"].shape == (IN_PTS, _W)
                and pls[5]["kernel"].shape == (IN_PTS + _W, _W)
                and params["pts_bias"]["kernel"].shape == (IN_FEAT, _W)
                and params["views_linears"][0]["kernel"].shape
                == (_W + IN_VIEWS, _VH)
                and all("bias" in p for p in pls))
    except (KeyError, IndexError, TypeError):
        return False


# --------------------------------------------------------- custom VJP ---


def _pick_r(n: int) -> int:
    for r in (1024, 512, 256, 128, 64, 32, 16, 8):
        if n % r == 0:
            return r
    raise ValueError(f"N={n} not a multiple of 8")


def _pad_x(x2):
    n = x2.shape[0]
    return jnp.pad(x2, ((0, 0), (0, _W - IN_CH))), n


def _fwd_impl(w, b, x2, precision, interpret):
    xp, n = _pad_x(x2)
    r = _pick_r(n)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, r=r, precision=precision),
        grid=(n // r,),
        in_specs=[pl.BlockSpec((r, _W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_NW, _W, _W), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_NB, _W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((r, _W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, _W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(xp, w, b)
    return out[:, :4]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mlp_v0_train(params, x, precision: str = "default",
                 interpret: bool | None = None):
    """Fused-kernel v0 MLP for training losses. x: (..., 86) packed
    [pts_pe | feats | views]; returns (..., 4) [rgb, alpha].

    Gradients: exact for params and the feats slice x[..., 63:83];
    ZERO (by the training-graph contract, see module doc) for the
    pts_pe and views slices.
    """
    lead = x.shape[:-1]
    w, b = pack_mlp_v0(params)
    out = _fwd_impl(w, b, x.reshape(-1, IN_CH), precision, interpret)
    return out.reshape(*lead, 4)


def _fwd_rule(params, x, precision, interpret):
    return (mlp_v0_train(params, x, precision, interpret), (params, x))


def _bwd_rule(precision, interpret, res, g):
    params, x = res
    lead = x.shape[:-1]
    x2 = x.reshape(-1, IN_CH)
    g2 = g.reshape(-1, 4)
    w, b = pack_mlp_v0(params)
    xp, n = _pad_x(x2)
    gp = jnp.pad(g2, ((0, 0), (0, _W - 4)))
    r = _pick_r(n)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, r=r, precision=precision),
        grid=(n // r,),
        in_specs=[pl.BlockSpec((r, _W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((r, _W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_NW, _W, _W), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_NB, _W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((r, _W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_NW, _W, _W), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_NB, _W), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, _W), jnp.float32),
                   jax.ShapeDtypeStruct((_NW, _W, _W), jnp.float32),
                   jax.ShapeDtypeStruct((_NB, _W), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_auto_interpret(interpret),
    )(xp, gp, w, b)
    d_params = unpack_grads_v0(params, dw, db)
    d_x = jnp.zeros_like(x2).at[:, IN_PTS:IN_PTS + IN_FEAT].set(
        dx[:, IN_PTS:IN_PTS + IN_FEAT].astype(x.dtype))
    return d_params, d_x.reshape(*lead, IN_CH)


mlp_v0_train.defvjp(_fwd_rule, _bwd_rule)
