"""The encoding-volume builder: FeatureNet (2D CNN), CostRegNet (3D U-Net),
and the MVSNet plane-sweep pipeline.

Functional re-design of reference models.py:661-932 for TPU: channel-last
layouts, `lax.conv_general_dilated` everywhere, the per-view warp loop
replaced by a vmapped batched sweep (ops/homography.py), and batch-stats
normalization by default (the reference keeps MVSNet in train mode even at
inference — SURVEY.md §2.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.homography import build_cost_volume
from .layers import (
    abn,
    conv2d,
    conv3d,
    conv_transpose3d,
    init_abn,
    init_conv2d,
    init_conv3d,
    linear,
)


# ------------------------------------------------------------ FeatureNet ----

# (kernel, stride, pad) per conv, grouped as in reference models.py:695-709.
_FEATURE_CFG = {
    "conv0": [(3, 1, 1, 3, 8), (3, 1, 1, 8, 8)],
    "conv1": [(5, 2, 2, 8, 16), (3, 1, 1, 16, 16), (3, 1, 1, 16, 16)],
    "conv2": [(5, 2, 2, 16, 32), (3, 1, 1, 32, 32), (3, 1, 1, 32, 32)],
}


def feature_net_apply(params, x, use_running_stats: bool = False,
                      dtype=None):
    """x: (B, H, W, 3) -> (B, H/4, W/4, 32) stride-4 features
    (models.py:715-722).

    `dtype=jnp.bfloat16` runs the convs with bf16 activations/weights
    (f32 ABN statistics, f32 output): the 8/16/32-channel activations are
    lane-padded up to 16x by XLA, so the net is HBM-bound and bf16 halves
    that traffic."""
    def cast(v):
        return v.astype(dtype) if dtype is not None else v

    x = cast(x)
    for group, cfg in _FEATURE_CFG.items():
        for i, (k, s, pad, cin, cout) in enumerate(cfg):
            p = params[group][i]
            x = conv2d({"kernel": cast(p["conv"]["kernel"])}, x,
                       stride=s, padding=pad)
            x = abn(p["bn"], x, use_running_stats=use_running_stats)
    x = conv2d_bias({"kernel": cast(params["toplayer"]["kernel"]),
                     "bias": cast(params["toplayer"]["bias"])}, x)
    return x.astype(jnp.float32)


def conv2d_bias(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"]


def init_feature_net(key):
    params = {}
    keys = jax.random.split(key, 16)
    ki = iter(keys)
    for group, cfg in _FEATURE_CFG.items():
        params[group] = [
            {"conv": init_conv2d(next(ki), k, k, cin, cout),
             "bn": init_abn(cout)}
            for (k, s, pad, cin, cout) in cfg
        ]
    top = init_conv2d(next(ki), 1, 1, 32, 32)
    top["bias"] = jnp.zeros((32,), jnp.float32)
    params["toplayer"] = top
    return params


# ------------------------------------------------------------ CostRegNet ----

# Encoder convs: name -> (stride, cin, cout) (models.py:728-737).
_COSTREG_ENC = [
    ("conv0", 1, None, 8),   # cin filled from in_channels
    ("conv1", 2, 8, 16),
    ("conv2", 1, 16, 16),
    ("conv3", 2, 16, 32),
    ("conv4", 1, 32, 32),
    ("conv5", 2, 32, 64),
    ("conv6", 1, 64, 64),
]
# Decoder transposed convs: name -> (cin, cout) (models.py:739-752).
_COSTREG_DEC = [("conv7", 64, 32), ("conv9", 32, 16), ("conv11", 16, 8)]


def cost_reg_apply(params, x, use_running_stats: bool = False, dtype=None):
    """3-D U-Net: x (B, D, H, W, Cin) -> (B, D, H, W, 8) (models.py:756-769).

    The three stride-2 levels require D, H, W divisible by 8 (the reference
    has the same implicit constraint: D=128, stride-4 features + pad 24).
    Inputs that don't divide are zero-padded up to the next multiple of 8
    and the output cropped back — a no-op at reference resolutions, and it
    keeps small/odd debug resolutions working.

    `dtype=jnp.bfloat16` runs the convs in bf16 (params stay f32 masters —
    the cast is inside, so autodiff yields f32 grads; ABN statistics are
    always f32, see layers.abn). Output is cast back to f32.
    """
    _, d0, h0, w0, _ = x.shape
    pads = [(-s) % 8 for s in (d0, h0, w0)]
    if any(pads):
        x = jnp.pad(x, ((0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]),
                        (0, 0)))
    if dtype is not None:
        x = x.astype(dtype)

    def cast(p):
        return {"kernel": p["kernel"].astype(dtype)} if dtype is not None \
            else p

    def enc(name, y, stride):
        p = params[name]
        y = conv3d(cast(p["conv"]), y, stride=stride, padding=1)
        return abn(p["bn"], y, use_running_stats=use_running_stats)

    def dec(name, y):
        p = params[name]
        y = conv_transpose3d(cast(p["deconv"]), y)
        return abn(p["bn"], y, use_running_stats=use_running_stats)

    conv0 = enc("conv0", x, 1)
    conv2 = enc("conv2", enc("conv1", conv0, 2), 1)
    conv4 = enc("conv4", enc("conv3", conv2, 2), 1)
    y = enc("conv6", enc("conv5", conv4, 2), 1)
    y = conv4 + dec("conv7", y)
    y = conv2 + dec("conv9", y)
    y = conv0 + dec("conv11", y)
    if any(pads):
        y = y[:, :d0, :h0, :w0]
    return y.astype(jnp.float32)


def init_cost_reg(key, in_channels: int = 41):
    params = {}
    keys = iter(jax.random.split(key, 16))
    cin0 = in_channels
    for name, stride, cin, cout in _COSTREG_ENC:
        c_in = cin0 if cin is None else cin
        params[name] = {"conv": init_conv3d(next(keys), 3, 3, 3, c_in, cout),
                        "bn": init_abn(cout)}
    for name, cin, cout in _COSTREG_DEC:
        params[name] = {"deconv": init_conv3d(next(keys), 3, 3, 3, cin, cout),
                        "bn": init_abn(cout)}
    return params


# --------------------------------------------------------------- MVSNet -----

N_DEPTH_PLANES = 128  # hardcoded in the reference (models.py:914)


def resolve_warp_mode(mode: str = "auto") -> str:
    """'auto' -> the fused Pallas sweep on TPU, packed gather elsewhere
    (Pallas runs in interpret mode off-TPU — correct but slow)."""
    if mode == "auto":
        import jax
        return "pallas" if jax.default_backend() == "tpu" else "packed"
    return mode


def depth_plane_values(near, far, n_planes: int = N_DEPTH_PLANES,
                       lindisp: bool = False):
    """Sweep-plane depths (models.py:915-920)."""
    t = jnp.linspace(0.0, 1.0, n_planes)
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    return near * (1.0 - t) + far * t


def resolve_featurenet_impl(impl: str, h: int, w: int) -> str:
    """'auto' -> the space-to-depth packed FeatureNet
    (models/featurenet_packed.py) when the image shape conforms
    (H%4, W%4) — XLA lane-pads the plain net's 8/16-channel full-res
    activations up to 16x in HBM. 'plain' forces the reference layout."""
    if impl == "auto":
        return "packed" if (h % 4 == 0 and w % 4 == 0) else "plain"
    return impl


def resolve_costreg_impl(impl: str, d: int, hp: int, wp: int) -> str:
    """'auto' -> the depth-packed U-Net (models/costreg_packed.py) when the
    shape conforms (D%16, H%8, W%8) — XLA lane-pads the plain U-Net's small
    channel counts up to 16x in HBM, which dominates the generalizable
    step on TPU. 'plain' forces the reference-layout implementation;
    'dband' the depth-band Pallas kernels (ops/pallas_costreg.py,
    channel-major, D/H/W % 8)."""
    if impl == "auto":
        return "packed" if (d % 16 == 0 and hp % 8 == 0 and wp % 8 == 0) \
            else "plain"
    if impl == "dband" and not (d % 8 == 0 and hp % 8 == 0
                                and wp % 8 == 0):
        return "plain"
    return impl


def mvsnet_apply(params, imgs, proj_mats, near_far, pad: int = 0,
                 lindisp: bool = False, n_planes: int = N_DEPTH_PLANES,
                 use_running_stats: bool = False,
                 warp_mode: str = "packed",
                 costreg_impl: str = "auto",
                 featurenet_impl: str = "auto"):
    """Build the neural encoding volume (models.py:895-932).

    Args:
        imgs: (V, H, W, 3) normalized source images, view 0 = reference.
        proj_mats: (V, 3, 4) stride-4-scale projections relative to view 0.
        near_far: (2,) reference-view depth range.
        pad: cost-volume padding in feature pixels.
        warp_mode: plane-sweep warp implementation — 'packed' (corner-packed
            gather fwd + banded splat bwd), 'banded' (dense banded matmuls),
            or 'pallas' (fused TPU kernel, ops/pallas_sweep.py).
        costreg_impl: 'auto' | 'plain' | 'packed' — see resolve_costreg_impl.
        featurenet_impl: 'auto' | 'plain' | 'packed' — see
            resolve_featurenet_impl.

    Returns:
        volume: (D, hp, wp, 8) encoding volume (channel-last),
        colors: (V, D, hp, wp, 4) per-view warped RGB+mask (return_color data),
        depth_values: (D,).
    """
    V, H, W, _ = imgs.shape
    if resolve_featurenet_impl(featurenet_impl, H, W) == "packed":
        from .featurenet_packed import feature_net_packed_apply
        feats = feature_net_packed_apply(
            params["feature"], imgs, use_running_stats=use_running_stats)
    else:
        feats = feature_net_apply(params["feature"], imgs,
                                  use_running_stats=use_running_stats)
    # resolve from the REAL feature-map shape (H or W not divisible by 4
    # makes the H//4 prediction disagree with the stride-4 conv output)
    hp, wp = feats.shape[1] + 2 * pad, feats.shape[2] + 2 * pad
    impl = resolve_costreg_impl(costreg_impl, n_planes, hp, wp)
    depth_values = depth_plane_values(near_far[0], near_far[1], n_planes,
                                      lindisp)
    layout = {"packed": "packed16", "dband": "cmajor"}.get(impl, "dense")
    cost, in_masks, colors = build_cost_volume(imgs, feats, proj_mats,
                                               depth_values, pad=pad,
                                               warp_fwd_mode=warp_mode,
                                               cost_layout=layout)
    if impl == "packed":
        from .costreg_packed import cost_reg_packed_apply
        volume = cost_reg_packed_apply(
            params["cost_reg_2"], cost,
            use_running_stats=use_running_stats, packed_input=True)[0]
    elif impl == "dband":
        from ..ops.pallas_costreg import cost_reg_dband_apply
        volume = cost_reg_dband_apply(params["cost_reg_2"], cost,
                                      use_running_stats=use_running_stats)
    else:
        volume = cost_reg_apply(params["cost_reg_2"], cost[None],
                                use_running_stats=use_running_stats)[0]
    return volume, colors, depth_values


def init_mvsnet(key):
    k1, k2 = jax.random.split(key)
    return {"feature": init_feature_net(k1),
            "cost_reg_2": init_cost_reg(k2, in_channels=41)}
