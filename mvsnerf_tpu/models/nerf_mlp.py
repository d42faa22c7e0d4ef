"""NeRF MLP renderer variants (net_type v0 / v1 / v2 / fusion).

Functional equivalents of reference models.py:145-567, preserving the
parity-critical structure (SURVEY.md appendix):

    v0 (Renderer_ours):     h = pts_linears[i](h) * pts_bias(feat)   [mult.]
    v2 (Renderer_linear):   h = pts_linears[i](h) + pts_bias(feat)   [add.]
    v1 (Renderer_attention): additive bias, no skip, color attention over the
        3 per-view (RGB, mask) tokens; output has the fused colors appended
        (models.py:458-461, stripped by the renderer into the feature tensor).
    fusion (Renderer_color_fusion): per-view ray attention for color.

Input layout x = [PE(xyz_ndc) (in_ch_pts) | features (in_ch_feat) | viewdirs
(in_ch_views)]; the mvsnerf-v0 checkpoint uses in_ch_pts=63, in_ch_feat=20,
in_ch_views=3, W=128, D=6, skips=[4] (pts_linears.5 in-dim 191).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.precision import MLP as _MLP_PRECISION
from .layers import init_linear, init_mha, linear, multi_head_attention


# ----------------------------------------------------------------- shared ---

def _pts_trunk(params, input_pts, bias, skips, multiplicative: bool,
               apply_skip: bool = True):
    h = input_pts
    for i, lp in enumerate(params["pts_linears"]):
        h = linear(lp, h)
        h = h * bias if multiplicative else h + bias
        h = jax.nn.relu(h)
        if apply_skip and i in skips:
            h = jnp.concatenate([input_pts, h], axis=-1)
    return h


def _viewdir_head(params, h, input_views):
    """alpha = relu(alpha_linear(h)); rgb = sigmoid(rgb(views MLP))
    (models.py:208-218)."""
    alpha = jax.nn.relu(linear(params["alpha_linear"], h))
    feature = linear(params["feature_linear"], h)
    h = jnp.concatenate([feature, input_views], axis=-1)
    for lp in params["views_linears"]:
        h = jax.nn.relu(linear(lp, h))
    rgb = jax.nn.sigmoid(linear(params["rgb_linear"], h))
    return jnp.concatenate([rgb, alpha], axis=-1)


def _split(x, in_ch_pts, in_ch_views):
    in_ch_feat = x.shape[-1] - in_ch_pts - in_ch_views
    return (x[..., :in_ch_pts],
            x[..., in_ch_pts:in_ch_pts + in_ch_feat],
            x[..., in_ch_pts + in_ch_feat:])


# --------------------------------------------------------------------- v0 ---

def mlp_v0_apply(params, x, in_ch_pts: int, in_ch_views: int,
                 skips=(4,)):
    """Renderer_ours forward (models.py:194-222). x: (..., pts+feat+views).
    Returns (..., 4) RGBA."""
    input_pts, input_feats, input_views = _split(x, in_ch_pts, in_ch_views)
    bias = linear(params["pts_bias"], input_feats)
    h = _pts_trunk(params, input_pts, bias, skips, multiplicative=True)
    return _viewdir_head(params, h, input_views)


def mlp_v0_alpha(params, x, in_ch_pts: int, skips=(4,)):
    """Renderer_ours forward_alpha (models.py:176-191). x: (..., pts+feat)."""
    input_pts = x[..., :in_ch_pts]
    input_feats = x[..., in_ch_pts:]
    bias = linear(params["pts_bias"], input_feats)
    h = _pts_trunk(params, input_pts, bias, skips, multiplicative=True)
    return jax.nn.relu(linear(params["alpha_linear"], h))


# --------------------------------------------------------------------- v2 ---

def mlp_v2_apply(params, x, in_ch_pts: int, in_ch_views: int, skips=(4,)):
    """Renderer_linear forward (models.py:510-538): additive bias."""
    input_pts, input_feats, input_views = _split(x, in_ch_pts, in_ch_views)
    bias = linear(params["pts_bias"], input_feats)
    h = _pts_trunk(params, input_pts, bias, skips, multiplicative=False)
    return _viewdir_head(params, h, input_views)


def mlp_v2_alpha(params, x, in_ch_pts: int, skips=(4,)):
    """Renderer_linear forward_alpha (models.py:495-508): NO relu on alpha."""
    input_pts = x[..., :in_ch_pts]
    input_feats = x[..., in_ch_pts:]
    bias = linear(params["pts_bias"], input_feats)
    h = _pts_trunk(params, input_pts, bias, skips, multiplicative=False)
    return linear(params["alpha_linear"], h)


# --------------------------------------------------------------------- v1 ---

def _v1_color_attention(params, input_feats):
    """Fused color via MHA over per-view (RGB+mask, 4ch) tokens + the 8ch
    volume feature (models.py:426-436)."""
    lead = input_feats.shape[:-1]
    colors = input_feats[..., 8:].reshape(-1, (input_feats.shape[-1] - 8) // 4, 4)
    vol8 = jnp.broadcast_to(
        input_feats[..., :8].reshape(-1, 1, 8),
        (colors.shape[0], colors.shape[1], 8))
    tokens = jnp.concatenate([colors, vol8], axis=-1)  # (N, V, 12)
    out, _ = multi_head_attention(params["color_attention"], tokens, tokens,
                                  tokens, n_head=4, d_k=4, d_v=4)
    fused = jnp.sum(jax.nn.sigmoid(linear(params["weight_out"], out)), axis=-2)
    return fused.reshape(*lead, 3)


def mlp_v1_apply(params, x, in_ch_pts: int, in_ch_views: int, skips=(4,)):
    """Renderer_attention forward (models.py:421-462).

    Returns (..., 10): [rgb(3), alpha(1), colors(3), colors(3)] — the
    reference appends `colors` twice (models.py:458 and 461); the renderer
    strips channels 4: into the feature tensor (renderer.py:157-158).
    """
    input_pts, input_feats, input_views = _split(x, in_ch_pts, in_ch_views)
    if input_feats.shape[-1] > 8 + 3:
        colors = _v1_color_attention(params, input_feats)
    else:
        colors = input_feats[..., -3:]
    bias = linear(params["pts_bias"],
                  jnp.concatenate([input_feats[..., :8], colors], axis=-1))
    # v1 trunk: additive bias, skip connections disabled (models.py:441-445).
    h = _pts_trunk(params, input_pts, bias, skips, multiplicative=False,
                   apply_skip=False)
    out = _viewdir_head(params, h, input_views)
    return jnp.concatenate([out, colors, colors], axis=-1)


# ----------------------------------------------------------------- fusion ---

def mlp_fusion_apply(params, x, in_ch_pts: int, in_ch_views: int,
                     skips=(4,)):
    """Renderer_color_fusion forward (models.py:273-302). x must be
    (N_rays, N_samples, C); per-view ray attention over 3 source colors."""
    input_pts, input_feats, input_views = _split(x, in_ch_pts, in_ch_views)
    bias = linear(params["pts_bias"], input_feats)
    h = _pts_trunk(params, input_pts, bias, skips, multiplicative=True)
    alpha = jax.nn.relu(linear(params["alpha_linear"], h))

    views = input_views.reshape(-1, 3, in_ch_views // 3)
    rgbm = input_feats[..., 8:].reshape(-1, 3, 4)
    rgb_in = rgbm[..., :3]
    feature = jax.nn.relu(linear(params["feature_linear"], h))
    ftok = jnp.broadcast_to(feature.reshape(-1, 1, feature.shape[-1]),
                            (rgb_in.shape[0], 3, feature.shape[-1]))
    tokens = jnp.concatenate([ftok, views, rgb_in], axis=-1)
    out, _ = multi_head_attention(params["ray_attention"], tokens, tokens,
                                  tokens, n_head=4, d_k=4, d_v=4,
                                  mask=rgbm[..., -1:])
    rgb = jax.nn.sigmoid(linear(params["rgb_out"], out))
    rgb = jnp.sum(rgb, axis=1).reshape(*alpha.shape[:-1], 3)
    return jnp.concatenate([rgb, alpha], axis=-1)


def mlp_fusion_alpha(params, x, in_ch_pts: int, skips=(4,)):
    """Renderer_color_fusion forward_alpha (models.py:258-270): NO relu —
    alpha_linear is Sequential(Linear, ReLU) so relu IS applied by the
    module itself."""
    input_pts = x[..., :in_ch_pts]
    input_feats = x[..., in_ch_pts:]
    bias = linear(params["pts_bias"], input_feats)
    h = _pts_trunk(params, input_pts, bias, skips, multiplicative=True)
    return jax.nn.relu(linear(params["alpha_linear"], h))


# ------------------------------------------------------------ init + API ----

def init_mlp(key, net_type: str = "v0", D: int = 6, W: int = 128,
             in_ch_pts: int = 63, in_ch_views: int = 3, in_ch_feat: int = 20,
             skips=(4,)):
    """Parameter pytree for a renderer MLP (matches create_nerf_mvs defaults:
    netdepth=6, netwidth=128, skips=[4] — opt.py:36-39, models.py:585)."""
    keys = iter(jax.random.split(key, D + 16))
    p = {}
    if net_type in ("v0", "v2", "fusion"):
        dims = []
        for i in range(D):
            if i == 0:
                din = in_ch_pts
            elif (i - 1) in skips:
                din = W + in_ch_pts
            else:
                din = W
            dims.append(din)
        p["pts_linears"] = [init_linear(next(keys), d, W) for d in dims]
        p["pts_bias"] = init_linear(next(keys), in_ch_feat, W)
    if net_type in ("v0", "v2"):
        p["views_linears"] = [init_linear(next(keys), in_ch_views + W, W // 2)]
        p["feature_linear"] = init_linear(next(keys), W, W)
        p["alpha_linear"] = init_linear(next(keys), W, 1)
        p["rgb_linear"] = init_linear(next(keys), W // 2, 3)
    elif net_type == "v1":
        p["pts_linears"] = [init_linear(next(keys), in_ch_pts, W)] + [
            init_linear(next(keys), W, W) for _ in range(D - 1)]
        p["pts_bias"] = init_linear(next(keys), 11, W)
        p["views_linears"] = [init_linear(next(keys), in_ch_views + W, W // 2)]
        p["feature_linear"] = init_linear(next(keys), W, W)
        p["alpha_linear"] = init_linear(next(keys), W, 1)
        p["rgb_linear"] = init_linear(next(keys), W // 2, 3)
        p["color_attention"] = init_mha(next(keys), 4, 12, 4, 4)
        p["weight_out"] = init_linear(next(keys), 12, 3)
    elif net_type == "fusion":
        attn_dim = 16 + 3 + in_ch_views // 3
        p["feature_linear"] = init_linear(next(keys), W, 16)
        p["alpha_linear"] = init_linear(next(keys), W, 1)
        p["rgb_out"] = init_linear(next(keys), attn_dim, 3)
        p["ray_attention"] = init_mha(next(keys), 4, attn_dim, 4, 4)
    return p


_APPLY = {"v0": mlp_v0_apply, "v1": mlp_v1_apply, "v2": mlp_v2_apply,
          "fusion": mlp_fusion_apply}
_ALPHA = {"v0": mlp_v0_alpha, "v2": mlp_v2_alpha, "fusion": mlp_fusion_alpha}


def mlp_apply(params, x, net_type: str, in_ch_pts: int, in_ch_views: int,
              skips=(4,)):
    # Full-precision matmuls: TPU's default f32 matmul runs the MXU at
    # bf16-level precision, and the multiplicative pts_bias cascade (v0)
    # amplifies that to ~0.4 absolute rgb error vs the f32 reference
    # (measured on the mvsnerf-v0 weights). The MLP is ~2 ms per 131k
    # samples either way — accuracy is free here.
    with jax.default_matmul_precision(_MLP_PRECISION.name.lower()):
        return _APPLY[net_type](params, x, in_ch_pts, in_ch_views,
                                skips=skips)


def mlp_apply_alpha(params, x, net_type: str, in_ch_pts: int, skips=(4,)):
    with jax.default_matmul_precision(_MLP_PRECISION.name.lower()):
        return _ALPHA[net_type](params, x, in_ch_pts, skips=skips)
