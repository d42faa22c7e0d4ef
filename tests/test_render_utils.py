"""Ray builders, chunked rendering, and attention-variant MLP tests."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

RNG = np.random.default_rng(31)


def test_build_rays_train_shapes_and_gather():
    from mvsnerf_tpu.ops.geometry import build_rays_train
    H, W = 24, 32
    img = jnp.asarray(RNG.uniform(0, 1, (H, W, 3)).astype(np.float32))
    depth = jnp.asarray(RNG.uniform(2, 6, (H, W)).astype(np.float32))
    intr = jnp.asarray([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    c2w = jnp.eye(4)
    w2c = jnp.eye(4)
    rb = build_rays_train(jax.random.PRNGKey(0), img, depth, intr, c2w,
                          w2c, intr, jnp.asarray([2.0, 6.0]),
                          jnp.asarray([2.0, 6.0]), n_rays=64, n_samples=8)
    assert rb.pts_world.shape == (64, 8, 3)
    assert rb.pts_ndc.shape == (64, 8, 3)
    assert rb.colors.shape == (64, 3)
    # gathered colors match the image at the integer pixel coords
    xs = np.asarray(rb.pixel_xy[:, 0]).astype(int)
    ys = np.asarray(rb.pixel_xy[:, 1]).astype(int)
    np.testing.assert_allclose(np.asarray(rb.colors),
                               np.asarray(img)[ys, xs], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.depths),
                               np.asarray(depth)[ys, xs], atol=1e-6)
    # z values within near/far and increasing
    z = np.asarray(rb.z_vals)
    assert z.min() >= 2.0 - 1e-5 and z.max() <= 6.0 + 1e-5
    assert (np.diff(z, axis=-1) > 0).all()


def test_build_rays_test_covers_image():
    from mvsnerf_tpu.ops.geometry import build_rays_test
    H, W = 6, 8
    intr = jnp.asarray([[10.0, 0, 4], [0, 10.0, 3], [0, 0, 1]])
    rb = build_rays_test(H, W, jnp.eye(4), jnp.eye(4), intr,
                         jnp.asarray([2.0, 6.0]),
                         jnp.asarray([2.0, 6.0]), n_samples=4)
    assert rb.pts_world.shape == (H * W, 4, 3)
    xy = np.asarray(rb.pixel_xy)
    # row-major full coverage
    np.testing.assert_array_equal(xy[:W, 1], 0)
    np.testing.assert_array_equal(xy[::W, 0], 0)


def test_render_image_chunked_matches_unchunked():
    from mvsnerf_tpu.render.renderer import render_image_chunked
    n = 37  # ragged vs chunk 8

    def fn(a, b):
        return {"x": a * 2 + b.sum(-1, keepdims=True), "y": a[:, :1]}

    a = jnp.asarray(RNG.standard_normal((n, 4)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((n, 3)).astype(np.float32))
    out = render_image_chunked(fn, (a, b), n, chunk=8)
    ref = fn(a, b)
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(ref["x"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["y"]), np.asarray(ref["y"]),
                               atol=1e-6)


def torch_mha(p, q, mask=None, n_head=4, d_k=4, d_v=4):
    """Reference MultiHeadAttention (models.py:92-141) in torch from our
    param pytree."""
    def lin(name, x):
        return x @ torch.from_numpy(np.asarray(p[name]["kernel"]))

    B, L, dm = q.shape
    residual = q
    qh = lin("w_qs", q).view(B, L, n_head, d_k).transpose(1, 2)
    kh = lin("w_ks", q).view(B, L, n_head, d_k).transpose(1, 2)
    vh = lin("w_vs", q).view(B, L, n_head, d_v).transpose(1, 2)
    attn = (qh / d_k ** 0.5) @ kh.transpose(2, 3)
    if mask is not None:
        attn = attn.masked_fill(mask.unsqueeze(1) == 0, -1e9)
    attn = F.softmax(attn, dim=-1)
    out = (attn @ vh).transpose(1, 2).contiguous().view(B, L, -1)
    out = lin("fc", out) + residual
    return F.layer_norm(out, (dm,),
                        torch.from_numpy(np.asarray(p["layer_norm"]["scale"])),
                        torch.from_numpy(np.asarray(p["layer_norm"]["bias"])),
                        eps=1e-6)


@pytest.mark.parametrize("masked", [False, True])
def test_mha_matches_torch(masked):
    from mvsnerf_tpu.models import init_mha, multi_head_attention
    p = init_mha(jax.random.PRNGKey(0), 4, 12, 4, 4)
    x = RNG.standard_normal((5, 3, 12)).astype(np.float32)
    mask = (RNG.uniform(size=(5, 3, 1)) > 0.3).astype(np.float32) \
        if masked else None
    ours, _ = multi_head_attention(p, jnp.asarray(x), jnp.asarray(x),
                                   jnp.asarray(x), 4, 4, 4,
                                   mask=jnp.asarray(mask)
                                   if masked else None)
    ref = torch_mha(p, torch.from_numpy(x),
                    torch.from_numpy(mask) if masked else None)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_v1_mlp_output_layout():
    from mvsnerf_tpu.models import init_mlp, mlp_apply
    p = init_mlp(jax.random.PRNGKey(2), "v1", D=6, W=128)
    # input: 63 PE + 8 vol + 12 colors + 3 dirs
    x = jnp.asarray(RNG.standard_normal((10, 86)).astype(np.float32))
    out = mlp_apply(p, x, "v1", 63, 3)
    # [rgb(3), alpha(1), colors(3), colors(3)] (models.py:458-461)
    assert out.shape == (10, 10)
    np.testing.assert_allclose(np.asarray(out[:, 4:7]),
                               np.asarray(out[:, 7:10]), atol=0)
    assert (np.asarray(out[:, :3]) >= 0).all()
    assert (np.asarray(out[:, :3]) <= 1).all()


def test_fusion_mlp_shapes():
    from mvsnerf_tpu.models import init_mlp, mlp_fusion_apply
    p = init_mlp(jax.random.PRNGKey(3), "fusion", D=6, W=128)
    x = jnp.asarray(RNG.standard_normal((4, 8, 86)).astype(np.float32))
    out = mlp_fusion_apply(p, x, 63, 3)
    assert out.shape == (4, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def torch_mlp_v1(p, x, in_ch_pts=63, in_ch_views=3):
    """Reference Renderer_attention forward (models.py:421-462) in torch
    from our random-init param pytree."""
    def lin(name, t):
        k = torch.from_numpy(np.asarray(p[name]["kernel"]))
        out = t @ k
        if "bias" in p[name]:
            out = out + torch.from_numpy(np.asarray(p[name]["bias"]))
        return out

    n, dim = x.shape
    in_ch_feat = dim - in_ch_pts - in_ch_views
    pts = x[:, :in_ch_pts]
    feats = x[:, in_ch_pts:in_ch_pts + in_ch_feat]
    views = x[:, in_ch_pts + in_ch_feat:]

    colors_in = feats[:, 8:].reshape(n, -1, 4)
    tok = torch.cat(
        [colors_in, feats[:, :8].reshape(n, 1, 8).expand(-1, 3, -1)], -1)
    attn_out = torch_mha(p["color_attention"], tok)
    colors = torch.sigmoid(lin("weight_out", attn_out)).sum(1)

    bias = lin("pts_bias", torch.cat([feats[:, :8], colors], -1))
    h = pts
    for i in range(6):
        h = F.relu(lin_layer(p["pts_linears"][i], h) + bias)
    alpha = F.relu(lin("alpha_linear", h))
    feat = lin("feature_linear", h)
    h = F.relu(lin_layer(p["views_linears"][0],
                         torch.cat([feat, views], -1)))
    rgb = torch.sigmoid(lin("rgb_linear", h))
    return torch.cat([rgb, alpha, colors, colors], -1)


def lin_layer(lp, t):
    out = t @ torch.from_numpy(np.asarray(lp["kernel"]))
    if "bias" in lp:
        out = out + torch.from_numpy(np.asarray(lp["bias"]))
    return out


def test_v1_mlp_matches_torch():
    from mvsnerf_tpu.models import init_mlp, mlp_apply
    p = init_mlp(jax.random.PRNGKey(7), "v1", D=6, W=128)
    x = RNG.standard_normal((12, 86)).astype(np.float32)
    ours = mlp_apply(p, jnp.asarray(x), "v1", 63, 3)
    ref = torch_mlp_v1(p, torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_render_image_chunked_pad_band_contract():
    """Chunk padding must not corrupt real rays: the banded volume gather
    derives a per-column z band from ALL rays in a chunk, so zero-pad
    rays (ndc z=0) would clamp real rays' reads. chunk > n_rays must give
    identical output to chunk == n_rays (found via a fusion-scene render
    where chunk=8192 on 1024 rays shifted rgb by 0.3)."""
    import jax
    from mvsnerf_tpu.render.renderer import render_image_chunked
    from mvsnerf_tpu.ops.volume_grad import sample_volume_banded

    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.standard_normal((16, 8, 8, 4)).astype(np.float32))
    n, s = 96, 8
    # structured ndc: column s spans ~one z slab (the band contract)
    z = (jnp.arange(s) / s)[None, :] + rng.uniform(0, 1.0 / s, (n, 1))
    xy = jnp.asarray(rng.uniform(0, 1, (n, s, 2)).astype(np.float32))
    ndc = jnp.concatenate([xy, z[..., None]], -1).astype(jnp.float32)

    def chunk_fn(nd):
        return {"v": sample_volume_banded(vol, nd, 4)}

    exact = render_image_chunked(chunk_fn, (ndc,), n, chunk=n)
    padded = render_image_chunked(chunk_fn, (ndc,), n, chunk=128)
    np.testing.assert_allclose(np.asarray(padded["v"]),
                               np.asarray(exact["v"]), atol=1e-6)


def test_pick_tile():
    from mvsnerf_tpu.render.tiled import pick_tile
    assert pick_tile(512, 640) == (32, 64)
    assert pick_tile(32, 32) == (32, 32)
    th, tw = pick_tile(128, 160)
    assert 128 % th == 0 and 160 % tw == 0 and th * tw <= 2048
    assert pick_tile(7, 13) is None  # ragged image -> chunked path


def test_make_tiled_renderer_rejections():
    """Configurations the fused kernel can't serve return the documented
    None-closure instead of crashing (code-review finding)."""
    from mvsnerf_tpu.config import config_parser
    from mvsnerf_tpu.models import init_mlp
    from mvsnerf_tpu.render.tiled import make_tiled_renderer
    import jax
    import jax.numpy as jnp

    mlp = init_mlp(jax.random.PRNGKey(0), "v0")
    pose = {"w2cs": jnp.eye(4)[None], "intrinsics": jnp.eye(3)[None]}
    imgs = jnp.zeros((3, 32, 32, 3))

    def fn(cmd, volume, imgs_=imgs):
        args = config_parser(cmd=cmd)
        return make_tiled_renderer(args, mlp, volume, imgs_, [2.0, 6.0],
                                   pose)

    vol8 = jnp.zeros((16, 16, 16, 8))
    rays = np.zeros((16, 8), np.float32)
    # N_samples not a multiple of the kernel column block
    assert fn("--N_samples 17", vol8)(rays, 4, 4) is None
    # non-v0 MLP
    assert fn("--N_samples 32 --net_type v2", vol8)(rays, 4, 4) is None
    # misaligned volume dims (hp % 8)
    assert fn("--N_samples 32", jnp.zeros((16, 12, 16, 8)))(
        rays, 4, 4) is None
    # un-bakeable channel count (V != 3 source views)
    assert fn("--N_samples 32", vol8,
              jnp.zeros((4, 32, 32, 3)))(rays, 4, 4) is None
    # 24-channel volume (V=4 bake) is not the kernel's 20-channel packing
    assert fn("--N_samples 32", jnp.zeros((16, 16, 16, 24)))(
        rays, 4, 4) is None
