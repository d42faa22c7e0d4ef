"""Golden-value parity tests against the mvsnerf-v0 checkpoint.

Ground truth is computed in torch (CPU) by applying the checkpoint weights
with the exact reference layer semantics: Linear chains for the MLP
(models.py:194-222), conv + train-mode BatchNorm + LeakyReLU(0.01) for the
InPlaceABN blocks (models.py:661-685), ConvTranspose3d for the U-Net decoder.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

CKPT = "/root/reference/ckpts/mvsnerf-v0.tar"
pytestmark = [pytest.mark.slow,  # golden/e2e tier (see pytest.ini)
              pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference checkpoint not present")]

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def ckpt():
    from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
    return load_reference_checkpoint(CKPT)


@pytest.fixture(scope="module")
def torch_sd():
    return torch.load(CKPT, map_location="cpu", weights_only=False)


def test_torch_free_reader_matches_torch(ckpt, torch_sd):
    fn = torch_sd["network_fn_state_dict"]
    ours = ckpt["mlp"]
    np.testing.assert_allclose(
        np.asarray(ours["pts_linears"][5]["kernel"]),
        fn["nerf.pts_linears.5.weight"].numpy().T, atol=0)
    np.testing.assert_allclose(
        np.asarray(ours["rgb_linear"]["bias"]),
        fn["nerf.rgb_linear.bias"].numpy(), atol=0)
    assert ckpt["global_step"] == 181104
    assert len(ours["pts_linears"]) == 6
    assert ours["pts_linears"][5]["kernel"].shape == (191, 128)


def torch_mlp_v0(fn_sd, x, in_ch_pts=63, in_ch_views=3, skips=(4,)):
    """Reference Renderer_ours forward in torch from raw ckpt tensors."""
    sd = {k[len("nerf."):]: v for k, v in fn_sd.items()}
    pts, feats, views = torch.split(
        x, [in_ch_pts, x.shape[-1] - in_ch_pts - in_ch_views, in_ch_views], -1)
    bias = F.linear(feats, sd["pts_bias.weight"], sd["pts_bias.bias"])
    h = pts
    for i in range(6):
        h = F.linear(h, sd[f"pts_linears.{i}.weight"],
                     sd[f"pts_linears.{i}.bias"]) * bias
        h = F.relu(h)
        if i in skips:
            h = torch.cat([pts, h], -1)
    alpha = F.relu(F.linear(h, sd["alpha_linear.weight"],
                            sd["alpha_linear.bias"]))
    feat = F.linear(h, sd["feature_linear.weight"], sd["feature_linear.bias"])
    h = torch.cat([feat, views], -1)
    h = F.relu(F.linear(h, sd["views_linears.0.weight"],
                        sd["views_linears.0.bias"]))
    rgb = torch.sigmoid(F.linear(h, sd["rgb_linear.weight"],
                                 sd["rgb_linear.bias"]))
    return torch.cat([rgb, alpha], -1)


def test_mlp_v0_golden(ckpt, torch_sd):
    from mvsnerf_tpu.models import mlp_apply
    x = RNG.standard_normal((64, 86)).astype(np.float32)
    gt = torch_mlp_v0(torch_sd["network_fn_state_dict"],
                      torch.from_numpy(x)).numpy()
    ours = mlp_apply(ckpt["mlp"], jnp.asarray(x), "v0", 63, 3)
    np.testing.assert_allclose(np.asarray(ours), gt, rtol=1e-5, atol=1e-4)


def test_mlp_v0_alpha_golden(ckpt, torch_sd):
    from mvsnerf_tpu.models import mlp_apply_alpha
    sd = {k[len("nerf."):]: v
          for k, v in torch_sd["network_fn_state_dict"].items()}
    x = RNG.standard_normal((32, 83)).astype(np.float32)  # 63 pts + 20 feat
    xt = torch.from_numpy(x)
    pts, feats = xt[..., :63], xt[..., 63:]
    bias = F.linear(feats, sd["pts_bias.weight"], sd["pts_bias.bias"])
    h = pts
    for i in range(6):
        h = F.relu(F.linear(h, sd[f"pts_linears.{i}.weight"],
                            sd[f"pts_linears.{i}.bias"]) * bias)
        if i == 4:
            h = torch.cat([pts, h], -1)
    gt = F.relu(F.linear(h, sd["alpha_linear.weight"],
                         sd["alpha_linear.bias"])).numpy()
    ours = mlp_apply_alpha(ckpt["mlp"], jnp.asarray(x), "v0", 63)
    np.testing.assert_allclose(np.asarray(ours), gt, rtol=1e-5, atol=1e-4)


def torch_abn_block(sd, prefix, x, conv_dim, stride=1, pad=1):
    """conv (no bias) + train-mode BN + leaky_relu(0.01) == InPlaceABN."""
    w = sd[f"{prefix}.conv.weight"] if f"{prefix}.conv.weight" in sd \
        else sd[f"{prefix}.weight"]
    convf = F.conv2d if conv_dim == 2 else F.conv3d
    x = convf(x, w, stride=stride, padding=pad)
    x = F.batch_norm(x, None, None,
                     sd[f"{prefix}.bn.weight"], sd[f"{prefix}.bn.bias"],
                     training=True, eps=1e-5)
    return F.leaky_relu(x, 0.01)


def torch_feature_net(sd, x):
    """Reference FeatureNet forward (models.py:715-722) from ckpt tensors."""
    cfg = {"conv0": [(1, 1)] * 2, "conv1": [(2, 2), (1, 1), (1, 1)],
           "conv2": [(2, 2), (1, 1), (1, 1)]}
    for g, convs in cfg.items():
        for i, (s, p) in enumerate(convs):
            x = torch_abn_block(sd, f"feature.{g}.{i}", x, 2, s, p)
    x = F.conv2d(x, sd["feature.toplayer.weight"],
                 sd["feature.toplayer.bias"])
    return x


def test_feature_net_golden(ckpt, torch_sd):
    from mvsnerf_tpu.models import feature_net_apply
    sd = torch_sd["network_mvs_state_dict"]
    imgs = RNG.standard_normal((3, 3, 32, 40)).astype(np.float32)
    gt = torch_feature_net(sd, torch.from_numpy(imgs)).numpy()
    ours = feature_net_apply(ckpt["mvsnet"]["feature"],
                             jnp.asarray(imgs.transpose(0, 2, 3, 1)))
    assert ours.shape == (3, 8, 10, 32)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), gt,
                               atol=5e-4)


def torch_cost_reg(sd, x):
    """Reference CostRegNet forward (models.py:756-769) from ckpt tensors."""
    def enc(name, y, stride):
        return torch_abn_block(sd, f"cost_reg_2.{name}", y, 3, stride, 1)

    def dec(name, y):
        y = F.conv_transpose3d(y, sd[f"cost_reg_2.{name}.0.weight"],
                               stride=2, padding=1, output_padding=1)
        y = F.batch_norm(y, None, None, sd[f"cost_reg_2.{name}.1.weight"],
                         sd[f"cost_reg_2.{name}.1.bias"], training=True,
                         eps=1e-5)
        return F.leaky_relu(y, 0.01)

    conv0 = enc("conv0", x, 1)
    conv2 = enc("conv2", enc("conv1", conv0, 2), 1)
    conv4 = enc("conv4", enc("conv3", conv2, 2), 1)
    y = enc("conv6", enc("conv5", conv4, 2), 1)
    y = conv4 + dec("conv7", y)
    y = conv2 + dec("conv9", y)
    return conv0 + dec("conv11", y)


def test_cost_reg_golden(ckpt, torch_sd):
    from mvsnerf_tpu.models import cost_reg_apply
    sd = torch_sd["network_mvs_state_dict"]
    vol = RNG.standard_normal((1, 41, 16, 8, 8)).astype(np.float32)
    gt = torch_cost_reg(sd, torch.from_numpy(vol)).numpy()
    ours = cost_reg_apply(ckpt["mvsnet"]["cost_reg_2"],
                          jnp.asarray(vol.transpose(0, 2, 3, 4, 1)))
    assert ours.shape == (1, 16, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 4, 1, 2, 3), gt,
                               atol=5e-4)


def test_conv_transpose3d_matches_torch():
    from mvsnerf_tpu.models import conv_transpose3d
    w = RNG.standard_normal((6, 4, 3, 3, 3)).astype(np.float32)  # (I, O, k)
    x = RNG.standard_normal((1, 6, 4, 5, 6)).astype(np.float32)
    gt = F.conv_transpose3d(torch.from_numpy(x), torch.from_numpy(w),
                            stride=2, padding=1, output_padding=1).numpy()
    kern = np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)))
    ours = conv_transpose3d({"kernel": jnp.asarray(kern)},
                            jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 4, 1, 2, 3), gt,
                               atol=1e-4)


def test_mlp_init_shapes_match_checkpoint(ckpt):
    """init_mlp produces the same pytree structure as the imported ckpt."""
    import jax
    from mvsnerf_tpu.models import init_mlp
    init = init_mlp(jax.random.PRNGKey(0), "v0")
    imported = ckpt["mlp"]
    init_shapes = jax.tree.map(lambda a: a.shape, init)
    imp_shapes = jax.tree.map(lambda a: a.shape, imported)
    assert init_shapes == imp_shapes
