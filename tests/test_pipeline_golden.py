"""End-to-end golden tests: full MVSNet encoding volume and the render
pipeline, vs a torch composition of the reference semantics using the real
mvsnerf-v0 checkpoint weights.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from test_models_golden import torch_feature_net, torch_cost_reg, torch_mlp_v0

CKPT = "/root/reference/ckpts/mvsnerf-v0.tar"
pytestmark = [pytest.mark.slow,  # golden/e2e tier (see pytest.ini)
              pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="reference checkpoint not present")]

RNG = np.random.default_rng(7)

V, H, W = 3, 32, 64      # feature grid 8 x 16
PAD = 4                  # padded grid 16 x 24 (divisible by 8)
D = 16


@pytest.fixture(scope="module")
def ckpt():
    from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
    return load_reference_checkpoint(CKPT)


@pytest.fixture(scope="module")
def torch_sd():
    return torch.load(CKPT, map_location="cpu", weights_only=False)


def make_cameras():
    """Three slightly-rotated cameras looking down +z, plus stride-4 proj
    mats relative to view 0 (the reference's data-loader convention,
    data/dtu.py:84-92, 172-176)."""
    intr = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    intr_s4 = intr.copy()
    intr_s4[:2] /= 4.0
    w2cs, c2ws = [], []
    for i in range(V):
        a = 0.06 * (i - 1)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]])
        t = np.array([0.25 * (i - 1), 0.05 * i, 0.02 * i])
        w2c = np.eye(4)
        w2c[:3, :3], w2c[:3, 3] = R, t
        w2cs.append(w2c)
        c2ws.append(np.linalg.inv(w2c))
    projs = []
    ref = np.eye(4)
    ref[:3] = intr_s4 @ w2cs[0][:3]
    ref_inv = np.linalg.inv(ref)
    for i in range(V):
        p = np.eye(4)
        p[:3] = intr_s4 @ w2cs[i][:3]
        projs.append((p @ ref_inv)[:3])
    return (intr.astype(np.float32),
            np.stack(w2cs).astype(np.float32),
            np.stack(c2ws).astype(np.float32),
            np.stack(projs).astype(np.float32))


def torch_homo_warp(src_feat, proj, depths, pad):
    """Reference homo_warp math (utils.py:580-630) in torch."""
    C, h, w = src_feat.shape
    hp, wp = h + 2 * pad, w + 2 * pad
    ys, xs = np.meshgrid(np.arange(hp) - pad, np.arange(wp) - pad,
                         indexing="ij")
    ref = torch.from_numpy(
        np.stack([xs, ys, np.ones_like(xs)], 0).reshape(3, -1)
    ).float()
    R, T = torch.from_numpy(proj[:, :3]), torch.from_numpy(proj[:, 3:])
    grids = []
    for d in depths:
        src = R @ ref + T / float(d)
        xy = src[:2] / src[2:]
        gx = xy[0] / ((w - 1) / 2) - 1
        gy = xy[1] / ((h - 1) / 2) - 1
        grids.append(torch.stack([gx, gy], -1).reshape(hp, wp, 2))
    grid = torch.stack(grids)  # (D, hp, wp, 2)
    out = F.grid_sample(src_feat[None].expand(len(depths), -1, -1, -1), grid,
                        mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return out, grid  # (D, C, hp, wp)


def torch_mvsnet(sd, imgs, projs, near, far, pad):
    """Reference MVSNet.forward (models.py:895-932) in torch."""
    feats = torch_feature_net(sd, imgs)  # (V, 32, h, w)
    _, _, h, w = feats.shape
    hp, wp = h + 2 * pad, w + 2 * pad
    t = torch.linspace(0.0, 1.0, D)
    depths = (near * (1 - t) + far * t).numpy()

    imgs_l = F.interpolate(imgs, (h, w), mode="bilinear", align_corners=False)
    ref_feat = F.pad(feats[0], (pad, pad, pad, pad))
    vol_sum = ref_feat[:, None].repeat(1, D, 1, 1)
    vol_sq = vol_sum ** 2
    in_masks = torch.ones((V, D, hp, wp))
    warped_rgb = [F.pad(imgs_l[0], (pad, pad, pad, pad))[:, None]
                  .expand(-1, D, -1, -1)]
    for i in range(1, V):
        wf, grid = torch_homo_warp(feats[i], projs[i], depths, pad)
        wi, _ = torch_homo_warp(imgs_l[i], projs[i], depths, pad)
        warped_rgb.append(wi.permute(1, 0, 2, 3))
        mask = ((grid > -1) & (grid < 1))
        in_masks[i] = (mask[..., 0] & mask[..., 1]).float()
        vol_sum = vol_sum + wf.permute(1, 0, 2, 3)
        vol_sq = vol_sq + wf.permute(1, 0, 2, 3) ** 2
    count = 1.0 / in_masks.sum(0, keepdim=True)
    variance = vol_sq * count - (vol_sum * count) ** 2
    cost = torch.cat(warped_rgb + [variance], dim=0)  # (41, D, hp, wp)
    vol = torch_cost_reg(sd, cost[None])
    return vol, depths  # (1, 8, D, hp, wp)


@pytest.fixture(scope="module")
def scene():
    intr, w2cs, c2ws, projs = make_cameras()
    imgs = RNG.uniform(0, 1, (V, 3, H, W)).astype(np.float32)
    return dict(intr=intr, w2cs=w2cs, c2ws=c2ws, projs=projs, imgs=imgs,
                near=2.0, far=6.0)


@pytest.fixture(scope="module")
def torch_volume(torch_sd, scene):
    with torch.no_grad():
        vol, depths = torch_mvsnet(torch_sd["network_mvs_state_dict"],
                                   torch.from_numpy(scene["imgs"]),
                                   scene["projs"], scene["near"],
                                   scene["far"], PAD)
    return vol.numpy(), depths


def test_mvsnet_full_golden(ckpt, scene, torch_volume):
    from mvsnerf_tpu.models import mvsnet_apply
    gt, gt_depths = torch_volume
    vol, colors, depth_values = mvsnet_apply(
        ckpt["mvsnet"],
        jnp.asarray(scene["imgs"].transpose(0, 2, 3, 1)),
        jnp.asarray(scene["projs"]),
        jnp.asarray([scene["near"], scene["far"]]),
        pad=PAD, n_planes=D)
    np.testing.assert_allclose(np.asarray(depth_values), gt_depths, atol=1e-5)
    assert vol.shape == (D, H // 4 + 2 * PAD, W // 4 + 2 * PAD, 8)
    ours = np.asarray(vol).transpose(3, 0, 1, 2)[None]
    np.testing.assert_allclose(ours, gt, atol=2e-3, rtol=1e-3)


def torch_render(torch_sd, scene, volume, pts_world, pts_ndc, z_vals,
                 rays_dir):
    """Reference rendering() (renderer.py:138-165) in torch: trilinear
    volume fetch + color volume + PE + v0 MLP + raw2outputs."""
    n, s = z_vals.shape
    vol = torch.from_numpy(volume)  # (1, 8, D, hp, wp)
    grid = torch.from_numpy(pts_ndc).view(1, 1, n, s, 3) * 2 - 1
    ray_feats = F.grid_sample(vol, grid, mode="bilinear", align_corners=True)
    ray_feats = ray_feats[0, :, 0].permute(1, 2, 0)  # (n, s, 8)

    # color volume (utils.py:300-332)
    cols = []
    for i in range(V):
        w2c = torch.from_numpy(scene["w2cs"][i])
        intr = torch.from_numpy(scene["intr"])
        pts = torch.from_numpy(pts_world).reshape(-1, 3)
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        pix = cam @ intr.T
        xy = pix[:, :2] / pix[:, 2:]
        xy = xy / torch.tensor([W - 1.0, H - 1.0])
        g = (xy * 2 - 1).view(1, n, s, 2).float()
        img = torch.from_numpy(scene["imgs"][i])[None]
        data = F.grid_sample(img, g, align_corners=True, mode="bilinear",
                             padding_mode="border")[0].permute(1, 2, 0)
        mask = ((g > -1) & (g < 1))
        mask = (mask[..., 0] & mask[..., 1]).float()[0][..., None]
        cols.append(torch.cat([data, mask], -1))
    colors = torch.cat(cols, dim=-1)  # (n, s, 12)

    feats = torch.cat([ray_feats, colors], -1).float()

    # PE (models.py:47-51)
    pts_t = torch.from_numpy(pts_ndc)
    freqs = 2.0 ** torch.linspace(0, 9, 10)
    scaled = (pts_t.unsqueeze(-2) * freqs.view(1, 1, -1, 1)).reshape(n, s, -1)
    pe = torch.cat([pts_t, torch.sin(scaled), torch.cos(scaled)], -1).float()

    dirs = torch.from_numpy(rays_dir)
    cos = torch.norm(dirs, dim=-1)
    w2c_ref = torch.from_numpy(scene["w2cs"][0])
    angle = (dirs / cos[:, None]) @ w2c_ref[:3, :3].T
    viewdirs = angle[:, None].expand(-1, s, -1).float()

    x = torch.cat([pe, feats, viewdirs], -1)
    raw = torch_mlp_v0(torch_sd["network_fn_state_dict"], x)

    # raw2outputs (renderer.py:65-92), alpha = 1 - exp(-sigma)
    sigma = raw[..., 3]
    alpha = 1 - torch.exp(-sigma)
    T = torch.cumprod(
        torch.cat([torch.ones(n, 1), 1 - alpha + 1e-10], -1), -1)[:, :-1]
    weights = alpha * T
    rgb_map = (weights[..., None] * raw[..., :3]).sum(-2)
    depth_map = (weights * torch.from_numpy(z_vals)).sum(-1)
    return rgb_map.numpy(), depth_map.numpy(), weights.numpy()


def test_render_rays_golden(ckpt, scene, torch_volume):
    from mvsnerf_tpu.render import render_rays
    from mvsnerf_tpu.ops import get_ndc_coordinate, rays_from_pixels

    gt_vol, _ = torch_volume
    n_rays, n_samples = 37, D
    xs = RNG.uniform(0, W - 1, n_rays).astype(np.float32)
    ys = RNG.uniform(0, H - 1, n_rays).astype(np.float32)
    c2w_t = jnp.asarray(scene["c2ws"][V - 1])
    intr = jnp.asarray(scene["intr"])
    rays_o, rays_d = rays_from_pixels(jnp.asarray(xs), jnp.asarray(ys), intr,
                                      c2w_t)
    t = np.linspace(0, 1, n_samples, dtype=np.float32)
    z_vals = (scene["near"] * (1 - t) + scene["far"] * t)[None].repeat(
        n_rays, 0)
    pts_world = (np.asarray(rays_o)[None, None] +
                 z_vals[..., None] * np.asarray(rays_d)[:, None])
    inv_scale = jnp.asarray([W - 1.0, H - 1.0])
    pts_ndc = get_ndc_coordinate(jnp.asarray(scene["w2cs"][0]), intr,
                                 jnp.asarray(pts_world), inv_scale,
                                 near=scene["near"], far=scene["far"],
                                 pad=PAD)

    gt_rgb, gt_depth, gt_w = torch_render(
        pytest.importorskip("torch").load(CKPT, map_location="cpu",
                                          weights_only=False),
        scene, gt_vol, pts_world.astype(np.float32),
        np.asarray(pts_ndc).astype(np.float32), z_vals,
        np.asarray(rays_d).astype(np.float32))

    vol = jnp.asarray(gt_vol[0].transpose(1, 2, 3, 0))
    out = render_rays(
        ckpt["mlp"], vol, jnp.asarray(pts_world), pts_ndc,
        jnp.asarray(z_vals), rays_d,
        w2c_ref=jnp.asarray(scene["w2cs"][0]),
        w2cs=jnp.asarray(scene["w2cs"]),
        intrinsics=jnp.asarray(np.stack([scene["intr"]] * V)),
        imgs=jnp.asarray(scene["imgs"].transpose(0, 2, 3, 1)),
        net_type="v0")
    np.testing.assert_allclose(np.asarray(out["rgb"]), gt_rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]), gt_depth, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["weights"]), gt_w, atol=1e-4)
