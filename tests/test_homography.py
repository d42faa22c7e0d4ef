"""Plane-sweep warp parity tests.

Ground truth is computed in torch by the same math the reference uses
(utils.py:580-630): src = R @ [x,y,1] + T/d, perspective divide, normalize by
the unpadded extent, bilinear grid_sample with zeros padding and
align_corners=True.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mvsnerf_tpu.ops import plane_sweep_grid, homo_warp, build_cost_volume_feat

RNG = np.random.default_rng(2)


def torch_plane_sweep(src_feat, proj, depths, pad):
    """Torch ground-truth warp per the reference formula."""
    C, H, W = src_feat.shape
    D = len(depths)
    hp, wp = H + 2 * pad, W + 2 * pad
    ys, xs = np.meshgrid(np.arange(hp) - pad, np.arange(wp) - pad,
                         indexing="ij")
    ref = np.stack([xs, ys, np.ones_like(xs)], 0).reshape(3, -1)
    R, T = proj[:, :3], proj[:, 3:]
    grids = []
    for d in depths:
        src = R @ ref + T / d
        xy = src[:2] / src[2:]
        gx = xy[0] / ((W - 1) / 2) - 1
        gy = xy[1] / ((H - 1) / 2) - 1
        grids.append(np.stack([gx, gy], -1).reshape(hp, wp, 2))
    grid = torch.from_numpy(np.stack(grids).astype(np.float32))
    out = F.grid_sample(
        torch.from_numpy(src_feat)[None].expand(D, -1, -1, -1),
        grid, mode="bilinear", padding_mode="zeros", align_corners=True)
    return out.numpy()  # (D, C, hp, wp)


def test_homo_warp_matches_torch():
    C, H, W, pad = 4, 10, 12, 3
    feat = RNG.standard_normal((C, H, W)).astype(np.float32)
    # A realistic-ish relative projection: small rotation + translation.
    angle = 0.05
    Rm = np.array([[np.cos(angle), 0, np.sin(angle)],
                   [0, 1, 0],
                   [-np.sin(angle), 0, np.cos(angle)]])
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]])
    proj = (K @ np.concatenate([Rm, [[0.2], [0.1], [0.05]]], 1)
            @ np.linalg.inv(np.vstack([K @ np.eye(3, 4), [0, 0, 0, 1]]))[:4])
    proj = proj[:3].astype(np.float32)
    depths = np.linspace(2.0, 6.0, 5).astype(np.float32)

    ref_out = torch_plane_sweep(feat, proj, depths, pad)
    ours, grid = homo_warp(jnp.asarray(feat.transpose(1, 2, 0)),
                           jnp.asarray(proj), jnp.asarray(depths), pad=pad)
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.transpose(0, 2, 3, 1), atol=1e-4)


def test_identity_warp_is_identity():
    # proj = [I | 0] with any depths returns the source pixels unchanged.
    C, H, W = 3, 8, 9
    feat = RNG.standard_normal((H, W, C)).astype(np.float32)
    proj = jnp.asarray(np.eye(3, 4, dtype=np.float32))
    depths = jnp.asarray([1.0, 2.0])
    out, _ = homo_warp(jnp.asarray(feat), proj, depths, pad=0)
    for d in range(2):
        np.testing.assert_allclose(np.asarray(out[d]), feat, atol=1e-5)


def test_cost_volume_feat_variance_zero_for_identity():
    # All views identical + identity projections => cross-view variance 0.
    V, H, W, C = 3, 8, 9, 4
    feat = RNG.standard_normal((H, W, C)).astype(np.float32)
    feats = jnp.asarray(np.stack([feat] * V))
    projs = jnp.asarray(np.stack([np.eye(3, 4, dtype=np.float32)] * V))
    depths = jnp.asarray(np.linspace(2, 6, 4).astype(np.float32))
    var, masks = build_cost_volume_feat(feats, projs, depths, pad=0)
    # interior pixels (strictly in-bounds) have all 3 views -> variance ~0
    interior = np.asarray(var[:, 1:-1, 1:-1, :])
    np.testing.assert_allclose(interior, 0.0, atol=1e-4)
