"""Fused Pallas plane-sweep warp vs the exact gather warp (interpret mode
on CPU; scripts/validate_pallas_tpu.py exercises the compiled kernel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

RNG = np.random.default_rng(7)


def _sweep_grid(h, w, d, pad=2, angle=0.03):
    """A realistic near-rectified plane-sweep grid."""
    from mvsnerf_tpu.ops.homography import plane_sweep_grid

    intr = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]],
                    np.float32)
    R = np.array([[np.cos(angle), 0, np.sin(angle)], [0, 1, 0],
                  [-np.sin(angle), 0, np.cos(angle)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    w2c[:3, 3] = [0.1, 0.02, 0]
    ref4 = np.eye(4, dtype=np.float32)
    ref4[:3] = intr @ np.eye(4)[:3]
    p4 = np.eye(4, dtype=np.float32)
    p4[:3] = intr @ w2c[:3]
    proj = jnp.asarray((p4 @ np.linalg.inv(ref4))[:3])
    depths = jnp.linspace(2.0, 5.0, d)
    return plane_sweep_grid(proj, depths, h, w, pad)


@pytest.mark.parametrize("c", [3, 8, 35])
def test_pallas_sweep_matches_gather(c):
    from mvsnerf_tpu.ops.interp import grid_sample_2d
    from mvsnerf_tpu.ops.pallas_sweep import (bilinear_warp_pallas,
                                              sweep_fits_band)

    h, w, d, pad = 24, 32, 4, 2
    src = jnp.asarray(RNG.standard_normal((h, w, c)).astype(np.float32))
    grid = _sweep_grid(h, w, d, pad)
    assert bool(sweep_fits_band(grid, h, row_block=4, band=16))

    ref = grid_sample_2d(src, grid, "zeros")
    out = bilinear_warp_pallas(src, grid, row_block=4, band=16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_sweep_backward_matches_gather():
    from mvsnerf_tpu.ops.interp import grid_sample_2d
    from mvsnerf_tpu.ops.pallas_sweep import bilinear_warp_pallas

    h, w, c, d, pad = 24, 32, 5, 4, 2
    src = jnp.asarray(RNG.standard_normal((h, w, c)).astype(np.float32))
    grid = _sweep_grid(h, w, d, pad)
    g = jnp.asarray(
        RNG.standard_normal((d, h + 2 * pad, w + 2 * pad, c))
        .astype(np.float32))

    _, vjp_ref = jax.vjp(lambda s: grid_sample_2d(s, grid, "zeros"), src)
    _, vjp_out = jax.vjp(
        lambda s: bilinear_warp_pallas(s, grid, 4, 16, True), src)
    np.testing.assert_allclose(np.asarray(vjp_out(g)[0]),
                               np.asarray(vjp_ref(g)[0]),
                               atol=1e-4, rtol=1e-4)


def test_sweep_fits_band_rejects_wide_span():
    from mvsnerf_tpu.ops.pallas_sweep import sweep_fits_band

    # a 90-degree-rotated grid: y span per row block = full width
    h = w = 16
    xs = jnp.linspace(-1, 1, w)
    ys = jnp.linspace(-1, 1, h)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    rotated = jnp.stack([gy, gx], axis=-1)[None]  # swap: y varies along row
    assert not bool(sweep_fits_band(rotated, h, row_block=4, band=4))


def test_cost_volume_pallas_mode_matches_gather():
    """Shapes with NO legal Mosaic row block (wp = 36): the pallas mode must
    statically fall back to the packed path and still be exact."""
    from mvsnerf_tpu.ops.homography import build_cost_volume
    from mvsnerf_tpu.ops.pallas_sweep import _pick_row_block

    h, w, c, d, pad, V = 24, 32, 8, 8, 2, 3
    assert _pick_row_block(h + 2 * pad, w + 2 * pad) is None
    feats = jnp.asarray(RNG.standard_normal((V, h, w, c)).astype(np.float32))
    imgs = jnp.asarray(
        RNG.uniform(0, 1, (V, 4 * h, 4 * w, 3)).astype(np.float32))
    projs = []
    intr = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]],
                    np.float32)
    ref4 = np.eye(4, dtype=np.float32)
    ref4[:3] = intr @ np.eye(4)[:3]
    ref_inv = np.linalg.inv(ref4)
    for i in range(V):
        a = 0.03 * (i - 1)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        # small translation so no sample lands exactly on a pixel boundary
        # (strict in-bounds masks are knife-edge there and XLA's fused
        # division can flip the last bit between compilation strategies)
        w2c[:3, 3] = [0.013 * i + 0.007, 0.003, 0.0]
        p4 = np.eye(4, dtype=np.float32)
        p4[:3] = intr @ w2c[:3]
        projs.append((p4 @ ref_inv)[:3])
    projs = jnp.asarray(np.stack(projs))
    depths = jnp.linspace(2.0, 5.0, d)

    ref = build_cost_volume(imgs, feats, projs, depths, pad=pad,
                            fast_warp=False)
    out = build_cost_volume(imgs, feats, projs, depths, pad=pad,
                            warp_fwd_mode="pallas", warp_band=16)
    for r, o, name in zip(ref, out, ("cost", "masks", "colors")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   # atol: pallas computes pixel coords
                                   # straight from the projection
                                   # (plane_sweep_pix_coords); the gather
                                   # reference goes through the normalized
                                   # grid + denormalize roundtrip - 1-ulp
                                   # coordinate shifts move bilinear
                                   # weights by ~1e-5 px.
                                   atol=2e-4, rtol=1e-3, err_msg=name)


def test_cost_volume_pallas_mode_backward():
    """Gradient wrt features flows through the fused kernel's custom VJP."""
    from mvsnerf_tpu.ops.homography import build_cost_volume

    h, w, c, d, pad, V = 16, 16, 4, 4, 0, 2
    feats = jnp.asarray(RNG.standard_normal((V, h, w, c)).astype(np.float32))
    imgs = jnp.asarray(
        RNG.uniform(0, 1, (V, 4 * h, 4 * w, 3)).astype(np.float32))
    intr = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]],
                    np.float32)
    ref4 = np.eye(4, dtype=np.float32)
    ref4[:3] = intr @ np.eye(4)[:3]
    projs = [np.eye(4, dtype=np.float32)[:3]]
    a = 0.03
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = R
    p4 = np.eye(4, dtype=np.float32)
    p4[:3] = intr @ w2c[:3]
    projs = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)[:3] @ np.eye(4, dtype=np.float32),
                                  (p4 @ np.linalg.inv(ref4))[:3]]))
    depths = jnp.linspace(2.0, 5.0, d)

    def loss(f, mode):
        kw = dict(warp_fwd_mode=mode) if mode == "pallas" else \
            dict(fast_warp=False)
        return jnp.sum(build_cost_volume(imgs, f, projs, depths, pad=pad,
                                         warp_band=16, **kw)[0] ** 2)

    g_ref = jax.grad(lambda f: loss(f, "gather"))(feats)
    g_out = jax.grad(lambda f: loss(f, "pallas"))(feats)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=2e-3, rtol=1e-3)


def _scene(V, h, w, c, d, seed=11):
    feats = jnp.asarray(
        np.random.default_rng(seed).standard_normal((V, h, w, c))
        .astype(np.float32))
    imgs = jnp.asarray(
        np.random.default_rng(seed + 1).uniform(0, 1, (V, 4 * h, 4 * w, 3))
        .astype(np.float32))
    intr = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]],
                    np.float32)
    ref4 = np.eye(4, dtype=np.float32)
    ref4[:3] = intr @ np.eye(4)[:3]
    ref_inv = np.linalg.inv(ref4)
    projs = []
    for i in range(V):
        a = 0.03 * (i - 1)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = [0.013 * i + 0.007, 0.003, 0.0]
        p4 = np.eye(4, dtype=np.float32)
        p4[:3] = intr @ w2c[:3]
        projs.append((p4 @ ref_inv)[:3])
    return feats, imgs, jnp.asarray(np.stack(projs)), jnp.linspace(2.0, 5.0, d)


def test_cost_volume_fused_kernel_matches_gather():
    """Shapes WITH a legal Mosaic row block (hp = wp = 32): the pallas mode
    runs the fused sweep+variance kernel (interpret mode off-TPU)."""
    from mvsnerf_tpu.ops.homography import build_cost_volume
    from mvsnerf_tpu.ops.pallas_sweep import _pick_row_block

    h, w, c, d, pad, V = 26, 26, 8, 8, 3, 3
    assert _pick_row_block(h + 2 * pad, w + 2 * pad) == 16
    feats, imgs, projs, depths = _scene(V, h, w, c, d)

    ref = build_cost_volume(imgs, feats, projs, depths, pad=pad,
                            fast_warp=False)
    out = build_cost_volume(imgs, feats, projs, depths, pad=pad,
                            warp_fwd_mode="pallas", warp_band=16)
    for r, o, name in zip(ref, out, ("cost", "masks", "colors")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   # atol: pallas computes pixel coords
                                   # straight from the projection
                                   # (plane_sweep_pix_coords); the gather
                                   # reference goes through the normalized
                                   # grid + denormalize roundtrip - 1-ulp
                                   # coordinate shifts move bilinear
                                   # weights by ~1e-5 px.
                                   atol=2e-4, rtol=1e-3, err_msg=name)


def test_cost_volume_fused_kernel_backward():
    """Gradients wrt features AND images through the fused kernel's custom
    VJP (incl. the reference view via the refb repack) vs the gather path."""
    from mvsnerf_tpu.ops.homography import build_cost_volume

    h, w, c, d, pad, V = 26, 26, 8, 4, 3, 3
    feats, imgs, projs, depths = _scene(V, h, w, c, d)

    def loss(f, im, mode):
        kw = dict(warp_fwd_mode=mode, warp_band=16) if mode == "pallas" \
            else dict(fast_warp=False)
        cost = build_cost_volume(im, f, projs, depths, pad=pad, **kw)[0]
        return jnp.sum(cost ** 2 + 0.3 * cost)

    g_ref = jax.grad(lambda f, im: loss(f, im, "gather"), argnums=(0, 1))(
        feats, imgs)
    g_out = jax.grad(lambda f, im: loss(f, im, "pallas"), argnums=(0, 1))(
        feats, imgs)
    for r, o, name in zip(g_ref, g_out, ("d_feats", "d_imgs")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-3, rtol=1e-3, err_msg=name)


def test_cost_volume_fused_kernel_backward_grouped(monkeypatch):
    """MVSNERF_SWEEP_BWD_GROUPS > 1: per-group partial accumulators summed
    in XLA must equal the single-accumulator backward exactly."""
    from mvsnerf_tpu.ops.homography import build_cost_volume

    h, w, c, d, pad, V = 26, 26, 8, 4, 3, 3
    feats, imgs, projs, depths = _scene(V, h, w, c, d)

    def loss(f, im):
        cost = build_cost_volume(im, f, projs, depths, pad=pad,
                                 warp_fwd_mode="pallas", warp_band=16)[0]
        return jnp.sum(cost ** 2 + 0.3 * cost)

    g_ref = jax.grad(loss, argnums=(0, 1))(feats, imgs)
    monkeypatch.setenv("MVSNERF_SWEEP_BWD_GROUPS", "4")
    g_out = jax.grad(loss, argnums=(0, 1))(feats, imgs)
    for r, o, name in zip(g_ref, g_out, ("d_feats", "d_imgs")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=1e-5, err_msg=name)

    monkeypatch.setenv("MVSNERF_SWEEP_BWD_GROUPS", "7")  # !| block count
    import pytest as _pytest
    with _pytest.raises(ValueError):
        jax.grad(loss, argnums=(0, 1))(feats, imgs)


def test_build_color_volume_pallas_matches_gather():
    """The banded MXU color-reprojection path (mode='pallas', border
    emulation by coord clamping + strict mask from unclamped coords)
    equals the corner-packed gather path on ray-sample grids."""
    import numpy as np
    import jax.numpy as jnp
    from mvsnerf_tpu.render.renderer import build_color_volume

    rng = np.random.default_rng(0)
    V, H, W, N, S = 3, 64, 96, 8, 128
    imgs = jnp.asarray(rng.uniform(0, 1, (V, H, W, 3)).astype(np.float32))
    intr = jnp.asarray(np.array([[80.0, 0, W / 2], [0, 80.0, H / 2],
                                 [0, 0, 1]], np.float32))
    intrs = jnp.broadcast_to(intr, (V, 3, 3))
    w2cs = []
    for i in range(V):
        a = 0.05 * (i - 1)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = [0.2 * (i - 1), 0, 0]
        w2cs.append(w2c)
    w2cs = jnp.asarray(np.stack(w2cs))
    xs = rng.uniform(0, W - 1, N)
    ys = rng.uniform(0, H - 1, N)
    z = np.linspace(1.5, 3.0, S)
    c2w = np.linalg.inv(np.asarray(w2cs[0]))
    dirs = np.stack([(xs - W / 2) / 80.0, (ys - H / 2) / 80.0,
                     np.ones(N)], -1) @ c2w[:3, :3].T
    pts = jnp.asarray((c2w[:3, 3][None, None]
                       + z[None, :, None] * dirs[:, None, :])
                      .astype(np.float32))

    ref = build_color_volume(pts, w2cs, intrs, imgs, mode="gather")
    fast = build_color_volume(pts, w2cs, intrs, imgs, mode="pallas")
    assert ref.shape == fast.shape == (N, S, 12)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-5)
