"""x-windowed fused sweep kernel (ops/pallas_sweep2.py) vs the exact
gather path — interpret mode on CPU; scripts/validate_sweep2_tpu.py
exercises the compiled kernel on device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

RNG = np.random.default_rng(11)

# shapes chosen so the xband gate passes: wp=48 (%16), hp=32 (%8),
# w=40 >= wb=32 with (w-wb)%8==0, h=24 >= bandp=16
H, W, C, D, PAD, V = 24, 40, 8, 8, 4, 3


def _scene(v=V, h=H, w=W, c=C, d=D):
    feats = jnp.asarray(RNG.standard_normal((v, h, w, c)).astype(np.float32))
    imgs = jnp.asarray(
        RNG.uniform(0, 1, (v, 4 * h, 4 * w, 3)).astype(np.float32))
    projs = []
    intr = np.array([[1.2 * w, 0, w / 2], [0, 1.2 * w, h / 2], [0, 0, 1]],
                    np.float32)
    ref4 = np.eye(4, dtype=np.float32)
    ref4[:3] = intr @ np.eye(4)[:3]
    ref_inv = np.linalg.inv(ref4)
    for i in range(v):
        a = 0.03 * (i - 1)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = [0.013 * i + 0.007, 0.003, 0.0]
        p4 = np.eye(4, dtype=np.float32)
        p4[:3] = intr @ w2c[:3]
        projs.append((p4 @ ref_inv)[:3])
    projs = jnp.asarray(np.stack(projs))
    depths = jnp.linspace(2.0, 5.0, d)
    return feats, imgs, projs, depths


def test_tile_lanes_roundtrip_and_order():
    from mvsnerf_tpu.ops.pallas_sweep2 import TC, TR, tile_lanes, untile_lanes

    wp, nband = 48, 3
    n = nband * TR * wp
    x = jnp.arange(n, dtype=jnp.float32)
    t = tile_lanes(x, wp)
    np.testing.assert_array_equal(np.asarray(untile_lanes(t, wp)),
                                  np.asarray(x))
    # first tile of first band = rows 0..7, cols 0..15 in row-major order
    expect = (np.arange(TR)[:, None] * wp + np.arange(TC)[None]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(t[:TR * TC]), expect)


def test_xband_fits_on_sweep_geometry():
    from mvsnerf_tpu.ops.homography import plane_sweep_pix_coords
    from mvsnerf_tpu.ops.pallas_sweep2 import tile_lanes, xband_fits

    feats, imgs, projs, depths = _scene()
    hp, wp = H + 2 * PAD, W + 2 * PAD
    coords = [plane_sweep_pix_coords(projs[i], depths, H, W, PAD)
              for i in range(1, V)]
    xs = tile_lanes(jnp.stack([c[0] for c in coords]), wp)
    ys = tile_lanes(jnp.stack([c[1] for c in coords]), wp)
    assert bool(xband_fits(xs, ys, H, W, wb=32, bandp=16))


def test_cost_volume_xband_matches_gather():
    from mvsnerf_tpu.ops.homography import build_cost_volume
    from mvsnerf_tpu.ops.pallas_sweep2 import xband_shape_ok

    feats, imgs, projs, depths = _scene()
    assert xband_shape_ok(H + 2 * PAD, W + 2 * PAD, H, W)

    ref = build_cost_volume(imgs, feats, projs, depths, pad=PAD,
                            fast_warp=False)
    out = build_cost_volume(imgs, feats, projs, depths, pad=PAD,
                            warp_fwd_mode="pallas", warp_band=16)
    for r, o, name in zip(ref, out, ("cost", "masks", "colors")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-4, rtol=1e-3, err_msg=name)


def test_cost_volume_xband_backward():
    from mvsnerf_tpu.ops.homography import build_cost_volume

    feats, imgs, projs, depths = _scene(d=4)

    def loss(f, im, mode):
        kw = dict(warp_fwd_mode=mode, warp_band=16) if mode == "pallas" \
            else dict(fast_warp=False)
        cost = build_cost_volume(im, f, projs, depths, pad=PAD, **kw)[0]
        return jnp.sum(cost ** 2 + 0.3 * cost)

    g_ref = jax.grad(lambda f, im: loss(f, im, "gather"), argnums=(0, 1))(
        feats, imgs)
    g_out = jax.grad(lambda f, im: loss(f, im, "pallas"), argnums=(0, 1))(
        feats, imgs)
    for r, o, name in zip(g_ref, g_out, ("d_feats", "d_imgs")):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-3, rtol=1e-3, err_msg=name)


def test_xband_forced_off_still_exact(monkeypatch):
    """MVSNERF_SWEEP_IMPL=fused must skip the xband candidate and still
    produce the exact cost volume via the v1 kernel chain."""
    from mvsnerf_tpu.ops.homography import build_cost_volume

    feats, imgs, projs, depths = _scene(d=4)
    ref = build_cost_volume(imgs, feats, projs, depths, pad=PAD,
                            fast_warp=False)
    monkeypatch.setenv("MVSNERF_SWEEP_IMPL", "fused")
    out = build_cost_volume(imgs, feats, projs, depths, pad=PAD,
                            warp_fwd_mode="pallas", warp_band=16)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=2e-4, rtol=1e-3)


def test_xband_packed16_fused_epilogue(monkeypatch):
    """The tile-unpack permutation fused into the packed16 relayout must
    equal the v1 path's packed16 output."""
    from mvsnerf_tpu.ops.homography import build_cost_volume

    feats, imgs, projs, depths = _scene(d=16)
    monkeypatch.setenv("MVSNERF_SWEEP_IMPL", "fused")
    ref = build_cost_volume(imgs, feats, projs, depths, pad=PAD,
                            warp_fwd_mode="pallas", warp_band=16,
                            cost_layout="packed16")[0]
    monkeypatch.setenv("MVSNERF_SWEEP_IMPL", "xband")
    out = build_cost_volume(imgs, feats, projs, depths, pad=PAD,
                            warp_fwd_mode="pallas", warp_band=16,
                            cost_layout="packed16")[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_pack16_repack_kernel_matches_xla():
    """The Pallas packed16 repack (interpret) must equal the XLA
    permutation, and its custom-vjp backward must match XLA AD."""
    from mvsnerf_tpu.ops.pallas_sweep2 import (_pack16_xla,
                                               pack16_from_tiles)

    d, hp, wp, ct, cc = 16, 16, 32, 6, 8
    x = jnp.asarray(RNG.standard_normal((cc, d * hp * wp)).astype(np.float32))
    ref = _pack16_xla(x, d, hp, wp, ct, cc)
    out = pack16_from_tiles(x, d, hp, wp, ct, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))

    g_ref = jax.grad(lambda v: jnp.sum(
        _pack16_xla(v, d, hp, wp, ct, cc) ** 2))(x)
    g_out = jax.grad(lambda v: jnp.sum(
        pack16_from_tiles(v, d, hp, wp, ct, True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref))
