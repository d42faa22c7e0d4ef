"""Tiled fused full-image render kernel vs the exact XLA path
(interpret mode on CPU; the same kernel compiles natively on TPU).

Covers ops/pallas_render_tiled.py: trilinear window interpolation
(zeros padding at volume edges), v0 MLP, streaming compositing, tile
planning/fallback, and the pack/untile layout round trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

CKPT = "/root/reference/ckpts/mvsnerf-v0.tar"

RNG = np.random.default_rng(33)

# Small-geometry kernel config: full-extent x/y windows (always valid),
# kb=8 z band.  yb * kb must equal 128.
DIMS = (16, 16, 16)       # (D, HP, WP)
KCFG = dict(yb=16, kb=8, xb=16)
IMAGE_HW = (8, 16)
TILE_HW = (4, 8)
S = 32


@pytest.fixture(scope="module")
def mlp():
    import os
    if os.path.exists(CKPT):
        from mvsnerf_tpu.io.torch_ckpt import load_reference_checkpoint
        return load_reference_checkpoint(CKPT)["mlp"]
    from mvsnerf_tpu.models import init_mlp
    return init_mlp(jax.random.PRNGKey(0), "v0")


@pytest.fixture(scope="module")
def scene():
    D, HP, WP = DIMS
    H, W = IMAGE_HW
    vol = RNG.standard_normal((D, HP, WP, 20)).astype(np.float32)
    # Per-pixel ndc rays with small jitter; z spans the volume so the
    # kb=8 band (per sample column, shared across rays) is exercised.
    px = np.tile(np.arange(W), H).astype(np.float32)
    py = np.repeat(np.arange(H), W).astype(np.float32)
    jit = RNG.uniform(-0.3, 0.3, (2, H * W, S)).astype(np.float32)
    x = ((px[:, None] + jit[0]) / (W - 1)).clip(-0.05, 1.05)
    y = ((py[:, None] + jit[1]) / (H - 1)).clip(-0.05, 1.05)
    z = np.broadcast_to(np.linspace(0.0, 1.0, S, dtype=np.float32),
                        (H * W, S)).copy()
    xyz = np.stack([x, y, z], axis=-1)            # (H*W, S, 3)
    z_vals = (2.0 + 4.0 * z).astype(np.float32)   # metric depth
    dirs = RNG.standard_normal((H * W, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return (jnp.asarray(vol), jnp.asarray(xyz), jnp.asarray(dirs),
            jnp.asarray(z_vals))


def exact_reference(mlp, vol, xyz, dirs, z_vals, white_bkgd=False):
    from mvsnerf_tpu.ops.interp import index_point_feature
    from mvsnerf_tpu.render.renderer import run_network
    from mvsnerf_tpu.ops.compositing import raw2outputs

    feats = index_point_feature(vol, xyz)
    raw = run_network(mlp, xyz, dirs, feats, net_type="v0")
    return raw2outputs(raw, z_vals, white_bkgd=white_bkgd)


def test_tiled_render_matches_exact(mlp, scene):
    from mvsnerf_tpu.ops import pallas_render_tiled as prt

    vol, xyz, dirs, z_vals = scene
    ref = exact_reference(mlp, vol, xyz, dirs, z_vals)

    out = prt.render_image_tiled(
        mlp, prt.prepare_volume(vol, dtype=jnp.float32), xyz, dirs,
        z_vals, image_hw=IMAGE_HW, dims=DIMS, tile_hw=TILE_HW,
        mlp_precision="highest", interp_dtype="float32",
        interpret=True, **KCFG)

    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["acc"]),
                               np.asarray(ref["acc"]), atol=3e-5)


def test_tiled_render_high_precision_mlp(mlp, scene):
    """'high' = manual 3-pass bf16 split emulation: must track the exact
    path to ~1e-3 even with f32 interpolation."""
    from mvsnerf_tpu.ops import pallas_render_tiled as prt

    vol, xyz, dirs, z_vals = scene
    ref = exact_reference(mlp, vol, xyz, dirs, z_vals)
    out = prt.render_image_tiled(
        mlp, prt.prepare_volume(vol, dtype=jnp.float32), xyz, dirs,
        z_vals, image_hw=IMAGE_HW, dims=DIMS, tile_hw=TILE_HW,
        mlp_precision="high", interp_dtype="float32", unroll=4,
        interpret=True, **KCFG)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=3e-3)


def test_tiled_render_white_bkgd_and_bf16(mlp, scene):
    from mvsnerf_tpu.ops import pallas_render_tiled as prt

    vol, xyz, dirs, z_vals = scene
    ref = exact_reference(mlp, vol, xyz, dirs, z_vals, white_bkgd=True)
    out = prt.render_image_tiled(
        mlp, prt.prepare_volume(vol), xyz, dirs, z_vals,
        image_hw=IMAGE_HW, dims=DIMS, tile_hw=TILE_HW,
        white_bkgd=True, interpret=True, **KCFG)
    # bf16 window/weights: loose tolerance, but must track the exact path
    # (an N(0,1) noise volume is the worst case for bf16 interpolation —
    # real encoding volumes are much smoother).
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=5e-2)


def test_tiled_render_fallback_paths(mlp, scene):
    from mvsnerf_tpu.ops import pallas_render_tiled as prt

    vol, xyz, dirs, z_vals = scene
    calls = []

    def fallback():
        calls.append(1)
        return {"rgb": None, "depth": None, "acc": None}

    # Image that does not tile evenly -> fallback.
    prt.render_image_tiled(
        mlp, prt.prepare_volume(vol), xyz[:6 * 16], dirs[:6 * 16],
        z_vals[:6 * 16], image_hw=(6, 16), dims=DIMS, tile_hw=TILE_HW,
        fallback_fn=fallback, **KCFG)
    assert calls == [1]

    # Tile locality violated (x span exceeds an 8-voxel window) -> fallback.
    wild = xyz.at[..., 0].set(
        jnp.asarray(RNG.uniform(0, 1, xyz.shape[:-1]).astype(np.float32)))
    prt.render_image_tiled(
        mlp, prt.prepare_volume(vol), wild, dirs, z_vals,
        image_hw=IMAGE_HW, dims=DIMS, tile_hw=TILE_HW,
        fallback_fn=fallback, yb=16, kb=8, xb=8)
    assert calls == [1, 1]


def test_pack_untile_roundtrip():
    from mvsnerf_tpu.ops import pallas_render_tiled as prt

    H, W = IMAGE_HW
    vals = jnp.asarray(
        RNG.standard_normal((H * W, 8)).astype(np.float32))
    xyz = jnp.zeros((H * W, S, 3))
    zv = jnp.zeros((H * W, S))
    _, _, dirs_t = prt.pack_tiles(xyz, vals[:, :3], zv,
                                  image_hw=IMAGE_HW, tile_hw=TILE_HW)
    # tiles() ordering must invert through untile_image.
    T, R = dirs_t.shape[:2]
    tiled8 = jnp.concatenate(
        [dirs_t, jnp.zeros((T, R, 5))], axis=-1)
    back = prt.untile_image(tiled8, IMAGE_HW, TILE_HW)
    np.testing.assert_allclose(np.asarray(back[:, :3]),
                               np.asarray(vals[:, :3]))


def test_tiled_render_early_stop_bound(mlp, scene):
    """Transmittance early-out may drop at most `early_stop` of remaining
    weight: outputs with the default 1e-4 match the no-early-out render
    to that bound."""
    from mvsnerf_tpu.ops import pallas_render_tiled as prt

    vol, xyz, dirs, z_vals = scene
    kw = dict(image_hw=IMAGE_HW, dims=DIMS, tile_hw=TILE_HW,
              mlp_precision="highest", interpret=True, **KCFG)
    a = prt.render_image_tiled(mlp, prt.prepare_volume(vol), xyz, dirs,
                               z_vals, early_stop=0.0, **kw)
    b = prt.render_image_tiled(mlp, prt.prepare_volume(vol), xyz, dirs,
                               z_vals, early_stop=1e-4, **kw)
    np.testing.assert_allclose(np.asarray(b["rgb"]), np.asarray(a["rgb"]),
                               atol=1.2e-4)
    np.testing.assert_allclose(np.asarray(b["acc"]), np.asarray(a["acc"]),
                               atol=1.2e-4)


def test_hybrid_streamed_colors_matches_exact(mlp, scene):
    """The hybrid path (8-channel volume + EXACT per-sample colors
    streamed into MLP feature lanes 8:20) equals the exact XLA path over
    feats = [interp8 | colors12] — the exact-quality fast render."""
    from mvsnerf_tpu.ops import pallas_render_tiled as prt
    from mvsnerf_tpu.render.renderer import run_network
    from mvsnerf_tpu.ops.interp import index_point_feature
    from mvsnerf_tpu.ops.compositing import raw2outputs

    vol, xyz, dirs, z_vals = scene
    vol8 = vol[..., :8]
    n, s = xyz.shape[:2]
    colors = jnp.asarray(RNG.uniform(0, 1, (n, s, 12)).astype(np.float32))

    out = prt.render_image_tiled(
        mlp, prt.prepare_volume(vol8, dtype=jnp.float32), xyz, dirs,
        z_vals, image_hw=IMAGE_HW, dims=DIMS, tile_hw=TILE_HW,
        mlp_precision="highest", interp_dtype="float32",
        early_stop=0.0, interpret=True, sample_colors=colors, **KCFG)

    feats = jnp.concatenate([index_point_feature(vol8, xyz), colors], -1)
    raw = run_network(mlp, xyz, dirs, feats, net_type="v0")
    ref = raw2outputs(raw, z_vals)

    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ref["rgb"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=3e-4)


def test_hybrid_renderer_end_to_end(mlp):
    """make_tiled_renderer(exact_colors=True) — the render_mode='hybrid'
    construction — matches the exact chunked render (render_rays with
    per-sample reprojected colors) on a synthetic 3-view scene."""
    from test_train import FakeSceneDataset, H, W, PAD
    from mvsnerf_tpu.config import config_parser
    from mvsnerf_tpu.eval.evaluate import Evaluator
    from mvsnerf_tpu.models import init_mvsnet

    args = config_parser(
        cmd=f"--pad {PAD} --N_samples 32 --dataset_name llff "
            "--render_mode hybrid")
    ds = FakeSceneDataset()
    ev = Evaluator(args, ds, init_mvsnet(jax.random.PRNGKey(0)), mlp)
    volume, imgs, near_far, pose_source = ev.build_volume()
    hybrid = ev.make_tiled_renderer(volume, imgs, near_far, pose_source,
                                    exact_colors=True)
    sample = ds[0]
    out = hybrid(sample["rays"], H, W)
    assert out is not None, "hybrid plan unexpectedly rejected"

    ref = ev.render_rays_buffer(sample["rays"], volume, imgs, near_far,
                                pose_source, chunk=256)
    rgb_h = np.asarray(out["rgb"]).reshape(-1, 3)
    rgb_r = np.asarray(ref["rgb"]).reshape(-1, 3)
    d = np.abs(rgb_h - rgb_r).max(axis=1)
    # Rays whose source-view projection lands EXACTLY on the image
    # boundary are excluded from the max assert: the reference color
    # mask is strict (grid > -1 & grid < 1, utils.py:300-332), so a
    # 1-ulp FMA difference between compilations flips it — inherent to
    # the reference semantics when the target view coincides with a
    # source view (here the synthetic target shares the ref-view edge),
    # measure-zero for real val views. Verified: the unstable rays are
    # the image's edge columns and nothing else.
    from mvsnerf_tpu.ops.geometry import get_ndc_coordinate
    from mvsnerf_tpu.ops.sampling import ray_marcher
    pts, _, _, _ = ray_marcher(jax.random.PRNGKey(0),
                               jnp.asarray(sample["rays"]),
                               args.N_samples, perturb=0.0)
    hs, ws = imgs.shape[1:3]
    inv_scale = jnp.asarray([ws - 1.0, hs - 1.0])
    stable = np.ones(d.shape[0], bool)
    for v in range(3):
        ndc = get_ndc_coordinate(pose_source["w2cs"][v],
                                 pose_source["intrinsics"][v], pts,
                                 inv_scale, near=1.0, far=2.0)
        g = np.asarray(ndc[..., :2] * 2.0 - 1.0)
        stable &= ~np.any(np.abs(np.abs(g) - 1.0) < 1e-4, axis=(1, 2))
    # the full image border projects exactly to ±1 in the shared ref
    # view (128 of 1024 rays here); anything beyond that is a bug
    assert stable.sum() >= 0.85 * d.shape[0]
    # interior rays: bf16 interp noise only (same tolerance class as the
    # tiled test, but no color-bake quality loss)
    assert np.max(d[stable]) < 6e-2
    assert np.mean(d) < 5e-3
