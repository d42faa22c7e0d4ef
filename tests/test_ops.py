"""Unit tests for encoding, compositing, sampling, geometry ops.

Analytic identities plus parity against straightforward torch/numpy
re-derivations of the reference formulas (renderer.py:18-26, utils.py:112-146,
data/ray_utils.py:98-141).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mvsnerf_tpu.ops import (
    positional_encoding,
    embedder_out_dim,
    raw2alpha,
    raw2outputs,
    depth2dist,
    sample_pdf,
    stratified_z_vals,
    get_ndc_coordinate,
    rays_from_pixels,
    dda,
)

RNG = np.random.default_rng(1)


def test_positional_encoding_layout():
    # Reference Embedder.embed (models.py:47-51): [x, sin(freq-major), cos(...)]
    x = jnp.asarray(RNG.standard_normal((5, 3)).astype(np.float32))
    out = positional_encoding(x, num_freqs=10)
    assert out.shape == (5, 63)
    assert embedder_out_dim(3, 10) == 63
    np.testing.assert_allclose(out[:, :3], x, atol=0)
    freqs = 2.0 ** np.linspace(0, 9, 10)
    # sin block: channels 3..33, frequency-major groups of 3
    for k in [0, 3, 9]:
        np.testing.assert_allclose(
            np.asarray(out[:, 3 + 3 * k: 6 + 3 * k]),
            np.sin(np.asarray(x) * freqs[k]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out[:, 33 + 3 * k: 36 + 3 * k]),
            np.cos(np.asarray(x) * freqs[k]), atol=1e-6)


def test_raw2alpha_opaque_sample():
    # A huge sigma at sample k => weight ~1 there, ~0 elsewhere.
    sigma = jnp.zeros((1, 8)).at[0, 3].set(50.0)
    alpha, weights = raw2alpha(sigma)
    assert abs(float(weights[0, 3]) - 1.0) < 1e-5
    assert float(jnp.sum(weights)) - 1.0 < 1e-4


def test_raw2alpha_matches_reference_formula():
    sigma = jnp.asarray(np.abs(RNG.standard_normal((4, 16))).astype(np.float32))
    alpha, weights = raw2alpha(sigma)
    a = 1.0 - np.exp(-np.asarray(sigma))
    t = np.cumprod(np.concatenate([np.ones((4, 1)), 1 - a + 1e-10], -1), -1)[:, :-1]
    np.testing.assert_allclose(np.asarray(weights), a * t, rtol=1e-5)


def test_raw2outputs_white_bkgd():
    raw = jnp.zeros((2, 4, 4))  # zero density -> acc 0 -> white
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 4), (2, 4))
    out = raw2outputs(raw, z, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-6)
    out2 = raw2outputs(raw, z, white_bkgd=False)
    np.testing.assert_allclose(np.asarray(out2["rgb"]), 0.0, atol=1e-6)


def test_depth2dist():
    z = jnp.asarray([[1.0, 2.0, 4.0]])
    cos = jnp.asarray([2.0])
    d = depth2dist(z, cos)
    np.testing.assert_allclose(np.asarray(d[0, :2]), [2.0, 4.0])
    assert float(d[0, 2]) > 1e9


def test_sample_pdf_deterministic_uniform():
    # Uniform weights => det samples approximately uniform over bin range.
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
    weights = jnp.ones((2, 8))
    s = sample_pdf(jax.random.PRNGKey(0), bins, weights, 16, det=True)
    assert s.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(s[0, 0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s[0, -1]), 1.0, atol=1e-5)
    assert np.all(np.diff(np.asarray(s[0])) >= -1e-6)


def test_sample_pdf_concentrates_mass():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
    weights = jnp.zeros((1, 10)).at[0, 5].set(100.0)
    s = sample_pdf(jax.random.PRNGKey(1), bins, weights, 64)
    frac = np.mean((np.asarray(s) >= 0.5) & (np.asarray(s) <= 0.6))
    assert frac > 0.9


def test_stratified_z_vals_bounds():
    z = stratified_z_vals(jax.random.PRNGKey(0), 2.0, 6.0, 32, 16, perturb=1.0)
    assert z.shape == (32, 16)
    assert float(jnp.min(z)) >= 2.0 - 1e-5
    assert float(jnp.max(z)) <= 6.0 + 1e-5
    assert np.all(np.diff(np.asarray(z), axis=-1) > 0)


def test_ndc_coordinate_roundtrip():
    # A point on the ref camera axis at mid depth should land at the
    # principal point, z = 0.5.
    intr = jnp.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    w2c = jnp.eye(4)
    near, far = 2.0, 6.0
    pts = jnp.asarray([[[0.0, 0.0, 4.0]]])
    inv_scale = jnp.asarray([63.0, 47.0])
    ndc = get_ndc_coordinate(w2c, intr, pts, inv_scale, near, far)
    np.testing.assert_allclose(np.asarray(ndc[0, 0]),
                               [32 / 63, 24 / 47, 0.5], atol=1e-6)


def test_ndc_pad_remap():
    # pad remap (utils.py:140-143): xy=0 maps to pad/(feat+2pad).
    intr = jnp.asarray([[100.0, 0, 0.0], [0, 100.0, 0.0], [0, 0, 1]])
    w2c = jnp.eye(4)
    pts = jnp.asarray([[[0.0, 0.0, 4.0]]])
    W, H = 64, 48
    inv_scale = jnp.asarray([W - 1.0, H - 1.0])
    ndc = get_ndc_coordinate(w2c, intr, pts, inv_scale, 2.0, 6.0, pad=8)
    wf, hf = (W - 1 + 1) / 4, (H - 1 + 1) / 4
    np.testing.assert_allclose(
        np.asarray(ndc[0, 0, :2]),
        [8 / (wf + 16), 8 / (hf + 16)], atol=1e-6)


def test_rays_from_pixels_center():
    intr = jnp.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    c2w = jnp.eye(4)
    o, d = rays_from_pixels(jnp.asarray([32.0]), jnp.asarray([24.0]), intr, c2w)
    np.testing.assert_allclose(np.asarray(d[0]), [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-6)


def test_dda_unit_box():
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    bbox = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    tmin, tmax = dda(o, d, bbox)
    np.testing.assert_allclose(float(tmin[0, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(float(tmax[0, 0]), 3.0, atol=1e-4)
