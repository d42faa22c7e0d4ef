"""Native C++ data-pipeline parity tests vs the numpy reference paths."""

import numpy as np
import pytest

from mvsnerf_tpu import native
from mvsnerf_tpu.data.common import (normalize_imagenet, read_pfm,
                                     resize_nearest, write_pfm)

RNG = np.random.default_rng(17)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_pfm_decode_matches_reader(tmp_path):
    depth = RNG.uniform(0, 900, (64, 80)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, depth)
    with open(p, "rb") as f:
        raw = f.read()
    out = native.pfm_decode(raw)
    np.testing.assert_allclose(out, depth)


def test_dtu_depth_pipeline_matches_numpy():
    depth = RNG.uniform(400, 900, (1200, 1600)).astype(np.float32)
    for down in (1.0, 0.5):
        ours = native.dtu_depth_pipeline(depth, down, 1 / 200)
        ref = resize_nearest(depth, 0.5, 0.5)[44:556, 80:720]
        if down != 1.0:
            ref = resize_nearest(ref, down, down)
        ref = (ref / 200).astype(np.float32)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_ray_gather_matches_numpy():
    rays = RNG.standard_normal((10000, 8)).astype(np.float32)
    rgbs = RNG.standard_normal((10000, 3)).astype(np.float32)
    idx = RNG.permutation(10000)[:4096].astype(np.int64)
    r, c = native.ray_gather(rays, rgbs, idx, num_threads=4)
    np.testing.assert_array_equal(r, rays[idx])
    np.testing.assert_array_equal(c, rgbs[idx])


def test_imagenet_normalize_matches_numpy():
    img = RNG.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    ref = normalize_imagenet(img.copy())
    out = native.imagenet_normalize_inplace(img.copy())
    np.testing.assert_allclose(out, ref, atol=1e-6)
