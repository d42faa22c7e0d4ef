"""LPIPS parity: eval.metrics.LPIPS vs an independent torch implementation
of the lpips-VGG forward (lpips package semantics: ScalingLayer, VGG16
features with taps at relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalize
x/(||x||+1e-10), squared diff, 1x1 lin heads, spatial average, sum).

The official weights cannot be downloaded in this image (no egress), so the
architecture is verified with RANDOM weights — any layout/semantics mismatch
(kernel transpose, tap position, pooling placement, eps placement) shows up
just as loudly as it would with real weights. renderer.ipynb cell 11 is the
reference call site (inputs scaled to [-1, 1])."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mvsnerf_tpu.eval.metrics import (LPIPS, _LPIPS_SHIFT, _LPIPS_SCALE,
                                      _VGG16_CFG)

pytestmark = pytest.mark.slow  # compile-heavy tier (see pytest.ini)

RNG = np.random.default_rng(3)


def random_weights():
    out = {}
    cin = 3
    ci = 0
    tap_channels = []
    for v in _VGG16_CFG:
        if v == "M":
            continue
        out[f"conv{ci}_kernel"] = (
            RNG.standard_normal((3, 3, cin, v)) / np.sqrt(9 * cin)
        ).astype(np.float32)
        out[f"conv{ci}_bias"] = \
            (RNG.standard_normal(v) * 0.1).astype(np.float32)
        cin = v
        ci += 1
        tap_channels.append(v)
    for j, c in enumerate([64, 128, 256, 512, 512]):
        out[f"lin{j}"] = RNG.uniform(0, 1, c).astype(np.float32)
    return out


def torch_lpips(weights, img, gt):
    """Independent torch forward mirroring lpips.LPIPS(net='vgg')."""
    import torch.nn.functional as F

    shift = torch.tensor(_LPIPS_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_LPIPS_SCALE).view(1, 3, 1, 1)

    def features(x):
        x = (x - shift) / scale
        feats = []
        ci = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = F.max_pool2d(x, 2, 2)
            else:
                k = torch.tensor(weights[f"conv{ci}_kernel"]).permute(
                    3, 2, 0, 1)  # HWIO -> OIHW
                b = torch.tensor(weights[f"conv{ci}_bias"])
                x = F.relu(F.conv2d(x, k, b, padding=1))
                ci += 1
            feats.append(x)
        return feats

    def unit_norm(x):
        n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (n + 1e-10)

    a = features(torch.tensor(img).permute(2, 0, 1)[None])
    b = features(torch.tensor(gt).permute(2, 0, 1)[None])
    total = 0.0
    for j, tap in enumerate((1, 4, 8, 12, 16)):
        d = (unit_norm(a[tap]) - unit_norm(b[tap])) ** 2
        lin = torch.tensor(weights[f"lin{j}"]).view(1, -1, 1, 1)
        total = total + torch.mean(torch.sum(d * lin, dim=1))
    return float(total)


def test_lpips_matches_torch_reference(tmp_path):
    weights = random_weights()
    path = str(tmp_path / "lpips_rand.npz")
    np.savez(path, **weights)

    img = RNG.uniform(-1, 1, (64, 80, 3)).astype(np.float32)
    gt = RNG.uniform(-1, 1, (64, 80, 3)).astype(np.float32)

    ours = float(LPIPS(path)(img, gt))
    ref = torch_lpips(weights, img, gt)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)

    # identical inputs -> zero distance
    same = float(LPIPS(path)(img, img))
    assert abs(same) < 1e-8


def test_lpips_missing_weights_raise(tmp_path):
    with pytest.raises(FileNotFoundError):
        LPIPS(str(tmp_path / "nope.npz"))
