"""Evaluation metrics: PSNR, SSIM (skimage-compatible), LPIPS (VGG).

The reference computes PSNR via mse2psnr (utils.py:12-16), SSIM via
skimage.metrics.structural_similarity with default settings, and LPIPS via
the lpips VGG network with inputs scaled to [-1, 1] (renderer.ipynb cells
11/16/23). skimage/lpips are not available in this image, so SSIM is
reimplemented with identical defaults (7x7 uniform window, K1=0.01, K2=0.03,
per-channel then averaged) and LPIPS is implemented as a VGG16 feature-space
distance that loads its weights from a user-supplied file.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log(jnp.maximum(mse, 1e-10)) / jnp.log(10.0)


def psnr(img, gt, mask=None):
    img = jnp.asarray(img)
    gt = jnp.asarray(gt)
    if mask is not None:
        err = jnp.where(mask[..., None] if mask.ndim == img.ndim - 1
                        else mask, (img - gt) ** 2, 0.0)
        denom = jnp.sum(mask) * (img.shape[-1] if mask.ndim == img.ndim - 1
                                 else 1)
        return mse2psnr(jnp.sum(err) / denom)
    return mse2psnr(img2mse(img, gt))


def abs_error(depth_pred, depth_gt, mask=None):
    """Depth abs error (utils.py:67-74)."""
    err = jnp.abs(depth_pred - depth_gt)
    if mask is not None:
        return err * mask
    return err


def acc_threshold(depth_pred, depth_gt, mask, threshold):
    """Fraction of pixels with abs error < threshold (utils.py:76-82)."""
    err = jnp.abs(depth_pred - depth_gt)
    acc = (err < threshold) & (mask > 0)
    return jnp.sum(acc) / jnp.maximum(jnp.sum(mask > 0), 1)


def _uniform_filter(img, size=7):
    """Mean filter with skimage's reflect-free 'valid'-interior semantics:
    skimage uses scipy uniform_filter (reflect padding)."""
    pad = size // 2
    padded = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    # separable box filter
    kernel = jnp.ones((size,)) / size
    out = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid"))(
        padded)
    out = jax.vmap(lambda col: jnp.convolve(col, kernel, mode="valid"),
                   in_axes=1, out_axes=1)(out)
    return out


def ssim(img, gt, data_range=1.0, win_size=7):
    """Structural similarity, matching
    skimage.metrics.structural_similarity defaults (uniform 7x7 window,
    K1=0.01, K2=0.03, sample covariance normalization N/(N-1)); channels
    averaged — the reference's eval calls it per image
    (renderer.ipynb cell 11)."""
    img = jnp.asarray(img, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if img.ndim == 3:
        vals = [ssim(img[..., c], gt[..., c], data_range, win_size)
                for c in range(img.shape[-1])]
        return jnp.mean(jnp.stack(vals))

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(img, win_size)
    uy = _uniform_filter(gt, win_size)
    uxx = _uniform_filter(img * img, win_size)
    uyy = _uniform_filter(gt * gt, win_size)
    uxy = _uniform_filter(img * gt, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    # skimage crops the filter-radius border before averaging
    pad = (win_size - 1) // 2
    return jnp.mean(S[pad:-pad, pad:-pad])


# ---------------------------------------------------------------- LPIPS -----

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]
# tap indices into the per-op activation list below:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_LPIPS_TAPS = (1, 4, 8, 12, 16)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    """VGG16 LPIPS distance. Weights must be provided as an .npz with keys
    'conv{i}_kernel'/'conv{i}_bias' (HWIO) for the 13 VGG convs and
    'lin{j}' (1x1 LPIPS head weights, shape (C_j,)), e.g. converted from the
    official lpips release. Raises if the file is absent — this image has no
    network egress to download pretrained weights."""

    def __init__(self, weights_path: str):
        import os
        if not os.path.exists(weights_path):
            raise FileNotFoundError(
                f"LPIPS weights not found at {weights_path}; convert the "
                "official lpips VGG weights to npz (see docs/metrics.md)")
        data = np.load(weights_path)
        self.convs = []
        for i in range(13):
            self.convs.append((jnp.asarray(data[f"conv{i}_kernel"]),
                               jnp.asarray(data[f"conv{i}_bias"])))
        self.lins = [jnp.asarray(data[f"lin{j}"]) for j in range(5)]

    def _features(self, x):
        """x: (H, W, 3) in [-1, 1] -> list of tap activations."""
        x = (x - _LPIPS_SHIFT) / _LPIPS_SCALE
        x = x[None]
        feats = []
        ci = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            else:
                k, b = self.convs[ci]
                x = jax.lax.conv_general_dilated(
                    x, k, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                x = jax.nn.relu(x)
                ci += 1
            feats.append(x)
        return feats

    def __call__(self, img, gt):
        """img, gt: (H, W, 3) in [-1, 1]. Returns scalar LPIPS."""
        fa = self._features(jnp.asarray(img, jnp.float32))
        fb = self._features(jnp.asarray(gt, jnp.float32))
        total = 0.0
        for j, tap in enumerate(_LPIPS_TAPS):
            a, b = fa[tap], fb[tap]
            # lpips.normalize_tensor: x / (||x||_2 + eps), eps OUTSIDE the
            # sqrt (lpips/__init__.py normalize_tensor, eps=1e-10)
            a = a / (jnp.sqrt(jnp.sum(a ** 2, -1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b ** 2, -1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            total = total + jnp.mean(jnp.sum(d * self.lins[j], -1))
        return total
