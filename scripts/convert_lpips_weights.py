"""Convert lpips-VGG weights to the .npz format eval.metrics.LPIPS loads.

The reference computes LPIPS with the `lpips` package's VGG16 net
(renderer.ipynb cells 1/11/23, inputs scaled to [-1, 1]). This image has no
network egress, so the pretrained weights cannot be downloaded here; run
this script on a machine that has them. Two sources are supported:

1. The `lpips` package itself (preferred):
       python scripts/convert_lpips_weights.py --out lpips_vgg.npz
2. Raw torch checkpoint files (no lpips install needed):
       python scripts/convert_lpips_weights.py --out lpips_vgg.npz \
           --vgg_pth vgg16-397923af.pth --lin_pth vgg.pth
   where vgg_pth is the torchvision VGG16 state_dict and lin_pth is the
   lpips repo's lpips/weights/v0.1/vgg.pth (lin0..lin4 1x1 conv weights).

Output keys: conv{i}_kernel (HWIO), conv{i}_bias for the 13 VGG convs, and
lin{j} (C_j,) for the 5 LPIPS heads — see eval.metrics.LPIPS.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def from_lpips_package():
    import lpips
    import torch

    net = lpips.LPIPS(net="vgg")
    out = {}
    convs = [m for sl in (net.net.slice1, net.net.slice2, net.net.slice3,
                          net.net.slice4, net.net.slice5) for m in sl]
    ci = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            out[f"conv{ci}_kernel"] = \
                m.weight.detach().permute(2, 3, 1, 0).numpy()
            out[f"conv{ci}_bias"] = m.bias.detach().numpy()
            ci += 1
    assert ci == 13, f"expected 13 convs, found {ci}"
    for j, lin in enumerate([net.lin0, net.lin1, net.lin2, net.lin3,
                             net.lin4]):
        out[f"lin{j}"] = \
            lin.model[1].weight.detach().numpy().reshape(-1)
    return out


def from_state_dicts(vgg_pth: str, lin_pth: str):
    import torch

    vgg_sd = torch.load(vgg_pth, map_location="cpu")
    lin_sd = torch.load(lin_pth, map_location="cpu")
    out = {}
    # torchvision VGG16 features: conv weights at features.{idx}.weight for
    # idx in the standard 13-conv layout
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for ci, idx in enumerate(conv_idx):
        w = vgg_sd[f"features.{idx}.weight"]
        b = vgg_sd[f"features.{idx}.bias"]
        out[f"conv{ci}_kernel"] = w.permute(2, 3, 1, 0).numpy()
        out[f"conv{ci}_bias"] = b.numpy()
    # lpips lin heads: lin{j}.model.1.weight, shape (1, C, 1, 1)
    for j in range(5):
        key = f"lin{j}.model.1.weight"
        out[f"lin{j}"] = lin_sd[key].numpy().reshape(-1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    ap.add_argument("--vgg_pth", default=None,
                    help="torchvision vgg16 state_dict .pth")
    ap.add_argument("--lin_pth", default=None,
                    help="lpips v0.1 vgg.pth (lin heads)")
    args = ap.parse_args()

    if args.vgg_pth and args.lin_pth:
        out = from_state_dicts(args.vgg_pth, args.lin_pth)
    else:
        try:
            out = from_lpips_package()
        except ImportError:
            raise SystemExit(
                "lpips package not installed - pass --vgg_pth/--lin_pth "
                "checkpoint files instead")
    np.savez(args.out, **out)
    print(f"wrote {args.out}: 13 convs + 5 lin heads")


if __name__ == "__main__":
    main()
