"""Config / flag system with the reference's public flag surface (opt.py:3-96).

configargparse isn't available in this image, so `--config FILE` support is
implemented on plain argparse: the file holds `key = value` lines which are
applied as defaults before CLI args.
"""

from __future__ import annotations

import argparse
import shlex


def _read_config_file(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            k, v = (s.strip() for s in line.split("=", 1))
            out[k] = v
    return out


def config_parser(cmd=None):
    """Parse flags. `cmd` may be a string (like the notebooks pass,
    opt.py:93-96) or an argv list; None reads sys.argv."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None,
                        help="config file path")
    parser.add_argument("--expname", type=str, help="experiment name")
    parser.add_argument("--basedir", type=str, default="./logs/",
                        help="where to store ckpts and logs")
    parser.add_argument("--datadir", type=str, default="./data/llff/fern",
                        help="input data directory")
    parser.add_argument("--with_depth", action="store_true")
    parser.add_argument("--with_depth_loss", action="store_true")
    parser.add_argument("--with_rgb_loss", action="store_true")
    parser.add_argument("--imgScale_train", type=float, default=1.0)
    parser.add_argument("--imgScale_test", type=float, default=1.0)
    parser.add_argument("--img_downscale", type=float, default=1.0)
    parser.add_argument("--pad", type=int, default=24)
    parser.add_argument("--warp_mode", type=str, default="auto",
                        choices=["auto", "pallas", "packed", "banded",
                                 "gather"],
                        help="plane-sweep warp implementation (TPU-only "
                             "extension; 'auto' = fused Pallas kernel on "
                             "TPU, packed gather elsewhere)")
    parser.add_argument("--costreg_impl", type=str, default="auto",
                        choices=["auto", "packed", "plain", "dband"],
                        help="CostRegNet implementation: 'packed' folds "
                             "depth slices into channels so every U-Net "
                             "level runs at 128 lanes (TPU layout "
                             "optimization, models/costreg_packed.py); "
                             "'dband' = channel-major depth-band Pallas "
                             "kernels (ops/pallas_costreg.py); "
                             "'auto' = packed when the shape conforms")
    parser.add_argument("--featurenet_impl", type=str, default="auto",
                        choices=["auto", "packed", "plain"],
                        help="FeatureNet implementation: 'packed' folds "
                             "4x4 pixel blocks into channels so the "
                             "full-res levels run at 128 lanes "
                             "(models/featurenet_packed.py); 'auto' = "
                             "packed when H, W divide by 4")
    parser.add_argument("--color_warp_mode", type=str, default="auto",
                        choices=["auto", "gather", "pallas"],
                        help="per-sample source-color reprojection "
                             "(build_color_volume): 'gather' = exact XLA "
                             "corner-packed gather; 'pallas' = banded-MXU "
                             "warp (~4e-3 vs gather from bf16 in-kernel "
                             "interp, 31x faster device-looped); 'auto' = "
                             "pallas on TPU when the shape conforms. "
                             "Applies to training losses and the "
                             "fine-tune color bake; set 'gather' to pin "
                             "exact numerics")
    parser.add_argument("--volume_gather_impl", type=str, default="auto",
                        choices=["auto", "banded", "pallas", "pallas_bf16",
                                 "pallas2"],
                        help="trainable-volume trilinear sampling "
                             "implementation for training steps: 'banded' "
                             "= XLA banded factorization "
                             "(ops/volume_grad.py), 'pallas'/'pallas_bf16' "
                             "= fused Pallas gather/splat kernel with "
                             "f32/bf16 MXU operands "
                             "(ops/pallas_volgather.py); 'pallas2' = "
                             "y-sorted-block fused kernel with banded "
                             "fallback (ops/pallas_volgather2.py); "
                             "'auto' = the device-measured winner on TPU "
                             "(see docs/status.md), banded elsewhere")
    parser.add_argument("--eval_gather", type=str, default="auto",
                        choices=["auto", "exact", "fast"],
                        help="encoding-volume gather for EVAL renders: "
                             "'exact' = XLA trilinear gather (bit-parity "
                             "with F.grid_sample; ~221 ms per 16384-ray "
                             "chunk on v5e — gathers serialize on TPU); "
                             "'fast' = banded-matmul forward "
                             "(ops/volume_grad.py banded factorization, "
                             "42.9 ms per chunk; bf16-operand class "
                             "feature delta ~1e-2, PSNR parity recorded "
                             "in docs/status.md round 5); 'auto' = fast "
                             "on TPU, exact elsewhere")
    parser.add_argument("--mlp_impl", type=str, default="auto",
                        choices=["auto", "xla", "pallas", "pallas_high"],
                        help="NeRF-MLP implementation in TRAINING steps: "
                             "'xla' = autodiff at MVSNERF_TPU_MLP_PRECISION "
                             "(default highest); 'pallas'/'pallas_high' = "
                             "fused fwd+bwd kernel (ops/pallas_mlp.py, v0 "
                             "only) with bf16 1-pass / 3-pass MXU dots — "
                             "feats-slice input gradients only (exact); "
                             "'auto' = the device-measured winner on TPU "
                             "(pallas), xla elsewhere. Eval/render paths "
                             "are unaffected")
    parser.add_argument("--render_mode", type=str, default="chunked",
                        choices=["chunked", "tiled", "hybrid"],
                        help="full-image render path: 'chunked' = exact "
                             "XLA lax.map chunks (reference parity); "
                             "'tiled' = fused Pallas tile kernel over a "
                             "color-baked volume (TPU fast path, "
                             "~1 dB below exact); 'hybrid' = fused tile "
                             "kernel + EXACT per-sample colors streamed "
                             "in (exact quality at kernel speed; "
                             "ops/pallas_render_tiled.py). tiled/hybrid "
                             "fall back to chunked when a view breaks "
                             "tile locality")
    parser.add_argument("--fixed_sources", action="store_true",
                        help="evaluate.py: keep the default 3 source views "
                             "for every val image instead of re-selecting "
                             "the 3 nearest training views per image "
                             "(renderer.ipynb cell 11 re-selects; this is "
                             "the escape hatch)")
    parser.add_argument("--lpips_weights", type=str,
                        default="lpips_vgg.npz",
                        help="path to converted lpips-VGG weights .npz "
                             "(scripts/convert_lpips_weights.py); when the "
                             "file exists, evaluate.py reports LPIPS like "
                             "renderer.ipynb cell 11")

    # loader options
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--num_epochs", type=int, default=8)
    parser.add_argument("--pts_dim", type=int, default=3)
    parser.add_argument("--dir_dim", type=int, default=3)
    parser.add_argument("--alpha_feat_dim", type=int, default=8)
    parser.add_argument("--net_type", type=str, default="v0")
    parser.add_argument("--dataset_name", type=str, default="blender",
                        choices=["dtu", "blender", "llff", "dtu_ft"])
    parser.add_argument("--use_color_volume", default=False,
                        action="store_true",
                        help="project colors into a volume without indexing "
                             "from image everytime")
    parser.add_argument("--use_density_volume", default=False,
                        action="store_true",
                        help="point sampling with density")

    # training options
    parser.add_argument("--netdepth", type=int, default=6)
    parser.add_argument("--netwidth", type=int, default=128)
    parser.add_argument("--netdepth_fine", type=int, default=6)
    parser.add_argument("--netwidth_fine", type=int, default=128)
    parser.add_argument("--lrate", type=float, default=5e-4)
    parser.add_argument("--decay_step", nargs="+", type=int,
                        default=[5000, 8000, 9000])
    parser.add_argument("--decay_gamma", type=float, default=0.5)
    parser.add_argument("--lr_scheduler", type=str, default="steplr",
                        choices=["steplr", "cosine", "poly"])
    parser.add_argument("--warmup_epochs", type=int, default=0)

    parser.add_argument("--chunk", type=int, default=1024)
    parser.add_argument("--netchunk", type=int, default=1024)
    parser.add_argument("--ckpt", type=str, default=None)

    # rendering options
    parser.add_argument("--N_samples", type=int, default=128)
    parser.add_argument("--N_importance", type=int, default=0)
    parser.add_argument("--use_disp", default=False, action="store_true")
    parser.add_argument("--perturb", type=float, default=1.0)
    parser.add_argument("--use_viewdirs", action="store_true")
    parser.add_argument("--i_embed", type=int, default=0)
    parser.add_argument("--multires", type=int, default=10)
    parser.add_argument("--multires_views", type=int, default=4)
    parser.add_argument("--raw_noise_std", type=float, default=0.0)

    # blender flags
    parser.add_argument("--white_bkgd", action="store_true")

    # logging/saving options
    parser.add_argument("--N_vis", type=int, default=20)

    # TPU-native additions (not in the reference flag surface)
    parser.add_argument("--precision", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="compute precision for the hot path")
    parser.add_argument("--num_devices", type=int, default=0,
                        help="devices to use (0 = all)")
    parser.add_argument("--max_steps", type=int, default=0,
                        help="cap training steps (0 = schedule default)")
    parser.add_argument("--ckpt_every", type=int, default=20000,
                        help="generalizable training: snapshot cadence in "
                             "steps (atomic .msgpack snapshots; resume is "
                             "by default)")
    parser.add_argument("--val_every", type=int, default=0,
                        help="generalizable training: run the validation "
                             "pass every N steps in addition to per-epoch "
                             "(0 = per-epoch only)")
    parser.add_argument("--scan_list", type=str, default="",
                        help="dtu: path to a scan-list txt overriding the "
                             "packaged split lists (hermetic synthetic "
                             "multi-scan runs)")

    if isinstance(cmd, str):
        cmd = shlex.split(cmd)
    args, _ = parser.parse_known_args(cmd) if cmd is not None else \
        (parser.parse_args(), None)

    if args.config:
        defaults = _read_config_file(args.config)
        known = {a.dest: a for a in parser._actions}
        for k, v in defaults.items():
            if k in known and getattr(args, k) == known[k].default:
                action = known[k]
                if isinstance(action, argparse._StoreTrueAction):
                    setattr(args, k, v.lower() in ("1", "true", "yes"))
                elif action.nargs in ("+", "*"):
                    setattr(args, k, [action.type(x) for x in v.split()])
                elif action.type is not None:
                    setattr(args, k, action.type(v))
                else:
                    setattr(args, k, v)
    return args
