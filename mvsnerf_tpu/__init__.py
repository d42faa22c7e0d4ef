"""mvsnerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for generalizable
radiance-field reconstruction from multi-view stereo, with the capabilities of
the MVSNeRF reference (apchenstu/mvsnerf, ICCV 2021).

Layout:
    ops/       stateless tensor ops: grid sampling, homography plane sweep,
               positional encoding, ray sampling, alpha compositing, geometry
    models/    flax networks: FeatureNet (2D CNN), CostRegNet (3D U-Net),
               NeRF MLP variants (v0/v1/v2), MVSNet encoding-volume builder
    render/    the volume-rendering pipeline (jit-compiled, static shapes)
    data/      DTU / Blender / LLFF dataset loaders + pair metadata
    io/        torch-checkpoint importer (mvsnerf-v0.tar) + native checkpoints
    parallel/  device-mesh helpers: ray sharding, data-parallel training
    train/     generalizable training, per-scene fine-tuning, fusion
    eval/      metrics (PSNR/SSIM/LPIPS), evaluation and video rendering
"""

__version__ = "0.1.0"
