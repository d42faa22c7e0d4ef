#!/bin/bash
# 10k-step fine-tune soak on the real TPU (VERDICT r3 task 7 — the
# reference's BASELINE config 3: 10k steps in ~15 min on a 2080 Ti,
# README.md:135). Runs the FULL CLI (dataloader, density refresh every
# 200 steps, mid-train validation, checkpoints) on the synthesized scene
# with the production kernel defaults, and prints the wall-clock and the
# final/val PSNR trajectory for docs/status.md.
#
#   bash scripts/finetune_soak.sh
set -ex
cd "$(dirname "$0")/.."

python scripts/make_synthetic_scene.py /tmp/dtu_synth

start=$(date +%s)
timeout -s KILL 3000 python train_mvs_nerf_finetuning.py \
    --dataset_name dtu_ft --datadir /tmp/dtu_synth/scan1 \
    --expname soak10k_r5 --max_steps 10000 --with_rgb_loss \
    --imgScale_train 1.0 --imgScale_test 1.0 --pad 24 \
    --batch_size 1024 --N_samples 128 \
    --ckpt /root/reference/ckpts/mvsnerf-v0.tar \
    2>&1 | tee /tmp/soak10k.log
echo "wall-clock: $(( $(date +%s) - start )) s"
tail -8 runs_fine_tuning/soak10k_r5/metrics.csv
