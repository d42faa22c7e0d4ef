#!/bin/bash
# Generalizable-training dress rehearsal on the real TPU (VERDICT r3
# task 4): a few hundred steps of the FULL loop (dataloader + logging +
# mid-train validation + checkpoints) on the synthesized multi-scan DTU
# tree, then kill + resume from the snapshot to show the loss curve
# continues. Results land in runs_new/rehearsal_r5 and docs/status.md.
#
#   bash scripts/dress_rehearsal.sh
set -ex
cd "$(dirname "$0")/.."

python scripts/make_synthetic_scene.py /tmp/dtu_ms scan3,scan4,scan5,scan1

COMMON=(--expname rehearsal_r5 --dataset_name dtu --datadir /tmp/dtu_ms
        --scan_list /tmp/dtu_ms/scans.txt --batch_size 1024 --N_samples 128
        --pad 24 --num_epochs 1 --N_vis 2 --ckpt_every 100 --val_every 100)

# phase 1: 220 steps, then the driver kills it mid-flight
timeout -s KILL 900 python train_mvs_nerf.py "${COMMON[@]}" \
    --max_steps 220 2>&1 | tee /tmp/rehearsal_p1.log || true

# phase 2: resume-by-default picks up the last snapshot and continues
timeout -s KILL 900 python train_mvs_nerf.py "${COMMON[@]}" \
    --max_steps 320 2>&1 | tee /tmp/rehearsal_p2.log

tail -5 runs_new/rehearsal_r5/metrics.csv
