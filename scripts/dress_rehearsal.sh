#!/bin/bash
# Generalizable-training dress rehearsal on the real TPU (VERDICT round-2
# task 7 / round-3 task 4): a few hundred steps of the FULL train_mvs_nerf.py
# loop (dataloader over a multi-scan synthetic DTU set at production
# 640x512/pad-24 shape, mid-train validation, periodic snapshots), a
# hard mid-run kill, then a resume that must continue from the snapshot.
#
# Usage: bash scripts/dress_rehearsal.sh [expname]
set -u
cd "$(dirname "$0")/.."
EXP=${1:-rehearsal_r4}
DATA=/tmp/dtu_ms

[ -d $DATA/scan3 ] || python scripts/make_synthetic_scene.py $DATA scan3,scan4,scan5

ARGS="--expname $EXP --dataset_name dtu --datadir $DATA \
  --scan_list $DATA/scans.txt --num_epochs 1 --batch_size 1024 \
  --N_samples 128 --pad 24 --with_depth --with_depth_loss \
  --val_every 100 --ckpt_every 50 --N_vis 2 --ckpt None"

echo "=== phase 1: train to ~step 160, then SIGKILL mid-flight ==="
python train_mvs_nerf.py $ARGS --max_steps 300 &
PID=$!
# kill once step 160 appears in the csv (or after a hard cap)
CSV=runs_new/$EXP/metrics.csv
for i in $(seq 1 240); do
  sleep 10
  LAST=$(awk -F, 'END{print $1}' $CSV 2>/dev/null)
  if [ "${LAST:-0}" -ge 160 ] 2>/dev/null; then break; fi
  kill -0 $PID 2>/dev/null || break
done
kill -9 $PID 2>/dev/null
wait $PID 2>/dev/null
echo "killed at step ${LAST:-?}; snapshots:"; ls runs_new/$EXP/ckpts/

echo "=== phase 2: resume (resume-by-default) and finish to step 300 ==="
python train_mvs_nerf.py $ARGS --max_steps 300

echo "=== loss curve across the kill (metrics.csv) ==="
cat $CSV
