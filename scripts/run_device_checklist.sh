#!/bin/bash
# On-device measurement checklist (docs/status.md round 2): run after the
# axon TPU backend returns. Logs to /tmp/checklist_*.log; each step is
# independent so partial completion still yields data.
#
#   bash scripts/run_device_checklist.sh
set -x
cd "$(dirname "$0")/.." || exit 1

# 0. backend sanity
timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))), jax.devices())" \
    > /tmp/checklist_probe.log 2>&1 || exit 1

# 1. dband U-Net validation + timing (numerics vs packed, f32/bf16)
timeout 3000 python scripts/validate_pallas_costreg_tpu.py \
    > /tmp/checklist_dband.log 2>&1

# 2. generalizable step A/Bs
timeout 1200 python scripts/profile_generalizable.py \
    > /tmp/checklist_gen_base.log 2>&1
timeout 1200 python scripts/profile_generalizable.py --featurenet_impl plain \
    > /tmp/checklist_gen_fnplain.log 2>&1
timeout 3000 python scripts/profile_generalizable.py --costreg_impl dband \
    > /tmp/checklist_gen_dband.log 2>&1
MVSNERF_SWEEP_BWD_GROUPS=8 timeout 1200 \
    python scripts/profile_generalizable.py \
    > /tmp/checklist_gen_grp8.log 2>&1

# 3. bench (three headline metrics, current defaults)
timeout 2400 python bench.py > /tmp/checklist_bench.log 2>&1

# 4. eval CLI smoke (chunked + tiled) on the synthetic scene
python scripts/make_synthetic_scene.py /tmp/dtu_synth > /dev/null 2>&1
timeout 1800 python evaluate.py --dataset_name dtu_ft \
    --datadir /tmp/dtu_synth/scan1 \
    --ckpt /root/reference/ckpts/mvsnerf-v0.tar --expname ck_chunked \
    --imgScale_train 0.25 --imgScale_test 0.25 --pad 4 \
    > /tmp/checklist_eval_chunked.log 2>&1
timeout 1800 python evaluate.py --dataset_name dtu_ft \
    --datadir /tmp/dtu_synth/scan1 \
    --ckpt /root/reference/ckpts/mvsnerf-v0.tar --expname ck_tiled \
    --imgScale_train 0.25 --imgScale_test 0.25 --pad 4 \
    --render_mode tiled \
    > /tmp/checklist_eval_tiled.log 2>&1

echo DONE
