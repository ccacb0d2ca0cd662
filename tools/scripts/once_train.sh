#!/usr/bin/env bash
# Pretrain + finetune recipe (reference tools/scripts/once_train.sh: 4xA100 DDP →
# here one process drives the whole TPU mesh; batch = per-chip x n_chips).
set -e
cd "$(dirname "$0")/../.."

# 1) T-MAE self-supervised pretraining on ONCE raw_large (12 epochs)
python tools/train.py --cfg_file tools/cfgs/once_models/t_mae_ssl.yaml \
    --extra_tag default

# 2) finetune detection (80 epochs) from the pretrained encoder
PRETRAINED=$(ls -d output/once_models/t_mae_ssl/default/ckpt/checkpoint_* | sort -V | tail -1)
python tools/train.py --cfg_file tools/cfgs/once_models/t_mae.yaml \
    --extra_tag default --pretrained_model "$PRETRAINED" \
    --num_epochs_to_eval 5 --fixed_gap_eval 1
