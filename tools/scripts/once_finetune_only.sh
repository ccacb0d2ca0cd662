#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
python tools/train.py --cfg_file tools/cfgs/once_models/t_mae.yaml \
    --extra_tag default --pretrained_model "$1" \
    --num_epochs_to_eval 5 --fixed_gap_eval 1
