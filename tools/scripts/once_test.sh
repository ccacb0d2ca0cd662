#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
python tools/test.py --cfg_file tools/cfgs/once_models/t_mae.yaml \
    --extra_tag default --fixed_gap_eval 1 ${1:+--ckpt "$1"}
