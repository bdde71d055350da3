#!/bin/sh
# usage: sh run/train_mink.sh EXP_DIR CONFIG [key value]...
set -e
exp_dir=$1; config=$2; shift 2
mkdir -p "$exp_dir"
python -u -m openscene_tpu.runtime.train_seg --config="$config" \
    save_path "$exp_dir" "$@" 2>&1 | tee "$exp_dir/train-$(date +%Y%m%d_%H%M%S).log"
