#!/bin/sh
# usage: sh run/eval_mink.sh EXP_DIR CONFIG [key value]...
set -e
exp_dir=$1; config=$2; shift 2
mkdir -p "$exp_dir"
python -u -m openscene_tpu.runtime.eval_seg --config="$config" \
    save_folder "$exp_dir/result_eval" "$@" \
    2>&1 | tee "$exp_dir/eval-$(date +%Y%m%d_%H%M%S).log"
