#!/bin/sh
# usage: sh run/eval.sh EXP_DIR CONFIG feature_type(fusion|distill|ensemble) [key value]...
set -e
exp_dir=$1; config=$2; ftype=$3; shift 3
mkdir -p "$exp_dir"
python -u -m openscene_tpu.runtime.evaluate --config="$config" \
    save_folder "$exp_dir/result_eval" feature_type "$ftype" "$@" \
    2>&1 | tee "$exp_dir/eval-$(date +%Y%m%d_%H%M%S).log"
