#!/bin/sh
# usage: sh run/distill.sh EXP_DIR CONFIG [key value]...
# (reference run/distill.sh semantics: experiment dir + teed timestamped log)
set -e
exp_dir=$1; config=$2; shift 2
mkdir -p "$exp_dir"
python -u -m openscene_tpu.runtime.distill --config="$config" \
    save_path "$exp_dir" "$@" 2>&1 | tee "$exp_dir/distill-$(date +%Y%m%d_%H%M%S).log"
