#!/bin/sh
# usage: sh run/resume_distill.sh EXP_DIR CONFIG [key value]...
set -e
exp_dir=$1; config=$2; shift 2
python -u -m openscene_tpu.runtime.distill --config="$config" \
    save_path "$exp_dir" resume "$exp_dir/model/model_last.ckpt" "$@" \
    2>&1 | tee "$exp_dir/resume-$(date +%Y%m%d_%H%M%S).log"
