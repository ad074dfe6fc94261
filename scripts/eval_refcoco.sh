#!/usr/bin/env bash
# RefCOCO/+/g evaluation over gt and detected boxes
# (reference scripts/eval_refcoco*.sh): runs inf_re.py on both feature sets.
set -e
TRAIN_DIR=$1
TXT_DB=$2
IMG_DB=$3
OUT=${4:-$TRAIN_DIR/results}
python inf_re.py --txt_db "$TXT_DB" --img_db "$IMG_DB" \
    --train_dir "$TRAIN_DIR" --output_dir "$OUT" --use_gt_feat
python inf_re.py --txt_db "$TXT_DB" --img_db "$IMG_DB" \
    --train_dir "$TRAIN_DIR" --output_dir "$OUT"
