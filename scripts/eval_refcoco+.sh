#!/usr/bin/env bash
# RefCOCO+ evaluation: val/testA/testB over gt and detected boxes
# (reference scripts/eval_refcoco+.sh). TXT_ROOT holds the released
# refcoco+_{val,testA,testB}.db dirs (download_re.sh).
#
#   scripts/eval_refcoco+.sh <train_dir> <txt_root> <img_db_gt> <img_db_det> [out]

set -e
TRAIN_DIR=$1
TXT_ROOT=$2
TXT_DB="$TXT_ROOT/refcoco+_val.db:$TXT_ROOT/refcoco+_testA.db:$TXT_ROOT/refcoco+_testB.db"
exec "$(dirname "$0")/eval_refcoco.sh" "$TRAIN_DIR" "$TXT_DB" "$3" "$4" "${5:-}"
