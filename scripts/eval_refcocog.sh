#!/usr/bin/env bash
# RefCOCOg evaluation: val/test over gt and detected boxes
# (reference scripts/eval_refcocog.sh). TXT_ROOT holds the released
# refcocog_{val,test}.db dirs (download_re.sh).
#
#   scripts/eval_refcocog.sh <train_dir> <txt_root> <img_db_gt> <img_db_det> [out]

set -e
TRAIN_DIR=$1
TXT_ROOT=$2
TXT_DB="$TXT_ROOT/refcocog_val.db:$TXT_ROOT/refcocog_test.db"
exec "$(dirname "$0")/eval_refcoco.sh" "$TRAIN_DIR" "$TXT_DB" "$3" "$4" "${5:-}"
