#!/usr/bin/env bash
# RefCOCO/+/g evaluation over gt and detected boxes
# (reference scripts/eval_refcoco*.sh): runs inf_re.py on both feature
# sets. gt and det features live in SEPARATE released DBs
# (re_coco_gt with visual_grounding_coco_gt_*.npz, re_coco_det with
# visual_grounding_det_coco_*.npz — download_re.sh), so each pass gets
# its own --img_db. TXT_DB may be a colon-separated split list
# (val:testA:testB) — every split is evaluated in one invocation; see
# eval_refcoco+.sh / eval_refcocog.sh for the per-dataset split lists.
set -e
TRAIN_DIR=$1
TXT_DB=$2
IMG_DB_GT=$3
IMG_DB_DET=$4
OUT=${5:-$TRAIN_DIR/results}
python inf_re.py --txt_db "$TXT_DB" --img_db "$IMG_DB_GT" \
    --train_dir "$TRAIN_DIR" --output_dir "$OUT" --use_gt_feat
python inf_re.py --txt_db "$TXT_DB" --img_db "$IMG_DB_DET" \
    --train_dir "$TRAIN_DIR" --output_dir "$OUT"
