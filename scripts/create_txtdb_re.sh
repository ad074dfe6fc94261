#!/usr/bin/env bash
# One-command referring-expressions text-DB build (reference
# scripts/create_txtdb_re.sh:1-40, minus docker). Expects the MAttNet-style
# annotation layout:
#
#   <ann_dir>/refcoco/refs(unc).p      + instances.json
#   <ann_dir>/refcoco+/refs(unc).p     + instances.json
#   <ann_dir>/refcocog/refs(umd).p     + instances.json
#   <ann_dir>/iid2bb_id/iid_to_ann_ids.json
#
#   scripts/create_txtdb_re.sh <out_txt_db_dir> <ann_dir> [toker]

set -e

OUT_DIR=${1:?usage: create_txtdb_re.sh OUT_DIR ANN_DIR [TOKER]}
ANN_DIR=${2:?usage: create_txtdb_re.sh OUT_DIR ANN_DIR [TOKER]}
TOKER=${3:-bert-base-cased}
cd "$(dirname "$0")/.."

if [ ! -f "$ANN_DIR/iid2bb_id/iid_to_ann_ids.json" ]; then
    echo "pre-compute iid_to_ann_ids.json for all RE datasets following" \
         "https://github.com/lichengunc/MAttNet/blob/butd_feats/tools/map_iid_to_ann_ids.py"
    exit 1
fi

build() { # DATA REFS SPLITS...
    DATA=$1; REFS=$2; shift 2
    for SPLIT in "$@"; do
        echo "preprocessing $DATA $SPLIT annotations..."
        python prepro.py --task re \
            --annotation "$ANN_DIR/$DATA/$REFS" \
            --instances "$ANN_DIR/$DATA/instances.json" \
            --iid_to_ann_ids "$ANN_DIR/iid2bb_id/iid_to_ann_ids.json" \
            --split "$SPLIT" --toker "$TOKER" \
            --output "$OUT_DIR/${DATA}_${SPLIT}.db"
    done
}

build refcoco  'refs(unc).p' train val testA testB
build refcoco+ 'refs(unc).p' train val testA testB
build refcocog 'refs(umd).p' train val test

echo "done"
