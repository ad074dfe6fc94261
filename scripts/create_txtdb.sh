#!/usr/bin/env bash
# One-command NLVR2 text-DB build (reference scripts/create_txtdb.sh:1-40,
# minus docker: this repo runs in-place). Downloads the official
# annotations when absent, then runs prepro.py per split.
#
#   scripts/create_txtdb.sh <out_txt_db_dir> <ann_dir> [toker]
#
# Offline use: place train.json/dev.json/test1.json (and optionally
# missing_nlvr2_imgs.json) in <ann_dir> beforehand; downloads are skipped
# for files that exist. ``toker`` defaults to bert-base-cased and may be a
# local vocab.txt.

set -e

OUT_DIR=${1:?usage: create_txtdb.sh OUT_DIR ANN_DIR [TOKER]}
ANN_DIR=${2:?usage: create_txtdb.sh OUT_DIR ANN_DIR [TOKER]}
TOKER=${3:-bert-base-cased}
cd "$(dirname "$0")/.."

mkdir -p "$OUT_DIR" "$ANN_DIR"

URL='https://raw.githubusercontent.com/lil-lab/nlvr/master/nlvr2/data'
BLOB='https://acvrpublicycchen.blob.core.windows.net/uniter'
# -s (not -f): a failed download must not leave an empty file that
# suppresses the retry on the next (online) run
if [ ! -s "$ANN_DIR/missing_nlvr2_imgs.json" ]; then
    if wget -q "$BLOB/ann/missing_nlvr2_imgs.json" \
            -O "$ANN_DIR/missing_nlvr2_imgs.json.tmp"; then
        mv "$ANN_DIR/missing_nlvr2_imgs.json.tmp" \
           "$ANN_DIR/missing_nlvr2_imgs.json"
    else
        rm -f "$ANN_DIR/missing_nlvr2_imgs.json.tmp"
        echo "warning: missing-imgs list unavailable; continuing without"
    fi
fi

MISSING=""
if [ -s "$ANN_DIR/missing_nlvr2_imgs.json" ]; then
    MISSING="--missing $ANN_DIR/missing_nlvr2_imgs.json"
fi

for SPLIT in train dev test1; do
    if [ ! -s "$ANN_DIR/$SPLIT.json" ]; then
        echo "downloading $SPLIT annotations..."
        wget -q "$URL/$SPLIT.json" -O "$ANN_DIR/$SPLIT.json.tmp"
        mv "$ANN_DIR/$SPLIT.json.tmp" "$ANN_DIR/$SPLIT.json"
    fi
    echo "preprocessing $SPLIT annotations..."
    python prepro.py --annotation "$ANN_DIR/$SPLIT.json" \
        $MISSING \
        --output "$OUT_DIR/nlvr2_${SPLIT}.db" --task nlvr \
        --split "$SPLIT" --toker "$TOKER"
done

echo "done"
