#!/usr/bin/env bash
# One-command image-feature DB build (reference scripts/create_imgdb.sh:1-22,
# minus docker: runs scripts/convert_imgdir.py in place).
#
#   scripts/create_imgdb.sh <npz_dir> <out_img_db_dir> [convert_imgdir args...]
#
# Extra args pass straight through (--conf_th/--max_bb/--min_bb/--num_bb/
# --nproc/--compress).

set -e

IMG_NPY=${1:?usage: create_imgdb.sh IMG_NPZ_DIR OUT_DIR [args...]}
OUT_DIR=${2:?usage: create_imgdb.sh IMG_NPZ_DIR OUT_DIR [args...]}
shift 2
cd "$(dirname "$0")/.."

echo "converting image features..."
mkdir -p "$OUT_DIR"
python scripts/convert_imgdir.py --img_dir "$IMG_NPY" --output "$OUT_DIR" \
    "$@"

echo "done"
