#!/usr/bin/env bash
# Download re txt/img DBs (reference scripts/download_re.sh URLs).
set -e
DOWNLOAD=${1:-/db}
BLOB='https://acvrpublicycchen.blob.core.windows.net/uniter'
mkdir -p "$DOWNLOAD/txt_db" "$DOWNLOAD/img_db"
# the blob hosts one bundle with every refcoco/refcoco+/refcocog split
wget -nc "$BLOB/txt_db/re_txt_db.tar" -P "$DOWNLOAD/txt_db/"
tar -xf "$DOWNLOAD/txt_db/re_txt_db.tar" -C "$DOWNLOAD/txt_db/"
for IMG in re_coco_gt re_coco_det; do
    wget -nc "$BLOB/img_db/$IMG.tar" -P "$DOWNLOAD/img_db/"
    tar -xf "$DOWNLOAD/img_db/$IMG.tar" -C "$DOWNLOAD/img_db/"
done
