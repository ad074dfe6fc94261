#!/usr/bin/env bash
# Download itm txt/img DBs (reference scripts/download_itm.sh URLs).
set -e
DOWNLOAD=${1:-/db}
BLOB='https://acvrpublicycchen.blob.core.windows.net/uniter'
mkdir -p "$DOWNLOAD/txt_db" "$DOWNLOAD/img_db"
for DB in itm_coco_train itm_coco_restval itm_coco_val itm_coco_test itm_flickr30k_train itm_flickr30k_val itm_flickr30k_test; do
    wget -nc "$BLOB/txt_db/$DB.db.tar" -P "$DOWNLOAD/txt_db/"
    tar -xf "$DOWNLOAD/txt_db/$DB.db.tar" -C "$DOWNLOAD/txt_db/"
done
for IMG in coco_train2014 coco_val2014 flickr30k; do
    wget -nc "$BLOB/img_db/$IMG.tar" -P "$DOWNLOAD/img_db/"
    tar -xf "$DOWNLOAD/img_db/$IMG.tar" -C "$DOWNLOAD/img_db/"
done
