#!/usr/bin/env bash
# Download in-domain pretraining txt/img DBs (reference scripts/download_indomain.sh URLs).
set -e
DOWNLOAD=${1:-/db}
BLOB='https://acvrpublicycchen.blob.core.windows.net/uniter'
mkdir -p "$DOWNLOAD/txt_db" "$DOWNLOAD/img_db"
# per-split .db tars (the blob hosts no combined pretrain_*.tar)
for DB in pretrain_coco_train pretrain_coco_restval pretrain_coco_val \
          pretrain_vg_train pretrain_vg_val; do
    wget -nc "$BLOB/txt_db/$DB.db.tar" -P "$DOWNLOAD/txt_db/"
    tar -xf "$DOWNLOAD/txt_db/$DB.db.tar" -C "$DOWNLOAD/txt_db/"
done
for IMG in coco_train2014 coco_val2014 vg; do
    wget -nc "$BLOB/img_db/$IMG.tar" -P "$DOWNLOAD/img_db/"
    tar -xf "$DOWNLOAD/img_db/$IMG.tar" -C "$DOWNLOAD/img_db/"
done
