#!/usr/bin/env bash
# Download vcr txt/img DBs (reference scripts/download_vcr.sh URLs).
set -e
DOWNLOAD=${1:-/db}
BLOB='https://acvrpublicycchen.blob.core.windows.net/uniter'
mkdir -p "$DOWNLOAD/txt_db" "$DOWNLOAD/img_db"
for DB in vcr_train vcr_val vcr_test; do
    wget -nc "$BLOB/txt_db/$DB.db.tar" -P "$DOWNLOAD/txt_db/"
    tar -xf "$DOWNLOAD/txt_db/$DB.db.tar" -C "$DOWNLOAD/txt_db/"
done
for IMG in vcr_gt_train vcr_train vcr_gt_val vcr_val vcr_gt_test vcr_test; do
    wget -nc "$BLOB/img_db/$IMG.tar" -P "$DOWNLOAD/img_db/"
    tar -xf "$DOWNLOAD/img_db/$IMG.tar" -C "$DOWNLOAD/img_db/"
done
