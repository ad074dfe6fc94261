#!/usr/bin/env bash
# Download ve txt/img DBs (reference scripts/download_ve.sh URLs).
set -e
DOWNLOAD=${1:-/db}
BLOB='https://acvrpublicycchen.blob.core.windows.net/uniter'
mkdir -p "$DOWNLOAD/txt_db" "$DOWNLOAD/img_db"
for DB in ve_train ve_dev ve_test; do
    wget -nc "$BLOB/txt_db/$DB.db.tar" -P "$DOWNLOAD/txt_db/"
    tar -xf "$DOWNLOAD/txt_db/$DB.db.tar" -C "$DOWNLOAD/txt_db/"
done
for IMG in flickr30k; do
    wget -nc "$BLOB/img_db/$IMG.tar" -P "$DOWNLOAD/img_db/"
    tar -xf "$DOWNLOAD/img_db/$IMG.tar" -C "$DOWNLOAD/img_db/"
done
