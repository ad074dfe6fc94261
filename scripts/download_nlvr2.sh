#!/usr/bin/env bash
# Download nlvr2 txt/img DBs (reference scripts/download_nlvr2.sh URLs).
set -e
DOWNLOAD=${1:-/db}
BLOB='https://acvrpublicycchen.blob.core.windows.net/uniter'
mkdir -p "$DOWNLOAD/txt_db" "$DOWNLOAD/img_db"
for DB in nlvr2_train nlvr2_dev nlvr2_test1; do
    wget -nc "$BLOB/txt_db/$DB.db.tar" -P "$DOWNLOAD/txt_db/"
    tar -xf "$DOWNLOAD/txt_db/$DB.db.tar" -C "$DOWNLOAD/txt_db/"
done
for IMG in nlvr2_train nlvr2_dev nlvr2_test; do
    wget -nc "$BLOB/img_db/$IMG.tar" -P "$DOWNLOAD/img_db/"
    tar -xf "$DOWNLOAD/img_db/$IMG.tar" -C "$DOWNLOAD/img_db/"
done
