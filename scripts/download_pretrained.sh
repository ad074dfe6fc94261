#!/usr/bin/env bash
# Download released UNITER checkpoints (reference scripts/download_pretrained.sh;
# same blob URLs — the converter at uniter_tpu/models/checkpoint.py loads the
# .pt files directly).
set -e
DOWNLOAD=${1:-/pretrain}
mkdir -p "$DOWNLOAD"
BLOB='https://acvrpublicycchen.blob.core.windows.net/uniter'
for MODEL in uniter-base uniter-large; do
    wget -nc "$BLOB/pretrained/$MODEL.pt" -P "$DOWNLOAD/"
done
