#!/usr/bin/env bash
# BUTD region-feature extraction entry point (reference
# scripts/extract_imgfeat.sh:1-18).
#
# The reference delegates to the chenrocks/butd-caffe docker image (a
# Caffe bottom-up-top-down Faster R-CNN) to turn raw images into per-image
# npz dumps {features [nbb, 2048] fp16, norm_bb [nbb, 6], conf [nbb],
# soft_labels [nbb, 1601]}. That extractor is GPU/Caffe-specific and is NOT
# re-owned by this TPU rebuild: every released UNITER dataset ships the
# extracted npz/LMDB features, and any BUTD-compatible extractor (e.g.
# airsplay/py-bottom-up-attention) produces the same npz contract.
#
#   scripts/extract_imgfeat.sh <raw_img_dir> <out_npz_dir>
#
# runs the docker extractor when available, then feed <out_npz_dir> to
# scripts/create_imgdb.sh.

set -e

IMG_DIR=${1:?usage: extract_imgfeat.sh RAW_IMG_DIR OUT_NPZ_DIR}
OUT_DIR=${2:?usage: extract_imgfeat.sh RAW_IMG_DIR OUT_NPZ_DIR}

if ! command -v docker >/dev/null; then
    cat >&2 <<'EOF'
docker not found. Feature extraction needs the BUTD detector image
(chenrocks/butd-caffe); on a machine with docker + GPU run this script
there, or use any BUTD npz-compatible extractor and skip straight to
scripts/create_imgdb.sh.
EOF
    exit 1
fi

echo "extracting image features..."
mkdir -p "$OUT_DIR"
docker run --gpus "\"device=${CUDA_VISIBLE_DEVICES:-0}\"" --ipc=host --rm \
    --mount src="$IMG_DIR",dst=/img,type=bind,readonly \
    --mount src="$OUT_DIR",dst=/output,type=bind \
    -w /src chenrocks/butd-caffe:nlvr2 \
    bash -c "python tools/generate_npz.py --gpu 0"

echo "done"
