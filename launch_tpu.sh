#!/usr/bin/env bash
# TPU-VM launch wrapper (the reference's launch_container.sh role without
# docker: the TPU VM image already carries jax/libtpu). Mount points mirror
# the reference volumes: TXT_DB, IMG_DB, STORAGE (outputs), PRETRAIN (ckpts).
#
# Usage: TXT_DB=/data/txt IMG_DB=/data/img STORAGE=/data/out \
#        ./launch_tpu.sh python train_nlvr2.py --config configs/...
set -e
export TXT_DB=${TXT_DB:-/txt}
export IMG_DB=${IMG_DB:-/img}
export STORAGE=${STORAGE:-/storage}
export PRETRAIN=${PRETRAIN:-/pretrain}
# persistent XLA compile cache across runs
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$STORAGE/.jax_cache}
# multi-host: every host runs the same command; jax.distributed initializes
# from the TPU environment automatically.
exec "$@"
