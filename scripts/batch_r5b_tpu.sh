#!/bin/bash
# Round-5 part-2 TPU experiment batch (run on a quiet host — bench lines
# move with CPU contention, docs/PERF.md r5). Each experiment appends
# JSON to its own /tmp jsonl; this driver serializes them so the relay
# compile service sees one stream.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_bench_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

echo "=== 1/3 pretrain-mix (k, attn_bb) sweep ==="
timeout 3600 python scripts/sweep_pretrain_mix.py

echo "=== 2/3 retrieval tile probe (post-CLS-path shapes) ==="
UNITER_BENCH_TILES=16x256,32x192,48x128,32x256 \
  timeout 3600 python scripts/bench_itm_tiles.py

echo "=== 3/3 flagship k=96 probe ==="
UNITER_BENCH_EXTRA=0 UNITER_BENCH_STEPS_PER_CALL=96 \
  timeout 1800 python bench.py

echo "=== batch done ==="
