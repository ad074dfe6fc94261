"""Host data-pipeline worker-scaling bench (VERDICT r3 #4).

Measures delivered BucketLoader throughput (records decoded from the
native lmdbx stores -> collated batches, host-side only) at
n_workers in {0,1,2,4,8} on REALISTIC record shapes (2048-d fp16 region
features, 36-100 boxes, VQA-style text records). The decode path is the
production one: lmdbx read (ctypes, GIL released in C) -> lz4f frame
decode (ctypes) / fp16 npz -> msgpack -> numpy collate.

Context: one v5e chip trains the NLVR2-class step at ~1934 ex/s
(BENCH_r03), so an 8-chip host must deliver ~15.5k ex/s; the r3 claim
that "--n_workers threads scale it" was unmeasured (docs/PERF.md r3).

Usage: python scripts/bench_loader_workers.py   (host-only; no TPU use)
Appends JSON lines to /tmp/bench_loader_workers.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = os.environ.get("UNITER_LOADER_BENCH_DIR",
                           "/tmp/uniter_loader_bench_dbs")
N_IMG, N_TXT = 600, 4000
IMG_DIM, LABEL_DIM = 2048, 1601
META = {"CLS": 101, "SEP": 102, "MASK": 103, "v_range": [104, 28000]}
WORKERS = [(0, "thread"), (1, "thread"), (2, "thread"), (4, "thread"),
           (8, "thread"), (2, "process"), (4, "process"),
           (2, "shm"), (4, "shm")]
N_BATCHES = int(os.environ.get("UNITER_LOADER_BENCH_BATCHES", "80"))


def build_dbs():
    from uniter_tpu.data import write_img_db, write_txt_db

    if os.path.exists(os.path.join(CACHE_DIR, ".done_v2")):
        return (os.path.join(CACHE_DIR, "img"),
                os.path.join(CACHE_DIR, "txt"))
    rng = np.random.RandomState(0)
    img_names = [f"coco_{i:06d}.npz" for i in range(N_IMG)]
    img_records = {}
    for name in img_names:
        nbb = rng.randint(36, 101)
        img_records[name] = dict(
            features=rng.randn(nbb, IMG_DIM).astype(np.float16),
            norm_bb=rng.rand(nbb, 6).astype(np.float16),
            conf=np.linspace(1, 0.05, nbb).astype(np.float16),
            soft_labels=rng.rand(nbb, LABEL_DIM).astype(np.float16),
        )
    img_dir = os.path.join(CACHE_DIR, "img")
    write_img_db(img_dir, img_records, conf_th=0.2, max_bb=100, min_bb=10)
    txt_records, txt2img = {}, {}
    for i in range(N_TXT):
        tid = f"txt_{i}"
        L = rng.randint(6, 24)
        txt_records[tid] = dict(
            input_ids=[int(x) for x in rng.randint(110, 28000, L)],
            img_fname=img_names[i % N_IMG],
            target={"labels": [int(rng.randint(0, 3129))], "scores": [1.0]},
        )
        txt2img[tid] = txt_records[tid]["img_fname"]
    txt_dir = os.path.join(CACHE_DIR, "txt")
    write_txt_db(txt_dir, txt_records, META, txt2img, store="lmdb")
    with open(os.path.join(CACHE_DIR, ".done_v2"), "w") as f:
        f.write("ok")
    return img_dir, txt_dir


def run_one(img_dir, txt_dir, n_workers, worker_type="thread"):
    from uniter_tpu.data import DetectFeatDb, TxtTokDb
    from uniter_tpu.data.buckets import BucketSpec
    from uniter_tpu.data.loader import BucketLoader
    from uniter_tpu.data.vqa import VqaDataset

    txt_db = TxtTokDb(txt_dir, max_txt_len=60)
    img_db = DetectFeatDb(img_dir, conf_th=0.2, max_bb=100, min_bb=10,
                          num_bb=36)
    ds = VqaDataset(3129, txt_db, img_db)
    spec = BucketSpec(txt_buckets=(32, 64), img_buckets=(40, 64, 100),
                      token_budget=10240, size_mul=8)
    loader = BucketLoader(ds, spec, seed=7, loop=True,
                          num_workers=n_workers, worker_type=worker_type)
    try:
        it = iter(loader)
        # warm: touch stores, fill caches
        for _ in range(4):
            next(it)
        n_ex = 0
        t0 = time.perf_counter()
        for _ in range(N_BATCHES):
            b = next(it)
            n_ex += int(b["input_ids"].shape[0])
        dt = time.perf_counter() - t0
        return n_ex / dt
    finally:
        loader.close()


def main():
    img_dir, txt_dir = build_dbs()
    out = "/tmp/bench_loader_workers.jsonl"
    base = None
    for w, wt in WORKERS:
        t0 = time.time()
        ex_s = run_one(img_dir, txt_dir, w, wt)
        if base is None and w == 0:
            base = ex_s
        rec = dict(n_workers=w, worker_type=wt, ex_per_s=round(ex_s, 1),
                   speedup_vs_serial=round(ex_s / base, 2) if base else None,
                   wall_s=round(time.time() - t0, 1))
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
