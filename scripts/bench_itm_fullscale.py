"""Full-scale retrieval eval, end to end through inf_itm.py (VERDICT r4 #4).

Builds a synthetic Flickr-scale corpus — 5,000 texts x 1,000 images with a
realistic nbb mix (reference eval scale: data/itm.py:454-465,
utils/itm_eval.py:93-110) — as REAL on-disk DBs (lmdbx txt/img stores),
then drives ``inf_itm.main`` (fast tiled scorer, bf16, production tiles)
exactly as a user would, recording wall-clock, delivered pairs/s, peak
device memory, and the R@K artifact shape. Random weights make the R@K
values themselves meaningless; what this proves is that the 5k x 1k
score-matrix path (host assembly, tile padding, memory) runs to completion
at reference scale.

Usage: python scripts/bench_itm_fullscale.py [--n_txt 5000 --n_img 1000]
(real TPU by default). Writes /tmp/itm_fullscale.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

IMG_DIM = 2048


def build_corpus(root: str, n_txt: int, n_img: int, seed: int = 0):
    from uniter_tpu.data import write_img_db, write_txt_db

    rng = np.random.RandomState(seed)
    img_names = [f"flickr30k_{i:06d}.npz" for i in range(n_img)]
    img_dir = os.path.join(root, "img")
    recs = {}
    t0 = time.time()
    for n in img_names:
        nbb = int(rng.randint(20, 37))  # realistic det-box mix
        recs[n] = dict(
            features=(rng.randn(nbb, IMG_DIM) * 0.5).astype(np.float16),
            norm_bb=rng.rand(nbb, 6).astype(np.float16),
            conf=np.linspace(1.0, 0.3, nbb).astype(np.float16),
            soft_labels=rng.rand(nbb, 4).astype(np.float16),  # unused here
        )
    write_img_db(img_dir, recs, conf_th=0.2, max_bb=36, min_bb=10)
    t_img = time.time() - t0

    meta = {"CLS": 101, "SEP": 102, "MASK": 103, "v_range": [104, 28000]}
    trecs, t2i = {}, {}
    t0 = time.time()
    for i in range(n_txt):
        tid = f"cap_{i}"
        img = img_names[i % n_img]  # 5 captions/image at 5k x 1k
        trecs[tid] = dict(
            input_ids=[int(x) for x in
                       rng.randint(110, 28000, rng.randint(8, 21))],
            img_fname=img)
        t2i[tid] = img
    txt_dir = os.path.join(root, "txt")
    write_txt_db(txt_dir, trecs, meta, t2i)
    return txt_dir, img_dir, dict(img_build_s=round(t_img, 1),
                                  txt_build_s=round(time.time() - t0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_txt", type=int, default=5000)
    ap.add_argument("--n_img", type=int, default=1000)
    ap.add_argument("--txt_tile", type=int, default=32)
    ap.add_argument("--img_tile", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny trunk for CPU plumbing smoke runs")
    ap.add_argument("--out", default="/tmp/itm_fullscale.json",
                    help="JSONL record sink (appended)")
    ap.add_argument("--keep", action="store_true")
    opts = ap.parse_args()

    root = tempfile.mkdtemp(prefix="itm_fullscale_")
    try:
        txt_dir, img_dir, build = build_corpus(root, opts.n_txt, opts.n_img)
        print(f"[fullscale] corpus built: {build}", flush=True)

        # a training dir is what real users point inf_itm at; fabricate one
        # with a random-weight export through the real save path
        import jax
        import jax.numpy as jnp

        from uniter_tpu.config import base_config, tiny_config
        from uniter_tpu.models.itm import UniterForImageTextRetrieval
        from uniter_tpu.utils.save import save_params_msgpack

        mk_cfg = tiny_config if opts.tiny else base_config
        cfg = mk_cfg(dtype=opts.dtype)
        model = UniterForImageTextRetrieval(cfg, img_dim=IMG_DIM)
        init_b = dict(
            input_ids=jnp.zeros((2, 16), jnp.int32),
            position_ids=jnp.zeros((2, 16), jnp.int32),
            img_feat=jnp.zeros((2, 8, IMG_DIM), jnp.float32),
            img_pos_feat=jnp.zeros((2, 8, 7), jnp.float32),
            attn_mask=jnp.ones((2, 24), jnp.int32))
        params = model.init({"params": jax.random.PRNGKey(0)}, init_b,
                            False)["params"]
        train_dir = os.path.join(root, "train")
        os.makedirs(os.path.join(train_dir, "log"))
        os.makedirs(os.path.join(train_dir, "ckpt"))
        with open(os.path.join(train_dir, "log", "hps.json"), "w") as f:
            json.dump(dict(conf_th=0.2, max_bb=36, min_bb=10, num_bb=36,
                           compressed_db=False, attention_impl="auto",
                           scan_unroll=12, block_fusion="auto",
                           attn_batch_block=2), f)
        # model.json mirrors what save_training_meta records for a real TPU
        # run: full UniterConfig incl. the resolved kernel policies
        meta_cfg = mk_cfg(attention_impl="auto", block_fusion="auto",
                          scan_unroll=2 if opts.tiny else 12,
                          attn_batch_block=2)
        with open(os.path.join(train_dir, "log", "model.json"), "w") as f:
            json.dump(meta_cfg.to_dict(), f)
        save_params_msgpack(
            os.path.join(train_dir, "ckpt", "model_step_1.msgpack"),
            jax.tree.map(np.asarray, params))

        import inf_itm

        out_dir = os.path.join(root, "inf")
        t0 = time.time()
        logs = inf_itm.main(inf_itm.get_parser().parse_args([
            "--txt_db", txt_dir, "--img_db", img_dir,
            "--train_dir", train_dir, "--output_dir", out_dir,
            "--txt_bucket", "32", "--img_bucket", "40",
            "--txt_tile", str(opts.txt_tile),
            "--img_tile", str(opts.img_tile),
            "--dtype", opts.dtype, "--batch_size", "400",
        ]))
        wall = time.time() - t0

        mat = np.load(os.path.join(out_dir, "score_matrix.npz"))
        shape = list(mat["score_matrix"].shape)
        assert shape == [opts.n_txt, opts.n_img], shape
        assert np.isfinite(mat["score_matrix"].astype(np.float32)).all()

        mem = {}
        try:
            stats = jax.devices()[0].memory_stats() or {}
            mem = {k: int(v) for k, v in stats.items()
                   if "peak" in k or "bytes_in_use" in k}
        except Exception:
            pass
        rec = dict(
            n_txt=opts.n_txt, n_img=opts.n_img,
            pairs=opts.n_txt * opts.n_img,
            wall_s=round(wall, 1),
            pairs_per_s=round(opts.n_txt * opts.n_img / wall, 1),
            txt_tile=opts.txt_tile, img_tile=opts.img_tile,
            dtype=opts.dtype, recalls=logs, peak_mem=mem, build=build,
            cls_path=os.environ.get("UNITER_ITM_CLS_PATH", "1"),
        )
        line = json.dumps(rec)
        print(line, flush=True)
        with open(opts.out, "a") as f:
            f.write(line + "\n")
    finally:
        if not opts.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
