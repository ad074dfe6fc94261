"""Retrieval fast-path tile sweep on the real TPU (r3): pairs/s/chip for
uniter-base bf16 scoring at several (txt_tile, img_tile) shapes, synthetic
Flickr-sized arrays (n_txt=512, n_img=512, T=64, R=40).

Usage: python scripts/bench_itm_tiles.py   (real TPU, no env overrides)
Appends JSON lines to /tmp/bench_itm_tiles.jsonl.
"""

import json
import os
import sys
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

N_TXT, N_IMG, T, R, D = 512, 512, 64, 40, 2048
TILES = [(32, 64), (32, 128), (64, 64), (16, 256), (64, 128)]
if os.environ.get("UNITER_BENCH_TILES"):  # e.g. "32x128,64x64"
    TILES = [tuple(int(v) for v in t.split("x"))
             for t in os.environ["UNITER_BENCH_TILES"].split(",")]


def main():
    import jax

    from uniter_tpu.config import base_config
    from uniter_tpu.models.itm import UniterForImageTextRetrieval
    from uniter_tpu.utils.itm_fast import fast_score_matrix

    rng = np.random.RandomState(0)
    toks = [rng.randint(5, 28000, rng.randint(8, T - 2)) for _ in range(N_TXT)]
    feats = {f"i{j}": (rng.randn(R, D).astype(np.float32),
                       rng.rand(R, 7).astype(np.float32), R)
             for j in range(N_IMG)}
    ds = SimpleNamespace(
        ids=[f"t{i}" for i in range(N_TXT)],
        all_img_ids=list(feats),
        txt_db=SimpleNamespace(combine_inputs=lambda ids: np.concatenate(
            [[101], np.asarray(ids, np.int32), [102]])),
        img_db=SimpleNamespace(get_img_feat=lambda name: feats[name]),
        example=lambda i: {"input_ids": toks[i]},
    )
    cfg = base_config(dtype="bfloat16", attention_impl="pallas",
                      scan_unroll=12, block_fusion="pallas",
                      attn_batch_block=int(os.environ.get(
                          "UNITER_BENCH_ATTN_BB", "2")))
    model = UniterForImageTextRetrieval(cfg, img_dim=D)
    import jax.numpy as jnp

    init_batch = dict(
        input_ids=jnp.zeros((8, T), jnp.int32),
        position_ids=jnp.zeros((8, T), jnp.int32),
        img_feat=jnp.zeros((8, R, D), jnp.float32),
        img_pos_feat=jnp.zeros((8, R, 7), jnp.float32),
        attn_mask=jnp.ones((8, T + R), jnp.int32),
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                        False)["params"]

    for tt, it in TILES:
        t0 = time.time()
        try:
            # warm (compile) on a shard subset: full run is the timed one
            fast_score_matrix(model, params, ds, T, R, txt_tile=tt,
                              img_tile=it, dtype="bfloat16",
                              shard_index=0, shard_count=8)
            t1 = time.perf_counter()
            mat, _ = fast_score_matrix(model, params, ds, T, R, txt_tile=tt,
                                       img_tile=it, dtype="bfloat16")
            dt = time.perf_counter() - t1
            rec = dict(txt_tile=tt, img_tile=it,
                       pairs_per_s=round(N_TXT * N_IMG / dt),
                       wall_s=round(time.time() - t0, 1),
                       cls_path=os.environ.get("UNITER_ITM_CLS_PATH", "1"),
                       attn_bb=os.environ.get("UNITER_ITM_ATTN_BB", ""))
            assert np.isfinite(mat).all()
        except Exception as e:
            rec = dict(txt_tile=tt, img_tile=it, error=repr(e)[:300],
                       wall_s=round(time.time() - t0, 1))
        line = json.dumps(rec)
        print(line, flush=True)
        with open("/tmp/bench_itm_tiles.jsonl", "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
