"""Image-text retrieval inference (reference inf_itm.py): computes the full
|txt| x |img| score matrix (fp16 on disk) and R@1/5/10 both directions.
Zero-shot evaluation from a pretrained checkpoint seeds rank_output from the
ITM head (inf_itm.py:60-61)."""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.img_db import DetectFeatDb
from uniter_tpu.data.itm import ItmEvalDataset
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.models.itm import UniterForImageTextRetrieval
from uniter_tpu.training import infer
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.itm_eval import inference_score_matrix, itm_eval
from uniter_tpu.utils.logger import LOGGER


def main(opts):
    if opts.train_dir:
        hps, model_json = infer.load_train_meta(opts.train_dir)
    else:
        # zero-shot: no training run exists — model architecture comes
        # from --model_config and db thresholds from the CLI (the
        # reference's --model_config/--train_config path, inf_itm.py:41-59)
        if not (opts.model_config and opts.ckpt):
            raise SystemExit(
                "zero-shot inference (no --train_dir) needs "
                "--model_config and --ckpt")
        with open(opts.model_config) as f:
            model_json = json.load(f)
        hps = argparse.Namespace(
            conf_th=opts.conf_th, max_bb=opts.max_bb, min_bb=opts.min_bb,
            num_bb=opts.num_bb, compressed_db=opts.compressed_db)
    cfg = infer.model_config_from_meta(
        model_json, dtype=opts.dtype,
        attention_impl=getattr(hps, "attention_impl", "xla"))
    model = UniterForImageTextRetrieval(cfg, img_dim=IMG_DIM)

    txt_db = TxtTokDb(opts.txt_db, max_txt_len=-1)
    img_db = DetectFeatDb(opts.img_db, conf_th=hps.conf_th,
                          max_bb=hps.max_bb, min_bb=hps.min_bb,
                          num_bb=hps.num_bb,
                          compress=bool(getattr(hps, "compressed_db",
                                                False)))
    ds = ItmEvalDataset(txt_db, img_db, mini_batch_size=opts.batch_size)

    b0 = ds.get_batches(0, opts.txt_bucket, opts.img_bucket)[0]
    jb0 = {k: jnp.asarray(v) for k, v in b0.items()
           if isinstance(v, np.ndarray)}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb0, False)[
        "params"]
    if opts.ckpt and opts.ckpt.endswith(".pt"):
        # zero-shot: pretrained checkpoint + rank head seeded from the ITM
        # head's match row (reference inf_itm.py:60-61) — one normalized
        # load (state_dict unwrap, fp16->fp32) shared with train_itm
        from types import SimpleNamespace

        from uniter_tpu.models.itm import seed_rank_head
        from uniter_tpu.training import driver

        params = driver.load_trunk_checkpoint(
            params, SimpleNamespace(checkpoint=opts.ckpt), cfg,
            extra_map=seed_rank_head)
    else:
        params = infer.load_params(
            infer.resolve_ckpt(opts.train_dir, opts.ckpt), params)

    from uniter_tpu.parallel.collectives import all_gather_list
    from uniter_tpu.training.driver import shard_kw

    # tile over THIS process's chips only — texts are already sharded
    # across processes (local_eval_mesh rationale). Params commit to the
    # mesh ONCE: the loaded tree is host numpy and would otherwise
    # re-upload per tile/minibatch call (the 5k x 1k eval staged 130GB of
    # param re-transfers and OOM'd the host before this fix).
    mesh = infer.local_eval_mesh()
    params = infer.local_eval_params(params, mesh)

    if opts.eval_impl == "fast":
        from uniter_tpu.utils.itm_fast import fast_score_matrix

        mat, txt_ids = fast_score_matrix(
            model, params, ds, opts.txt_bucket, opts.img_bucket,
            txt_tile=opts.txt_tile, img_tile=opts.img_tile,
            dtype=cfg.dtype, mesh=mesh, **shard_kw())
    else:
        predict = jax.jit(lambda p, b: model.apply({"params": p}, b, False))
        mat, txt_ids = inference_score_matrix(
            predict, ds, params, opts.txt_bucket, opts.img_bucket,
            mesh=mesh, **shard_kw())
    parts = all_gather_list((mat, txt_ids))
    mat = np.concatenate([m for m, _ in parts if m.size])
    txt_ids = [t for _, ts in parts for t in ts]
    logs = itm_eval(mat, txt_ids, ds.all_img_ids, ds.txt2img, ds.img2txts)

    os.makedirs(opts.output_dir, exist_ok=True)
    np.savez(
        os.path.join(opts.output_dir, "score_matrix.npz"),
        score_matrix=mat.astype(np.float16),
        txt_ids=np.asarray(txt_ids), img_ids=np.asarray(ds.all_img_ids))
    with open(os.path.join(opts.output_dir, "results.json"), "w") as f:
        json.dump(logs, f, indent=2)
    LOGGER.info("retrieval results: %s", logs)
    return logs


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--txt_db", required=True)
    parser.add_argument("--img_db", required=True)
    parser.add_argument("--train_dir", default=None,
                        help="training output dir; omit for zero-shot "
                             "eval of a pretrained .pt (then pass "
                             "--model_config + --ckpt, reference "
                             "inf_itm.py:41-59)")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--model_config", default=None,
                        help="model json for zero-shot (no --train_dir)")
    parser.add_argument("--conf_th", type=float, default=0.2)
    parser.add_argument("--max_bb", type=int, default=100)
    parser.add_argument("--min_bb", type=int, default=10)
    parser.add_argument("--num_bb", type=int, default=36)
    parser.add_argument("--compressed_db", action="store_true")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=400)
    parser.add_argument("--txt_bucket", type=int, default=64)
    parser.add_argument("--img_bucket", type=int, default=64)
    parser.add_argument("--dtype", default="float32",
                        help="eval compute dtype; bfloat16 is ~40% faster "
                             "on TPU (the reference ran fp16 score "
                             "matrices, utils/itm_eval.py:99)")
    parser.add_argument("--eval_impl", default="fast",
                        choices=["fast", "batched"],
                        help="fast: device-resident tiled scoring; batched: "
                             "per-text minibatches (reference-style)")
    parser.add_argument("--txt_tile", type=int, default=32)
    parser.add_argument("--img_tile", type=int, default=128)
    return parser


if __name__ == "__main__":
    main(get_parser().parse_args())
