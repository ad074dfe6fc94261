"""NLVR2 inference (reference inf_nlvr2.py): writes ``results.csv`` with
``identifier,label`` rows compatible with the official eval script
(scripts/eval_nlvr2.py)."""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.buckets import spec_from_dataset
from uniter_tpu.data.img_db import DetectFeatDb
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.nlvr2 import Nlvr2PairedDataset, Nlvr2TripletDataset
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.models.nlvr2 import MODEL_REGISTRY
from uniter_tpu.training import infer
from uniter_tpu.training.loop import jnp_batch
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.logger import LOGGER


def main(opts):
    hps, model_json = infer.load_train_meta(opts.train_dir)
    cfg = infer.model_config_from_meta(
        model_json, type_vocab_size=3, dtype="float32",
        attention_impl=getattr(hps, "attention_impl", "xla"))
    model = MODEL_REGISTRY[hps.model](cfg, img_dim=IMG_DIM)

    txt_db = TxtTokDb(opts.txt_db, max_txt_len=-1)
    img_db = DetectFeatDb(opts.img_db, conf_th=hps.conf_th,
                          max_bb=hps.max_bb, min_bb=hps.min_bb,
                          num_bb=hps.num_bb,
                          compress=bool(getattr(hps, "compressed_db",
                                                False)))
    paired = hps.model in ("paired", "paired-attn")
    cls = Nlvr2PairedDataset if paired else Nlvr2TripletDataset
    ds = cls(txt_db, img_db, use_img_type=hps.use_img_type)
    from uniter_tpu.training.driver import shard_kw

    loader = BucketLoader(
        ds, spec_from_dataset(ds, opts.batch_size),
        shuffle=False, drop_last=False, **shard_kw())

    # init template then load trained weights
    batch0 = next(iter(loader))
    jb0 = {k: jnp.asarray(v) for k, v in jnp_batch(batch0).items()}
    params = model.init({"params": jax.random.PRNGKey(0)}, jb0, False)[
        "params"]
    params = infer.load_params(
        infer.resolve_ckpt(opts.train_dir, opts.ckpt), params)

    # each process's batches spread over its local chips (reference
    # inf_nlvr2.py runs every GPU; texts are already process-sharded)
    mesh = infer.local_eval_mesh()
    # commit the checkpoint-loaded (numpy) params to the mesh ONCE so the
    # per-batch jit doesn't re-upload the tree every call
    params = infer.local_eval_params(params, mesh)
    predict = jax.jit(lambda p, b: model.apply({"params": p}, b, False))
    results = []
    for batch in loader:
        # paired model reshapes rows into (example, 2) — keep pairs intact
        jb = infer.eval_put(jnp_batch(batch), mesh,
                            group=2 if paired else 1)
        scores = np.asarray(predict(params, jb))
        n = len(batch["qids"])
        preds = scores.argmax(-1)[:n]
        for qid, pred in zip(batch["qids"], preds):
            results.append((qid, "True" if pred == 1 else "False"))

    from uniter_tpu.parallel.collectives import all_gather_list, process_index

    results = [r for part in all_gather_list(results) for r in part]
    os.makedirs(opts.output_dir, exist_ok=True)
    out_csv = os.path.join(opts.output_dir, "results.csv")
    if process_index() == 0:
        with open(out_csv, "w") as f:
            for qid, label in results:
                f.write(f"{qid},{label}\n")
    LOGGER.info("wrote %d predictions to %s", len(results), out_csv)
    return out_csv


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--txt_db", required=True)
    parser.add_argument("--img_db", required=True)
    parser.add_argument("--train_dir", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--batch_size", type=int, default=10240)
    return parser


if __name__ == "__main__":
    main(get_parser().parse_args())
