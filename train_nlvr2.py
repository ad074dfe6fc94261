"""NLVR2 fine-tuning driver (reference train_nlvr2.py CLI surface).

Usage: python train_nlvr2.py --config configs/train-nlvr2-base-1gpu.json
       [--output_dir ... --model paired-attn ...]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.nlvr2 import Nlvr2PairedDataset, Nlvr2TripletDataset
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.models import checkpoint as ckpt_lib
from uniter_tpu.models.nlvr2 import MODEL_REGISTRY
from uniter_tpu.training import driver
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.logger import LOGGER
from uniter_tpu.utils.misc import parse_with_config


def build_dataset(txt_path, img_path, opts, is_train):
    txt_db = TxtTokDb(txt_path, max_txt_len=opts.max_txt_len)
    # open_img_db resolves --compressed_db and the gt-DB conventions
    img_db = driver.open_img_db(img_path, opts)
    cls = (Nlvr2PairedDataset if opts.model in ("paired", "paired-attn")
           else Nlvr2TripletDataset)
    del is_train  # sharding lives in the train loader (global plan)
    return cls(txt_db, img_db, use_img_type=opts.use_img_type)


def build_model_and_params(opts, rng):
    model_cfg = driver.model_config_from_opts(opts, type_vocab_size=3)
    model = MODEL_REGISTRY[opts.model](model_cfg, img_dim=IMG_DIM)
    t, r = 16, 8
    b = 4 if opts.model == "triplet" else 8
    init_batch = dict(
        input_ids=jnp.zeros((b, t), jnp.int32),
        position_ids=jnp.zeros((b, t), jnp.int32),
        img_feat=jnp.zeros((b, r, IMG_DIM), jnp.float32),
        img_pos_feat=jnp.zeros((b, r, 7), jnp.float32),
        attn_mask=jnp.ones((b, t + r), jnp.int32),
        img_type_ids=jnp.ones((b, r), jnp.int32),
        targets=jnp.zeros((b if opts.model == "triplet" else b // 2,),
                          jnp.int32),
    )
    params = model.init({"params": rng}, init_batch, False)["params"]
    if opts.checkpoint:
        sd = ckpt_lib.load_torch_checkpoint(opts.checkpoint)
        flat, missing, _ = ckpt_lib.uniter_params_from_state_dict(
            sd, model_cfg.num_hidden_layers)
        # token-type table is widened to 3 rows: load rows 0/1, copy row 1
        # into row 2 (reference model/nlvr2.py:26-34)
        tt = flat.pop("embeddings/token_type_embeddings/embedding", None)
        params, filled = ckpt_lib.merge_into_params(
            dict(params), flat, prefix="uniter")
        if tt is not None:
            node = params["uniter"]["embeddings"]["token_type_embeddings"]
            new = np.asarray(node["embedding"]).copy()
            new[:2] = tt[:2]
            new[2] = tt[1]
            node["embedding"] = jnp.asarray(new)
        LOGGER.info("loaded %d tensors from %s", len(filled), opts.checkpoint)
    return model, model_cfg, params


def validate(model, params, loader, paired: bool):
    """Batches shard over the local chips; params are made process-local
    once (infer.eval_batches); outputs trim to the targets length (the
    paired model emits one score row per PAIR)."""
    from uniter_tpu.training.infer import cached_predict, eval_batches

    n_correct, n_ex, loss_sum = 0, 0, 0.0
    predict = cached_predict(model)
    for batch, out in eval_batches(predict, params, loader,
                                   group=2 if paired else 1):
        targets = np.asarray(batch["targets"])
        scores = np.asarray(out)[:len(targets)]
        w = np.asarray(batch["ex_weight"])
        if paired:
            w = w[: len(targets)]
        # target=-1 marks unlabeled rows (leaderboard splits): exclude
        # them from accuracy rather than scoring them as wrong
        valid = (w > 0) & (targets >= 0)
        preds = scores.argmax(-1)
        n_correct += int((preds[valid] == targets[valid]).sum())
        n_ex += int(valid.sum())
    from uniter_tpu.parallel.collectives import all_gather_list

    n_correct = sum(all_gather_list(n_correct))
    n_ex = sum(all_gather_list(n_ex))
    return {"acc": n_correct / max(n_ex, 1), "n_ex": n_ex}


def main(opts):
    model, model_cfg, params = build_model_and_params(
        opts, jax.random.PRNGKey(opts.seed))
    mesh = driver.setup_run(opts, model_cfg)

    train_ds = build_dataset(opts.train_txt_db, opts.train_img_db, opts, True)
    # dataset-derived buckets: the triplet model concatenates both images
    # in one row (up to 2*max_bb regions) — a raw BucketSpec capped at 100
    # img rows would silently truncate the second image
    spec = driver.bucket_spec(opts, mesh, train_ds)
    train_loader = BucketLoader(train_ds, spec, seed=opts.seed, loop=True,
                                **driver.shard_kw(),
                               num_workers=opts.n_workers,
                               worker_type=getattr(opts, "worker_type", None))
    val_ds = build_dataset(opts.val_txt_db, opts.val_img_db, opts, False)
    val_loader = BucketLoader(
        val_ds, driver.bucket_spec(opts, mesh, val_ds,
                                   budget=opts.val_batch_size),
        shuffle=False, drop_last=False, **driver.shard_kw())
    test_loader = None
    if opts.test_txt_db and opts.test_img_db:
        test_ds = build_dataset(opts.test_txt_db, opts.test_img_db, opts,
                                False)
        test_loader = BucketLoader(
            test_ds, driver.bucket_spec(opts, mesh, test_ds,
                                        budget=opts.val_batch_size),
            shuffle=False, drop_last=False, **driver.shard_kw())

    paired = opts.model in ("paired", "paired-attn")

    def loss_fn(p, batch, rng):
        per_ex = model.apply(
            {"params": p}, batch, True, deterministic=False,
            rngs={"dropout": rng})
        w = batch.get("ex_weight")
        if w is not None:
            w = w[: per_ex.shape[0]]
            loss = jnp.sum(per_ex * w) / jnp.maximum(jnp.sum(w), 1.0)
        else:
            loss = jnp.mean(per_ex)
        return loss, {}

    def validate_fn(state, step):
        # reference validates both splits each valid_steps
        # (train_nlvr2.py:207-219)
        logs = validate(model, state.params, val_loader, paired)
        LOGGER.info("step %d: val acc %.4f", step, logs["acc"])
        if test_loader is not None:
            tlogs = validate(model, state.params, test_loader, paired)
            LOGGER.info("step %d: test acc %.4f", step, tlogs["acc"])
            logs.update({f"test_{k}": v for k, v in tlogs.items()})
        return logs

    return driver.run_training(
        opts, model=model, params=params, loss_fn=loss_fn,
        train_loader=train_loader, mesh=mesh, validate_fn=validate_fn)


def get_parser():
    parser = argparse.ArgumentParser()
    driver.add_common_args(parser)
    parser.add_argument("--train_txt_db", type=str)
    parser.add_argument("--train_img_db", type=str)
    parser.add_argument("--val_txt_db", type=str)
    parser.add_argument("--val_img_db", type=str)
    parser.add_argument("--test_txt_db", type=str)
    parser.add_argument("--test_img_db", type=str)
    parser.add_argument("--model", default="paired-attn",
                        choices=list(MODEL_REGISTRY))
    parser.add_argument("--use_img_type", type=int, default=1)
    # reference recipe defaults (config/train-nlvr2-base-1gpu.json)
    parser.set_defaults(train_batch_size=10240, val_batch_size=10240,
                        learning_rate=3e-5, valid_steps=500,
                        num_train_steps=8000, warmup_steps=800, seed=77)
    return parser


if __name__ == "__main__":
    main(parse_with_config(get_parser()))
