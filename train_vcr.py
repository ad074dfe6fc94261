"""VCR fine-tuning driver (reference train_vcr.py).

qa + qar training doubles the dataset (train_vcr.py:140-149);
``--checkpoint_from pretrain`` applies the 4-row type-table + 81
special-word surgeries (train_vcr.py:167-197 / model/vcr.py:32-50);
``vcr_pretrain`` checkpoints load matched keys directly.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.datasets import ConcatDataset
from uniter_tpu.data.buckets import spec_from_dataset
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.vcr import VcrDataset, VcrEvalDataset, VcrTxtTokDb
from uniter_tpu.models.vcr import (
    NUM_SPECIAL_TOKENS, UniterForVisualCommonsenseReasoning,
)
from uniter_tpu.training import driver
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.logger import LOGGER
from uniter_tpu.utils.misc import parse_with_config


def build_model_and_params(opts, rng):
    cfg = driver.model_config_from_opts(
        opts, type_vocab_size=4)
    cfg = cfg.replace(vocab_size=cfg.vocab_size + NUM_SPECIAL_TOKENS)
    model = UniterForVisualCommonsenseReasoning(cfg, img_dim=IMG_DIM)
    init_batch = driver.make_init_batch(
        txt_type_ids=jnp.zeros((8, 16), jnp.int32),
        targets=jnp.zeros((8,), jnp.int32))
    params = model.init({"params": rng}, init_batch, False)["params"]
    # surgeries: type rows 2,3 <- row 0 (model/vcr.py:32-41); +81 word rows
    params = driver.load_trunk_checkpoint(
        params, opts, cfg, n_type_rows=4, type_copy_row=0,
        n_special_words=NUM_SPECIAL_TOKENS)
    return model, cfg, params


def build_train_datasets(opts):
    img_db = driver.open_img_db(opts.train_img_db, opts)
    img_db_gt = driver.open_img_db(opts.train_img_db_gt, opts, gt=True)
    datasets = []
    for task in opts.tasks.split(","):
        txt_db = VcrTxtTokDb(opts.train_txt_db,
                             max_txt_len=opts.max_txt_len, task=task)
        datasets.append(VcrDataset(txt_db, img_db_gt=img_db_gt,
                                   img_db=img_db))
    ds = datasets[0] if len(datasets) == 1 else ConcatDataset(datasets)
    if len(datasets) > 1:
        ds.rows_per_example = 4
    return ds


def validate(model, params, loader):
    """qa / qar / joint accuracy (reference inf_vcr / train_vcr validate).
    Batches shard over the local chips; params made process-local once
    (infer.eval_batches); the n_rows offsets only walk host rows, so
    padded output rows are never read."""
    from uniter_tpu.training.infer import cached_predict, eval_batches

    predict = cached_predict(model)
    n_qa, n_qar, n_ex = 0, 0, 0
    for batch, out in eval_batches(predict, params, loader):
        scores = np.asarray(out)[:, 0]
        off = 0
        for i, n_rows in enumerate(batch["n_rows"]):
            qa_scores = scores[off:off + 4]
            qar_scores = scores[off + 4:off + n_rows]
            qa_pred = int(qa_scores.argmax())
            qa_t = int(batch["qa_targets"][i])
            qar_t = int(batch["qar_targets"][i])
            qa_ok = qa_pred == qa_t
            qar_ok = (len(qar_scores) > 0
                      and int(qar_scores.argmax()) == qar_t)
            n_qa += int(qa_ok)
            n_qar += int(qa_ok and qar_ok)
            n_ex += 1
            off += n_rows
    from uniter_tpu.parallel.collectives import all_gather_list

    n_qa = sum(all_gather_list(n_qa))
    n_qar = sum(all_gather_list(n_qar))
    n_ex = sum(all_gather_list(n_ex))
    return {"qa_acc": n_qa / max(n_ex, 1),
            "qar_joint_acc": n_qar / max(n_ex, 1), "n_ex": n_ex}


def main(opts):
    cfg = driver.model_config_from_opts(opts, type_vocab_size=4)
    mesh = driver.setup_run(opts, cfg)
    model, cfg, params = build_model_and_params(
        opts, jax.random.PRNGKey(opts.seed))

    train_ds = build_train_datasets(opts)
    spec = driver.bucket_spec(opts, mesh, train_ds)
    train_loader = BucketLoader(
        train_ds, spec, seed=opts.seed, loop=True,
        collate=VcrDataset.collate, **driver.shard_kw())

    val_txt = VcrTxtTokDb(opts.val_txt_db, max_txt_len=-1, task="qa,qar")
    val_ds = VcrEvalDataset(
        "val", val_txt,
        img_db_gt=driver.open_img_db(opts.val_img_db_gt, opts, gt=True),
        img_db=driver.open_img_db(opts.val_img_db, opts))
    val_loader = BucketLoader(
        # grid from the VAL dataset itself: the val db is untruncated
        # (max_txt_len=-1); an opts.max_txt_len-capped spec would silently
        # cut long rationales (inf_vcr.py parity)
        val_ds, spec_from_dataset(val_ds, opts.val_batch_size),
        shuffle=False, drop_last=False, collate=val_ds.collate_fn,
        **driver.shard_kw())

    def loss_fn(p, batch, rng):
        per_row = model.apply(
            {"params": p}, batch, True, deterministic=False,
            rngs={"dropout": rng})
        w = batch["ex_weight"]
        # reference VCR uses reduction='mean' over rows (model/vcr.py:72-75)
        return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0), {}

    def validate_fn(state, step):
        logs = validate(model, state.params, val_loader)
        LOGGER.info("step %d: qa %.4f qar-joint %.4f", step,
                    logs["qa_acc"], logs["qar_joint_acc"])
        return logs

    return driver.run_training(
        opts, model=model, params=params, loss_fn=loss_fn,
        train_loader=train_loader, mesh=mesh, validate_fn=validate_fn,
        lr_mul_paths=("vcr_",))


def get_parser():
    parser = argparse.ArgumentParser()
    driver.add_common_args(parser)
    parser.add_argument("--train_txt_db", type=str)
    parser.add_argument("--train_img_db", type=str)
    parser.add_argument("--train_img_db_gt", type=str)
    parser.add_argument("--val_txt_db", type=str)
    parser.add_argument("--val_img_db", type=str)
    parser.add_argument("--val_img_db_gt", type=str)
    parser.add_argument("--tasks", default="qa,qar",
                        help="comma-separated: qa,qar")
    parser.add_argument("--checkpoint_from", default="pretrain",
                        choices=["pretrain", "vcr_pretrain"])
    parser.set_defaults(learning_rate=6e-5, lr_mul=10.0, max_txt_len=220,
                        num_train_steps=8000, warmup_steps=800,
                        train_batch_size=4000)
    return parser


if __name__ == "__main__":
    main(parse_with_config(get_parser()))
