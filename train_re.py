"""Referring-expression fine-tuning driver (reference train_re.py).

Epoch-based (per-epoch ref shuffle, re.py:65-68 / train_re.py:253), loss is
summed over examples (train_re.py:195), head gets 10x lr (train_re.py:65-101),
best-checkpoint tracking on val accuracy.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.buckets import spec_from_dataset
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.re import ReDataset, ReEvalDataset, ReTxtTokDb, compute_iou
from uniter_tpu.models.re import UniterForReferringExpressionComprehension
from uniter_tpu.training import driver
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.logger import LOGGER
from uniter_tpu.utils.misc import parse_with_config


def build_model_and_params(opts, rng):
    cfg = driver.model_config_from_opts(opts)
    model = UniterForReferringExpressionComprehension(
        cfg, img_dim=IMG_DIM, loss_type=opts.train_loss,
        margin=opts.margin, hard_ratio=opts.hard_ratio, mlp=opts.mlp)
    init_batch = driver.make_init_batch(
        obj_masks=jnp.zeros((8, 8), bool),
        targets=jnp.zeros((8,), jnp.int32))
    params = model.init(
        {"params": rng, "sampling": jax.random.PRNGKey(1)}, init_batch, True,
        deterministic=True)["params"]
    params = driver.load_trunk_checkpoint(params, opts, cfg)
    return model, cfg, params


def evaluate(model, params, loader):
    """IoU>0.5 accuracy over gt or det boxes (reference inf_re.py:118-157).
    Batches shard over the local chips; params made process-local once
    (infer.eval_batches); w indexes only host rows, so padded output rows
    are never read."""
    from uniter_tpu.training.infer import cached_predict, eval_batches

    predict = cached_predict(model)
    n_correct, n_ex = 0, 0
    for batch, out in eval_batches(predict, params, loader):
        scores = np.asarray(out)
        w = np.asarray(batch["ex_weight"]) > 0
        preds = scores.argmax(-1)
        for i in np.nonzero(w)[0]:
            obj_boxes = batch["obj_boxes"][i]
            tgt = batch["tgt_box"][i]
            pred_box = obj_boxes[min(preds[i], len(obj_boxes) - 1)]
            n_correct += int(compute_iou(pred_box, tgt) > 0.5)
            n_ex += 1
    from uniter_tpu.parallel.collectives import all_gather_list

    n_correct = sum(all_gather_list(n_correct))
    n_ex = sum(all_gather_list(n_ex))
    return {"acc": n_correct / max(n_ex, 1), "n_ex": n_ex}


def main(opts):
    cfg = driver.model_config_from_opts(opts)
    mesh = driver.setup_run(opts, cfg)
    model, cfg, params = build_model_and_params(
        opts, jax.random.PRNGKey(opts.seed))

    txt_db = ReTxtTokDb(opts.train_txt_db, max_txt_len=opts.max_txt_len)
    img_db = driver.open_img_db(opts.train_img_db, opts)
    train_ds = ReDataset(txt_db, img_db)
    spec = driver.bucket_spec(opts, mesh, train_ds)
    train_loader = BucketLoader(train_ds, spec, seed=opts.seed,
                                loop=True, **driver.shard_kw())

    val_txt = ReTxtTokDb(opts.val_txt_db, max_txt_len=-1)
    val_img = driver.open_img_db(opts.val_img_db, opts)
    val_ds = ReEvalDataset(val_txt, val_img, use_gt_feat=True)
    val_loader = BucketLoader(
        # grid from the VAL dataset itself: the val db is untruncated
        # (max_txt_len=-1) and uses gt features — a train-derived spec
        # would silently cut long expressions (inf_re.py parity)
        val_ds, spec_from_dataset(val_ds, opts.val_batch_size),
        shuffle=False, drop_last=False, **driver.shard_kw())

    def loss_fn(p, batch, rng):
        per_ex = model.apply(
            {"params": p}, batch, True, deterministic=False,
            rngs={"dropout": rng, "sampling": jax.random.fold_in(rng, 1)})
        w = batch["ex_weight"]
        # reference RE loss is SUMMED over examples (train_re.py:195)
        return jnp.sum(per_ex * w), {}

    # The loss is already the GLOBAL sum (grads == the reference's
    # denom-1 allreduce of per-rank sums); the default loss_scale="sum"
    # would multiply by dp on top — dp x the reference gradient.

    def validate_fn(state, step):
        logs = evaluate(model, state.params, val_loader)
        LOGGER.info("step %d: val IoU acc %.4f", step, logs["acc"])
        return logs

    return driver.run_training(
        opts, model=model, params=params, loss_fn=loss_fn,
        train_loader=train_loader, mesh=mesh, validate_fn=validate_fn,
        lr_mul_paths=("re_",), loss_scale="mean",
        # ckpt/model_step_best.msgpack tracks the best val accuracy
        # (reference train_re.py:259-263); inference loads it with
        # --ckpt best
        best_metric="acc")


def get_parser():
    parser = argparse.ArgumentParser()
    driver.add_common_args(parser)
    parser.add_argument("--train_txt_db", type=str)
    parser.add_argument("--train_img_db", type=str)
    parser.add_argument("--val_txt_db", type=str)
    parser.add_argument("--val_img_db", type=str)
    parser.add_argument("--train_loss", default="cls",
                        choices=["cls", "rank"])
    parser.add_argument("--margin", type=float, default=0.2)
    parser.add_argument("--hard_ratio", type=float, default=0.3)
    parser.add_argument("--mlp", type=int, default=1)
    parser.set_defaults(learning_rate=1e-4, lr_mul=10.0, max_txt_len=60,
                        num_train_steps=24000, warmup_steps=2400,
                        train_batch_size=8192)
    return parser


if __name__ == "__main__":
    main(parse_with_config(get_parser()))
