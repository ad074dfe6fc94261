"""VQA fine-tuning driver (reference train_vqa.py).

Loss = BCE.mean() * num_answers (train_vqa.py:188); the answer head gets a
10x lr multiplier (train_vqa.py:208-214 -> lr_mul over vqa_* params).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.data.vqa import VqaDataset
from uniter_tpu.models.vqa import UniterForVisualQuestionAnswering
from uniter_tpu.training import driver
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.logger import LOGGER
from uniter_tpu.utils.misc import parse_with_config


def build_model_and_params(opts, rng):
    cfg = driver.model_config_from_opts(opts)
    model = UniterForVisualQuestionAnswering(
        cfg, img_dim=IMG_DIM, num_answer=opts.num_answer)
    init_batch = driver.make_init_batch(
        targets=jnp.zeros((8, opts.num_answer), jnp.float32))
    params = model.init({"params": rng}, init_batch, False)["params"]
    params = driver.load_trunk_checkpoint(params, opts, cfg)
    return model, cfg, params


def validate(model, params, loader, num_answer):
    """VQA soft-score accuracy (reference train_vqa.py:312-341). Batches
    shard over the local chips; params are made process-local once
    (infer.eval_batches)."""
    from uniter_tpu.training.infer import cached_predict, eval_batches

    predict = cached_predict(model)
    score_sum, n_ex, loss_sum = 0.0, 0, 0.0
    for batch, out in eval_batches(predict, params, loader):
        targets = np.asarray(batch["targets"])
        logits = np.asarray(out)[:len(targets)]
        w = np.asarray(batch["ex_weight"]) > 0
        preds = logits.argmax(-1)
        score_sum += float(targets[np.arange(len(preds)), preds][w].sum())
        n_ex += int(w.sum())
    from uniter_tpu.parallel.collectives import all_gather_list

    score_sum = sum(all_gather_list(score_sum))
    n_ex = sum(all_gather_list(n_ex))
    return {"score": score_sum / max(n_ex, 1), "n_ex": n_ex}


def main(opts):
    # answer vocabulary: in-tree artifact by default (reference hardcodes
    # utils/ans2label.json, train_vqa.py:107-108) — sets num_answer and is
    # re-dumped next to the checkpoints for inference (train_vqa.py:160-161).
    # An explicit non-default --num_answer (tests, custom heads) skips it.
    from uniter_tpu.parallel.collectives import process_index
    from uniter_tpu.utils.vqa_answers import load_ans2label

    ans2label = None
    if getattr(opts, "ans2label", None):
        ans2label = load_ans2label(opts.ans2label)
        opts.num_answer = len(ans2label)
    elif opts.num_answer == 3129:
        try:
            ans2label = load_ans2label(None)
            opts.num_answer = len(ans2label)
        except FileNotFoundError:
            pass
    cfg = driver.model_config_from_opts(opts)
    mesh = driver.setup_run(opts, cfg)
    if ans2label is not None and process_index() == 0:
        with open(os.path.join(opts.output_dir, "ckpt",
                               "ans2label.json"), "w") as f:
            json.dump(ans2label, f)
    model, cfg, params = build_model_and_params(
        opts, jax.random.PRNGKey(opts.seed))

    txt_db = TxtTokDb(opts.train_txt_db, max_txt_len=opts.max_txt_len)
    img_db = driver.open_img_db(opts.train_img_db, opts)
    train_ds = VqaDataset(opts.num_answer, txt_db, img_db)
    spec = driver.bucket_spec(opts, mesh, train_ds)
    train_loader = BucketLoader(train_ds, spec, seed=opts.seed, loop=True,
                               num_workers=opts.n_workers,
                                  worker_type=getattr(opts, "worker_type", None),
                               **driver.shard_kw())

    val_txt = TxtTokDb(opts.val_txt_db, max_txt_len=opts.max_txt_len)
    val_img = driver.open_img_db(opts.val_img_db, opts)
    val_loader = BucketLoader(
        VqaDataset(opts.num_answer, val_txt, val_img),
        driver.bucket_spec(opts, mesh, train_ds, opts.val_batch_size),
        shuffle=False, drop_last=False, **driver.shard_kw())

    num_answer = opts.num_answer

    def loss_fn(p, batch, rng):
        per_elem = model.apply(
            {"params": p}, batch, True, deterministic=False,
            rngs={"dropout": rng})  # [B, A]
        w = batch["ex_weight"][:, None]
        # reference: bce.mean() * num_answers (train_vqa.py:188)
        loss = (jnp.sum(per_elem * w)
                / jnp.maximum(jnp.sum(w) * num_answer, 1.0)) * num_answer
        return loss, {}

    def validate_fn(state, step):
        logs = validate(model, state.params, val_loader, num_answer)
        LOGGER.info("step %d: val score %.4f", step, logs["score"])
        return logs

    return driver.run_training(
        opts, model=model, params=params, loss_fn=loss_fn,
        train_loader=train_loader, mesh=mesh, validate_fn=validate_fn,
        lr_mul_paths=("vqa_",))


def get_parser():
    parser = argparse.ArgumentParser()
    driver.add_common_args(parser)
    parser.add_argument("--train_txt_db", type=str)
    parser.add_argument("--train_img_db", type=str)
    parser.add_argument("--val_txt_db", type=str)
    parser.add_argument("--val_img_db", type=str)
    parser.add_argument("--num_answer", type=int, default=3129,
                        help="overridden by the --ans2label vocabulary size")
    parser.add_argument("--ans2label", default=None,
                        help="answer->label json (default: the in-tree "
                             "uniter_tpu/utils/ans2label.json)")
    parser.set_defaults(learning_rate=8e-5, lr_mul=10.0, max_txt_len=60,
                        num_train_steps=6000, warmup_steps=600)
    return parser


if __name__ == "__main__":
    main(parse_with_config(get_parser()))
