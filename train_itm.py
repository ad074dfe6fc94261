"""Image-text retrieval fine-tuning driver (reference train_itm.py).

ItmRankDataset groups (1 pos + 2*neg) pairs per example; margin-triplet
loss over sigmoid rank scores (model/itm.py:45-53); ``rank_output`` is
seeded from the pretrained ITM head row 1 (itm.py:25-28).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.itm import ItmRankDataset, ItmValDataset
from uniter_tpu.data.loader import BucketLoader
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.models.itm import UniterForImageTextRetrieval, seed_rank_head
from uniter_tpu.training import driver
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.itm_eval import inference_score_matrix, itm_eval
from uniter_tpu.utils.logger import LOGGER
from uniter_tpu.utils.misc import parse_with_config


def build_model_and_params(opts, rng):
    cfg = driver.model_config_from_opts(opts)
    model = UniterForImageTextRetrieval(
        cfg, img_dim=IMG_DIM, margin=opts.margin)
    init_batch = driver.make_init_batch()
    params = model.init({"params": rng}, init_batch, False)["params"]

    params = driver.load_trunk_checkpoint(
        params, opts, cfg, extra_map=seed_rank_head)
    return model, cfg, params


def _window_recall_logs(ranks):
    """Windowed-recall counters -> the reference's validation scalars
    (train_itm_hard_negatives.py:298-339)."""
    n = max(len(ranks), 1)
    ranks = np.asarray(ranks)
    logs = {"recall_1": float((ranks < 1).sum()) / n,
            "recall_5": float((ranks < 5).sum()) / n,
            "recall_10": float((ranks < 10).sum()) / n}
    logs["r_mean"] = (logs["recall_1"] + logs["recall_5"]
                      + logs["recall_10"]) / 3
    return logs


def validate_retrieval(model, params, val_ds, t_bucket=None, r_bucket=None,
                       impl="auto"):
    """Full-matrix R@K for ItmEvalDataset; windowed gt-rank recall for
    ItmValDataset (the reference's in-training validation,
    train_itm_hard_negatives.py:268-310: gt sits at window index 0 and is
    ranked among the window's scores).

    ``impl``: 'fast' scores device-resident tiles over every local chip
    (utils/itm_fast.py) — ItmEvalDataset gets the full tiled matrix,
    ItmValDataset gets windowed scoring (only each text's bs window
    pairs, gathered on device — identical per-pair inputs => identical
    recall); 'batched' keeps the per-text minibatch loop with each
    minibatch sharded over local chips; 'auto' picks fast on accelerators
    and batched on CPU."""
    from uniter_tpu.data.itm import ItmEvalDataset
    from uniter_tpu.parallel.collectives import all_gather_list
    from uniter_tpu.training.infer import (
        cached_predict, eval_put, local_eval_mesh, local_eval_params,
    )
    from uniter_tpu.utils.itm_fast import (
        fast_score_matrix, fast_windowed_scores,
    )

    if t_bucket is None or r_bucket is None:
        t_hint, r_hint = val_ds.bucket_hint()
        t_bucket, r_bucket = t_bucket or t_hint, r_bucket or r_hint
    if impl == "auto":
        impl = "batched" if jax.default_backend() == "cpu" else "fast"
    mesh = local_eval_mesh()
    # in-training validation passes state.params (global training mesh);
    # eval batches commit to the LOCAL mesh — make params process-local
    # (collective on multi-process FSDP; validation is lockstep)
    params = local_eval_params(params, mesh)
    full_matrix = isinstance(val_ds, ItmEvalDataset)
    shard = driver.shard_kw()

    if full_matrix:
        if impl == "fast":
            mat, txt_ids = fast_score_matrix(
                model, params, val_ds, t_bucket, r_bucket,
                dtype=model.config.dtype, mesh=mesh, **shard)
        else:
            predict = cached_predict(model)
            mat, txt_ids = inference_score_matrix(
                predict, val_ds, params, t_bucket, r_bucket, mesh=mesh,
                **shard)
        mats = all_gather_list((mat, txt_ids))
        mat = np.concatenate([m for m, _ in mats if m.size])
        txt_ids = [t for _, ts in mats for t in ts]
        return itm_eval(mat, txt_ids, val_ds.all_img_ids, val_ds.txt2img,
                        val_ds.img2txts)

    # windowed recall (ItmValDataset)
    ranks = []
    if impl == "fast":
        rows, _ids = fast_windowed_scores(
            model, params, val_ds, t_bucket, r_bucket,
            dtype=model.config.dtype, mesh=mesh, **shard)
        for s in rows:  # gt at window index 0
            ranks.append(int(np.argsort(-s).tolist().index(0)))
    else:
        predict = cached_predict(model)
        for i in range(shard["shard_index"], len(val_ds),
                       shard["shard_count"]):
            scores = []
            for batch in val_ds.get_batches(i, t_bucket, r_bucket):
                n_real = int(batch["ex_weight"].sum())
                jb = eval_put({k: v for k, v in batch.items()
                               if isinstance(v, np.ndarray)}, mesh)
                scores.append(np.asarray(predict(params, jb))[:n_real, 0])
            s = np.concatenate(scores)
            ranks.append(int(np.argsort(-s).tolist().index(0)))
    all_ranks = [r for part in all_gather_list(ranks) for r in part]
    return _window_recall_logs(all_ranks)


def main(opts):
    cfg = driver.model_config_from_opts(opts)
    mesh = driver.setup_run(opts, cfg)
    model, cfg, params = build_model_and_params(
        opts, jax.random.PRNGKey(opts.seed))

    # reference configs declare db LISTS (train_txt_dbs/train_img_dbs,
    # e.g. COCO train + restval); singular flags remain for single-corpus
    txt_paths = opts.train_txt_dbs or [opts.train_txt_db]
    img_paths = opts.train_img_dbs or [opts.train_img_db]
    sample_size = 1 + 2 * opts.negative_size
    parts = []
    for txt_path, img_path in zip(txt_paths, img_paths):
        ds = ItmRankDataset(TxtTokDb(txt_path, max_txt_len=opts.max_txt_len),
                            driver.open_img_db(img_path, opts),
                            neg_sample_size=opts.negative_size)
        ds.rows_per_example = sample_size
        parts.append(ds)
    if len(parts) == 1:
        train_ds = parts[0]
    else:
        from uniter_tpu.data.datasets import ConcatDataset

        train_ds = ConcatDataset(parts)
        train_ds.rows_per_example = sample_size
    spec = driver.bucket_spec(opts, mesh, train_ds)
    train_loader = BucketLoader(train_ds, spec, seed=opts.seed, loop=True,
                               num_workers=opts.n_workers,
                                  worker_type=getattr(opts, "worker_type", None),
                               **driver.shard_kw())

    val_txt = TxtTokDb(opts.val_txt_db, max_txt_len=opts.max_txt_len)
    val_img = driver.open_img_db(opts.val_img_db, opts)
    val_ds = ItmValDataset(val_txt, val_img,
                           mini_batch_size=opts.inf_minibatch_size)

    def loss_fn(p, batch, rng):
        per_group = model.apply(
            {"params": p}, batch, True, sample_size=sample_size,
            deterministic=False, rngs={"dropout": rng})  # [G, sample-1]
        w = batch["ex_weight"].reshape(-1, sample_size)[:, :1]
        # reference: plain mean over ALL [G, sample-1] triplet terms
        # (train_itm.py:164-165) — no per-group rescale
        return (jnp.sum(per_group * w)
                / jnp.maximum(jnp.sum(w) * (sample_size - 1), 1.0)), {}

    def validate_fn(state, step):
        logs = validate_retrieval(model, state.params, val_ds)
        LOGGER.info("step %d: r_mean %.4f", step, logs["r_mean"])
        return logs

    return driver.run_training(
        opts, model=model, params=params, loss_fn=loss_fn,
        train_loader=train_loader, mesh=mesh, validate_fn=validate_fn)


def get_parser():
    parser = argparse.ArgumentParser()
    driver.add_common_args(parser)
    parser.add_argument("--train_txt_db", type=str)
    parser.add_argument("--train_img_db", type=str)
    parser.add_argument("--train_txt_dbs", type=str, nargs="*", default=None)
    parser.add_argument("--train_img_dbs", type=str, nargs="*", default=None)
    parser.add_argument("--val_txt_db", type=str)
    parser.add_argument("--val_img_db", type=str)
    parser.add_argument("--negative_size", type=int, default=1)
    parser.add_argument("--margin", type=float, default=0.2)
    parser.add_argument("--inf_minibatch_size", type=int, default=400)
    parser.set_defaults(learning_rate=5e-5, num_train_steps=5000,
                        warmup_steps=500, train_batch_size=8192)
    return parser


if __name__ == "__main__":
    main(parse_with_config(get_parser()))
