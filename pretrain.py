"""UNITER pretraining driver (reference pretrain.py).

Builds per-(corpus x task) bucketed loaders from the config's
``train_datasets`` declaration (pretrain.py:116-165), mixes tasks with
MetaLoader (seeded, no collective — replaces any_broadcast,
data/loader.py:43-47), and trains UniterForPretraining with per-task scalar
losses (MLM / MRFR / ITM+OT / MRC-kl). One train step is compiled per
(task, bucket shape).
"""

from __future__ import annotations

import argparse
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.config import IMG_LABEL_DIM
from uniter_tpu.data.datasets import ConcatDataset, ImageDbGroup
from uniter_tpu.data.itm import ItmDataset
from uniter_tpu.data.loader import BucketLoader, MetaLoader
from uniter_tpu.data.mlm import MlmDataset
from uniter_tpu.data.mrm import MrcDataset, MrfrDataset
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.models.pretrain import UniterForPretraining
from uniter_tpu.training import driver
from uniter_tpu.training.optim import build_optimizer
from uniter_tpu.training.sched import get_lr_schedule
from uniter_tpu.training.step import TrainState, make_train_step
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.misc import parse_with_config
from uniter_tpu.utils.save import TrainStateSaver


def _load_pretrain_heads(params, sd):
    """Restore MLM/MRFR/MRC/ITM head tensors when present in the checkpoint
    (continuing pretraining; reference from_pretrained loads them too)."""
    from uniter_tpu.models import checkpoint as ckpt_lib

    flat = ckpt_lib.pretrain_head_params_from_state_dict(sd)
    params, filled = ckpt_lib.merge_into_params(params, flat,
                                                strict_shapes=False)
    return params


def build_model_and_params(opts, rng):
    cfg = driver.model_config_from_opts(opts)
    model = UniterForPretraining(
        cfg, img_dim=IMG_DIM, img_label_dim=IMG_LABEL_DIM)
    init_batch = driver.make_init_batch(
        mlm_pos=jnp.zeros((8, 4), jnp.int32),
        mrm_pos=jnp.zeros((8, 4), jnp.int32))
    params = model.init(
        {"params": rng}, init_batch,
        method=UniterForPretraining.init_all)["params"]
    params = driver.load_trunk_checkpoint(
        params, opts, cfg, extra_map=_load_pretrain_heads)
    return model, cfg, params


DATASET_REGISTRY = {
    "mlm": lambda txt, img, opts, **kw: MlmDataset(txt, img, **kw),
    "mrfr": lambda txt, img, opts, **kw: MrfrDataset(
        opts.mrm_prob, txt, img, **kw),
    "mrc": lambda txt, img, opts, **kw: MrcDataset(
        opts.mrm_prob, txt, img, **kw),
    "mrc-kl": lambda txt, img, opts, **kw: MrcDataset(
        opts.mrm_prob, txt, img, **kw),
    # the reference configs spell it "mrckl" (config/pretrain-*.json)
    "mrckl": lambda txt, img, opts, **kw: MrcDataset(
        opts.mrm_prob, txt, img, **kw),
    "itm": lambda txt, img, opts, **kw: ItmDataset(
        txt, img, neg_sample_p=opts.itm_neg_prob, **kw),
}


def create_dataloaders(datasets_cfg, opts, mesh, train=True) -> Dict[str, tuple]:
    """name -> (loader, ratio); name is '{task}_{corpus-name}'
    (reference pretrain.py:116-165). Validation loaders do one full pass
    and never drop tail examples (drop_last=False)."""
    compress = (bool(getattr(opts, "compressed_db", False))
                and not opts.uncompressed_db)
    img_group = ImageDbGroup(opts.conf_th, opts.max_bb, opts.min_bb,
                             opts.num_bb, compress=compress)
    out = {}
    for dset in datasets_cfg:
        name = dset["name"]
        txt_dbs = dset["db"] if isinstance(dset["db"], list) else [dset["db"]]
        img_dirs = dset["img"] if isinstance(dset["img"], list) else [dset["img"]]
        for task, ratio in zip(dset["tasks"], dset.get(
                "mix_ratio", [1] * len(dset["tasks"]))):
            build = DATASET_REGISTRY[task]
            parts = []
            for txt_path, img_dir in zip(txt_dbs, img_dirs):
                txt_db = TxtTokDb(txt_path, max_txt_len=opts.max_txt_len)
                ds = build(txt_db, img_group[img_dir], opts)
                parts.append(ds)
            ds = parts[0] if len(parts) == 1 else ConcatDataset(parts)
            spec = driver.bucket_spec(
                opts, mesh, ds,
                budget=None if train else opts.val_batch_size)
            collate = type(parts[0]).collate
            # sharding lives in the loader: all hosts share one batch
            # plan, each materializes its block (validation counters are
            # all-gathered in validate())
            loader = BucketLoader(ds, spec, collate=collate,
                                  seed=opts.seed, loop=train,
                                  shuffle=train, drop_last=train,
                                  num_workers=opts.n_workers,
                                  worker_type=getattr(opts, "worker_type", None),
                                  **driver.shard_kw())
            out[f"{task}_{name}"] = (loader, ratio)
    return out


def validate(model, params, val_loaders, pred_cache=None):
    """Per-task validation (reference pretrain.py:364-544): MLM acc, MRFR
    per-feature loss, MRC(-kl) acc, ITM acc. ``pred_cache`` persists the
    jitted predictors across validation rounds (a fresh lambda per call
    would recompile every time). Batches shard over every local chip
    (reference: all ranks validate, pretrain.py:390-544); the reductions
    below use in-batch masks over readbacks TRIMMED to the host row count
    (eval_put's zero pad rows are never seen); params are made
    process-local once per round (state.params live on the GLOBAL
    training mesh — collective, lockstep)."""
    import time

    from uniter_tpu.training.infer import (
        eval_batches, local_eval_mesh, local_eval_params,
    )

    mesh = local_eval_mesh()
    params = local_eval_params(params, mesh)
    logs = {}
    pred_cache = {} if pred_cache is None else pred_cache
    for name, loader in val_loaders.items():
        task = name.split("_")[0]
        n_correct, n_word, loss_sum = 0, 0, 0.0
        t0 = time.time()
        if task not in pred_cache:
            if task.startswith("itm"):
                pred_cache[task] = jax.jit(
                    lambda p, b: model.apply(
                        {"params": p}, b, False, False, deterministic=True,
                        method=UniterForPretraining.forward_itm))
            else:
                pred_cache[task] = jax.jit(
                    lambda p, b, t=task: model.apply(
                        {"params": p}, b, t, False, deterministic=True))
        pred = pred_cache[task]
        # eval_batches: per-batch rows over the local chips, next batch's
        # host collate + transfer overlapped with compute; params were
        # localized once above (mesh passed => no re-localization)
        for batch, out in eval_batches(pred, params, loader, mesh=mesh):
            # zero rows may be appended for data-axis divisibility; every
            # readback below trims to the host batch's row count, so the
            # in-batch-mask reductions never see them
            n_rows = batch["input_ids"].shape[0]
            if task == "mlm":
                logits = np.asarray(out)[:n_rows]  # [B, M, V]
                tgt = np.asarray(batch["mlm_tgt"])
                valid = tgt != -1
                n_correct += int((logits.argmax(-1) == tgt)[valid].sum())
                n_word += int(valid.sum())
            elif task == "mrfr":
                pred_feat = np.asarray(out)[:n_rows]
                tgtf = np.asarray(batch["feat_targets"])
                w = np.asarray(batch["mrm_valid"])[..., None]
                loss_sum += float((np.square(pred_feat - tgtf) * w).sum()
                                  / pred_feat.shape[-1])
                n_word += int(w.sum())
            elif task.startswith("mrc"):
                logits = np.asarray(out)[:n_rows]  # [B, Mr, L]
                tgt = np.asarray(batch["label_targets"])
                valid = np.asarray(batch["mrm_valid"]) > 0
                # acc vs argmax of soft label, background excluded
                # (reference pretrain.py:480-490)
                lab = tgt[..., 1:].argmax(-1) + 1
                n_correct += int((logits.argmax(-1) == lab)[valid].sum())
                n_word += int(valid.sum())
            elif task.startswith("itm"):
                scores, _ = out
                scores = np.asarray(scores)[:n_rows]
                tgt = np.asarray(batch["targets"])
                valid = tgt != -1
                n_correct += int((scores.argmax(-1) == tgt)[valid].sum())
                n_word += int(valid.sum())
        # gather counters across hosts (reference pretrain.py:390-544
        # all_gather_list on every validation stat)
        from uniter_tpu.parallel.collectives import all_gather_list

        n_correct, n_word, loss_sum = (
            sum(v) for v in zip(*all_gather_list(
                (n_correct, n_word, loss_sum))))
        if task == "mrfr":
            logs[f"{name}_loss"] = loss_sum / max(n_word, 1)
        else:
            logs[f"{name}_acc"] = n_correct / max(n_word, 1)
        # reference validate_* log tok_per_s / feat_per_s
        # (pretrain.py:380-388, 411-413, 441-443)
        unit = "feat" if task.startswith("mr") else "tok"
        logs[f"{name}_{unit}_per_s"] = n_word / max(time.time() - t0, 1e-9)
    return logs


def main(opts):
    cfg = driver.model_config_from_opts(opts)
    mesh = driver.setup_run(opts, cfg)
    model, cfg, params = build_model_and_params(
        opts, jax.random.PRNGKey(opts.seed))

    loaders = create_dataloaders(opts.train_datasets, opts, mesh)
    accum = opts.gradient_accumulation_steps
    if accum > 1:
        from uniter_tpu.data.loader import AccumLoader

        loaders = {name: (AccumLoader(loader, accum), ratio)
                   for name, (loader, ratio) in loaders.items()}
    meta = MetaLoader(loaders, accum_steps=1, seed=opts.seed)
    val_loaders = {}
    if opts.val_datasets:
        raw = create_dataloaders(opts.val_datasets, opts, mesh, train=False)
        val_loaders = {name: loader for name, (loader, _r) in raw.items()}

    sched = get_lr_schedule(opts.learning_rate, opts.warmup_steps,
                            opts.num_train_steps)
    tx = build_optimizer(params, sched, **driver.optim_kwargs(opts))
    from uniter_tpu.training.loop import place_state

    state = place_state(driver.make_train_state(params, tx, opts), mesh,
                        fsdp=getattr(opts, "fsdp", False),
                        fsdp_min_size=getattr(opts, "fsdp_min_size", 2 ** 16))
    saver = TrainStateSaver(opts.output_dir)
    restored = saver.restore(state)
    if restored is not None:
        state = restored

    # one jitted step per task (jit also caches per batch-shape)
    step_fns = {}

    def get_step(task):
        if task not in step_fns:
            def loss_fn(p, batch, rng, _task=task):
                scalar, metrics = model.apply(
                    {"params": p}, batch, _task,
                    ot_lambda=(opts.itm_ot_lambda
                               if _task.startswith("itm") else 0.0),
                    deterministic=False, rngs={"dropout": rng},
                    method=UniterForPretraining.scalar_loss)
                return scalar, metrics
            step_fns[task] = make_train_step(
                loss_fn, mesh=mesh, loss_scale="sum",
                accum_steps=opts.gradient_accumulation_steps)
        return step_fns[task]

    pred_cache = {}

    def validate_fn(state, step):
        return (validate(model, state.params, val_loaders, pred_cache)
                if val_loaders else {})

    from uniter_tpu.training.loop import MixedTaskLoop, pretrain_loss_units

    cdt = cfg.compute_dtype
    loop = MixedTaskLoop(
        meta=meta, get_step=get_step, state=state, mesh=mesh,
        num_train_steps=opts.num_train_steps, valid_steps=opts.valid_steps,
        log_steps=getattr(opts, "log_steps", 100),
        validate_fn=validate_fn, saver=saver, seed=opts.seed,
        accum=accum > 1, loss_units_fn=pretrain_loss_units,
        profile_dir=getattr(opts, "profile_dir", None),
        transfer_dtype=None if cdt == jnp.float32 else cdt,
        wire_codec=(None if getattr(opts, "wire_codec", "cast") == "cast"
                    else opts.wire_codec),
        lr_schedule=sched)
    return loop.run()


def get_parser():
    parser = argparse.ArgumentParser()
    driver.add_common_args(parser)
    parser.add_argument("--train_datasets", type=str, nargs="*",
                        help="declared in the config JSON")
    parser.add_argument("--val_datasets", type=str, nargs="*")
    parser.add_argument("--mrm_prob", type=float, default=0.15)
    parser.add_argument("--itm_neg_prob", type=float, default=0.5)
    parser.add_argument("--itm_ot_lambda", type=float, default=0.1)
    parser.add_argument("--uncompressed_db", action="store_true",
                        help="deprecated: uncompressed is already the "
                             "default (reference parity); when given it "
                             "takes precedence over --compressed_db")
    parser.set_defaults(learning_rate=5e-5, num_train_steps=200000,
                        warmup_steps=10000, train_batch_size=10240,
                        max_txt_len=60)
    return parser


if __name__ == "__main__":
    main(parse_with_config(get_parser()))
