"""VCR 2nd-stage pretraining driver (reference pretrain_vcr.py).

Same skeleton as pretrain.py without ITM; dual img_db (gt + det features,
reference pretrain_vcr.py:92 load_img_feat); model config widened to 4 type
rows + 81 special word rows with checkpoint surgeries.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from uniter_tpu.config import IMG_LABEL_DIM
from uniter_tpu.data.loader import BucketLoader, MetaLoader
from uniter_tpu.data.pretrain_vcr import (
    MlmDatasetForVCR, MrcDatasetForVCR, MrfrDatasetForVCR,
)
from uniter_tpu.data.vcr import VcrTxtTokDb
from uniter_tpu.models.pretrain_vcr import UniterForPretrainingForVCR
from uniter_tpu.models.vcr import NUM_SPECIAL_TOKENS
from uniter_tpu.training import driver
from uniter_tpu.training.loop import place_state
from uniter_tpu.training.optim import build_optimizer
from uniter_tpu.training.sched import get_lr_schedule
from uniter_tpu.training.step import TrainState, make_train_step
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.misc import parse_with_config
from uniter_tpu.utils.save import TrainStateSaver

from uniter_tpu.models.pretrain import UniterForPretraining


def _load_pretrain_heads(params, sd):
    """Restore MLM/MRFR/MRC/ITM head tensors when present in the checkpoint
    (continuing pretraining; reference from_pretrained loads them too)."""
    from uniter_tpu.models import checkpoint as ckpt_lib

    flat = ckpt_lib.pretrain_head_params_from_state_dict(sd)
    params, filled = ckpt_lib.merge_into_params(params, flat,
                                                strict_shapes=False)
    return params


def build_model_and_params(opts, rng):
    cfg = driver.model_config_from_opts(opts, type_vocab_size=4)
    cfg = cfg.replace(vocab_size=cfg.vocab_size + NUM_SPECIAL_TOKENS)
    model = UniterForPretrainingForVCR(
        cfg, img_dim=IMG_DIM, img_label_dim=IMG_LABEL_DIM)
    init_batch = driver.make_init_batch(
        mlm_pos=jnp.zeros((8, 4), jnp.int32),
        mrm_pos=jnp.zeros((8, 4), jnp.int32))
    params = model.init(
        {"params": rng}, init_batch,
        method=UniterForPretraining.init_all)["params"]
    params = driver.load_trunk_checkpoint(
        params, opts, cfg, n_type_rows=4, type_copy_row=0,
        n_special_words=NUM_SPECIAL_TOKENS, extra_map=_load_pretrain_heads)
    return model, cfg, params


DATASETS = {
    "mlm": lambda opts, *a, **kw: MlmDatasetForVCR(*a, **kw),
    "mrfr": lambda opts, *a, **kw: MrfrDatasetForVCR(opts.mrm_prob, *a, **kw),
    "mrc": lambda opts, *a, **kw: MrcDatasetForVCR(opts.mrm_prob, *a, **kw),
    "mrc-kl": lambda opts, *a, **kw: MrcDatasetForVCR(
        opts.mrm_prob, *a, **kw),
    # the reference configs spell it "mrckl" (config/pretrain-vcr-*.json)
    "mrckl": lambda opts, *a, **kw: MrcDatasetForVCR(
        opts.mrm_prob, *a, **kw),
}


def main(opts):
    cfg = driver.model_config_from_opts(opts, type_vocab_size=4)
    mesh = driver.setup_run(opts, cfg)
    model, cfg, params = build_model_and_params(
        opts, jax.random.PRNGKey(opts.seed))

    img_db = driver.open_img_db(opts.train_img_db, opts)
    img_db_gt = driver.open_img_db(opts.train_img_db_gt, opts, gt=True)

    def make_loaders(datasets_cfg, train=True):
        out = {}
        for dset in datasets_cfg:
            for task, ratio in zip(dset["tasks"], dset.get(
                    "mix_ratio", [1] * len(dset["tasks"]))):
                txt_db = VcrTxtTokDb(dset["db"],
                                     max_txt_len=opts.max_txt_len,
                                     task=dset.get("vcr_task", "qa,qar"))
                ds = DATASETS[task](opts, txt_db, img_db_gt=img_db_gt,
                                    img_db=img_db)
                spec = driver.bucket_spec(
                    opts, mesh, ds,
                    budget=None if train else opts.val_batch_size)
                out[f"{task}_{dset['name']}"] = (
                    BucketLoader(ds, spec, collate=type(ds).collate,
                                 seed=opts.seed, loop=train, shuffle=train,
                                 drop_last=train,
                                 num_workers=opts.n_workers,
                                  worker_type=getattr(opts, "worker_type", None),
                                 **driver.shard_kw()), ratio)
        return out

    loaders = make_loaders(opts.train_datasets)
    val_loaders = {}
    if opts.val_datasets:
        val_loaders = {name: loader for name, (loader, _r) in
                       make_loaders(opts.val_datasets, train=False).items()}
    accum = opts.gradient_accumulation_steps
    if accum > 1:
        from uniter_tpu.data.loader import AccumLoader

        loaders = {name: (AccumLoader(loader, accum), ratio)
                   for name, (loader, ratio) in loaders.items()}
    meta = MetaLoader(loaders, accum_steps=1, seed=opts.seed)

    sched = get_lr_schedule(opts.learning_rate, opts.warmup_steps,
                            opts.num_train_steps)
    tx = build_optimizer(params, sched, **driver.optim_kwargs(opts))
    state = place_state(driver.make_train_state(params, tx, opts), mesh,
                        fsdp=getattr(opts, "fsdp", False),
                        fsdp_min_size=getattr(opts, "fsdp_min_size", 2 ** 16))
    saver = TrainStateSaver(opts.output_dir)
    restored = saver.restore(state)
    if restored is not None:
        state = restored

    step_fns = {}

    def get_step(task):
        if task not in step_fns:
            def loss_fn(p, batch, rng, _task=task):
                return model.apply(
                    {"params": p}, batch, _task, deterministic=False,
                    rngs={"dropout": rng},
                    method=UniterForPretraining.scalar_loss)
            step_fns[task] = make_train_step(
                loss_fn, mesh=mesh, loss_scale="sum",
                accum_steps=opts.gradient_accumulation_steps)
        return step_fns[task]

    from uniter_tpu.training.loop import MixedTaskLoop, pretrain_loss_units

    pred_cache = {}

    def validate_fn(state, step):
        """Per-task validation (reference pretrain_vcr.py:346-443: MLM acc,
        MRFR per-feature loss, MRC acc) via the shared pretrain validator."""
        if not val_loaders:
            return {}
        import pretrain as pretrain_mod

        return pretrain_mod.validate(model, state.params, val_loaders,
                                     pred_cache)

    cdt = cfg.compute_dtype
    loop = MixedTaskLoop(
        meta=meta, get_step=get_step, state=state, mesh=mesh,
        num_train_steps=opts.num_train_steps, valid_steps=opts.valid_steps,
        log_steps=getattr(opts, "log_steps", 100),
        validate_fn=validate_fn,
        saver=saver, seed=opts.seed,
        accum=opts.gradient_accumulation_steps > 1,
        loss_units_fn=pretrain_loss_units,
        profile_dir=getattr(opts, "profile_dir", None),
        transfer_dtype=None if cdt == jnp.float32 else cdt,
        wire_codec=(None if getattr(opts, "wire_codec", "cast") == "cast"
                    else opts.wire_codec),
        lr_schedule=sched)
    return loop.run()


def get_parser():
    parser = argparse.ArgumentParser()
    driver.add_common_args(parser)
    parser.add_argument("--train_txt_db", type=str)
    parser.add_argument("--train_img_db", type=str)
    parser.add_argument("--train_img_db_gt", type=str)
    parser.add_argument("--train_datasets", type=str, nargs="*")
    parser.add_argument("--val_datasets", type=str, nargs="*")
    parser.add_argument("--mrm_prob", type=float, default=0.15)
    parser.set_defaults(learning_rate=5e-5, num_train_steps=60000,
                        warmup_steps=6000, train_batch_size=10240,
                        max_txt_len=220)
    return parser


if __name__ == "__main__":
    main(parse_with_config(get_parser()))
