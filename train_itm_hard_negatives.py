"""ITM fine-tuning with online hard-negative mining
(reference train_itm_hard_negatives.py).

Each step scores (1 + negative_size) candidates without grad, mines the top
``hard_neg_size`` negatives with lax.top_k, and trains on [pos + hard] — all
inside one compiled step (model/itm.py:58-139). Text-side and image-side
candidate batches alternate (reference :164-192 runs both per step).
"""

from __future__ import annotations

import argparse
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.data.itm import (
    ItmRankDatasetHardNegFromImage, ItmRankDatasetHardNegFromText,
    ItmValDataset, hard_neg_collate,
)
from uniter_tpu.data.txt_db import TxtTokDb
from uniter_tpu.models.itm import UniterForImageTextRetrievalHardNeg
from uniter_tpu.training import driver
from uniter_tpu.training.optim import build_optimizer
from uniter_tpu.training.sched import get_lr_schedule
from uniter_tpu.training.step import TrainState, make_train_step
from uniter_tpu.utils.const import IMG_DIM
from uniter_tpu.utils.logger import LOGGER, TB_LOGGER
from uniter_tpu.utils.misc import parse_with_config
from uniter_tpu.utils.save import TrainStateSaver

import train_itm


class HnLoader:
    """One fixed-shape candidate batch per example, forever. Per-record
    seed streams (one draw from the loader rng per record) make
    ``skip_batches`` an exact resume fast-forward with zero fetches —
    without it a resumed run would replay the mined candidate batches the
    interrupted run already trained on."""

    def __init__(self, ds, t_bucket, r_bucket, seed):
        self.ds = ds
        self.t_bucket = t_bucket
        self.r_bucket = r_bucket
        self.rng = np.random.RandomState(seed)
        self.order = np.arange(len(ds))
        self.rng.shuffle(self.order)
        self._pos = 0

    def _advance(self):
        if self._pos >= len(self.order):
            self.rng.shuffle(self.order)
            self._pos = 0
        i = int(self.order[self._pos])
        self._pos += 1
        return i, int(self.rng.randint(2 ** 31))

    def skip_batches(self, n: int):
        for _ in range(int(n)):
            self._advance()

    def __iter__(self):
        return self

    def __next__(self):
        i, rec_seed = self._advance()
        rec = self.ds.get_record(i, np.random.RandomState(rec_seed))
        return hard_neg_collate(rec, self.t_bucket, self.r_bucket)


def main(opts):
    cfg = driver.model_config_from_opts(opts)
    mesh = driver.setup_run(opts, cfg)
    _, cfg, params = train_itm.build_model_and_params(
        opts, jax.random.PRNGKey(opts.seed))
    model = UniterForImageTextRetrievalHardNeg(
        cfg, img_dim=IMG_DIM, margin=opts.margin,
        hard_size=opts.hard_neg_size)

    assert (opts.negative_size + 1) % 8 == 0, \
        "candidate count must align to 8 (reference :438 tensor-core rule)"

    # reference HN configs declare single-element db LISTS
    txt_path = (opts.train_txt_dbs or [opts.train_txt_db])[0]
    img_path = (opts.train_img_dbs or [opts.train_img_db])[0]
    txt_db = TxtTokDb(txt_path, max_txt_len=opts.max_txt_len)
    img_db = driver.open_img_db(img_path, opts)
    ds_t = ItmRankDatasetHardNegFromText(
        txt_db, img_db, neg_sample_size=opts.negative_size)
    ds_i = ItmRankDatasetHardNegFromImage(
        txt_db, img_db, neg_sample_size=opts.negative_size)
    t_bucket, r_bucket = opts.txt_bucket, opts.img_bucket
    loader_t = HnLoader(ds_t, t_bucket, r_bucket, opts.seed)
    loader_i = HnLoader(ds_i, t_bucket, r_bucket, opts.seed + 1)

    val_txt = TxtTokDb(opts.val_txt_db, max_txt_len=opts.max_txt_len)
    val_img = driver.open_img_db(opts.val_img_db, opts)
    val_ds = ItmValDataset(val_txt, val_img,
                           mini_batch_size=opts.inf_minibatch_size)

    tx = build_optimizer(
        params, get_lr_schedule(opts.learning_rate, opts.warmup_steps,
                                opts.num_train_steps),
        **driver.optim_kwargs(opts))
    from uniter_tpu.training.loop import place_state

    state = place_state(driver.make_train_state(params, tx, opts), mesh,
                        fsdp=getattr(opts, "fsdp", False),
                        fsdp_min_size=getattr(opts, "fsdp_min_size", 2 ** 16))
    saver = TrainStateSaver(opts.output_dir)
    restored = saver.restore(state)
    if restored is not None:
        state = restored
    # resume fast-forward: each step consumed train_batch_size candidate
    # batches, strictly alternating image-side / text-side (the cycle below
    # starts at loader_i), so the two streams split ceil/floor
    n_consumed = int(state.step) * opts.train_batch_size
    if n_consumed:
        loader_i.skip_batches((n_consumed + 1) // 2)
        loader_t.skip_batches(n_consumed // 2)
        LOGGER.info("resumed from step %d: fast-forwarded mining streams "
                    "by %d candidate batches", int(state.step), n_consumed)

    def loss_fn(p, batch, rng):
        per_neg = model.apply(
            {"params": p}, batch, True, deterministic=False,
            rngs={"dropout": rng})
        return jnp.mean(per_neg), {}

    # Mining + training happen in ONE compiled step. Gradients accumulate
    # over train_batch_size mined candidate-batches per optimizer update
    # (the reference's micro-step scheme, train_itm_hard_negatives.py:185-222)
    # via a lax.scan over the stacked [accum, ...] batch. The candidate axis
    # (1 + negative_size rows) is sharded over the mesh's data axis — the
    # reference ran this recipe data-parallel on 16 GPUs.
    step = make_train_step(loss_fn, mesh=mesh, loss_scale="mean",
                           accum_steps=opts.train_batch_size)

    from uniter_tpu.data.loader import DevicePrefetcher
    from uniter_tpu.training.loop import (
        NanGuard, bound_inflight, default_prng_key, device_put_batch,
        warn_preempted,
    )

    def stacked_batches():
        sources = itertools.cycle([loader_i, loader_t])
        if n_consumed % 2:
            next(sources)  # continue the alternation where it stopped
        while True:
            batches = [next(next(sources))
                       for _ in range(opts.train_batch_size)]
            yield {
                k: np.stack([b[k] for b in batches])
                for k in batches[0] if isinstance(batches[0][k], np.ndarray)
            }

    # every host builds the IDENTICAL candidate batches (same-seed
    # loaders over the unsharded dataset); device_put slices this host's
    # block of the candidate axis (local=False)
    wire = (None if getattr(opts, "wire_codec", "cast") == "cast"
            else opts.wire_codec)
    it = DevicePrefetcher(
        stacked_batches(),
        lambda b: device_put_batch(b, mesh, accum=True, local=False,
                                   wire_codec=wire),
        depth=2)

    import time

    rng = default_prng_key(opts.seed)  # rbg on TPU (threefry ~18ms/step)
    guard = NanGuard()
    global_step = int(state.step)
    last_saved = -1
    pending = []
    t_window = time.time()

    def flush():
        for s, dev_loss in pending:
            val = float(dev_loss)
            guard.check(val, s)
            TB_LOGGER.add_scalar("loss", val, s)
        pending.clear()

    from uniter_tpu.training.preempt import PreemptionGuard

    with PreemptionGuard() as preempt:
        while global_step < opts.num_train_steps:
            stacked = next(it)
            state, metrics = step(state, stacked, rng)  # folds in state.step
            global_step += 1
            pending.append((global_step, metrics["loss"]))
            bound_inflight(pending)  # XLA:CPU rendezvous abort guard
            if global_step % 100 == 0:
                flush()
                # reference telemetry (train_itm_hard_negatives.py:228-237):
                # mined hard negatives consumed per second
                dt = time.time() - t_window
                hn = 100 * opts.train_batch_size * opts.hard_neg_size
                TB_LOGGER.add_scalar("perf/hn_per_s", hn / dt, global_step)
                t_window = time.time()
            if opts.valid_steps and global_step % opts.valid_steps == 0:
                flush()
                logs = train_itm.validate_retrieval(
                    model, state.params, val_ds)
                LOGGER.info("step %d: r_mean %.4f",
                            global_step, logs["r_mean"])
                TB_LOGGER.log_scalar_dict(
                    {f"valid/{k}": v for k, v in logs.items()})
                saver.save(global_step, state, block=False)
                last_saved = global_step
            if preempt.poll(sync=global_step % preempt.sync_every == 0):
                flush()
                warn_preempted(global_step, opts.num_train_steps, True)
                break
        # final/preemption save INSIDE the guard: a repeated SIGTERM during
        # the blocking write must not hit the restored default handler and
        # kill the process mid-checkpoint
        flush()
        if last_saved != global_step:
            saver.save(global_step, state)
        else:
            saver.wait()
    it.close()  # release the prefetcher's device buffers
    return state


def get_parser():
    parser = argparse.ArgumentParser()
    driver.add_common_args(parser)
    parser.add_argument("--train_txt_db", type=str)
    parser.add_argument("--train_img_db", type=str)
    parser.add_argument("--train_txt_dbs", type=str, nargs="*", default=None)
    parser.add_argument("--train_img_dbs", type=str, nargs="*", default=None)
    parser.add_argument("--val_txt_db", type=str)
    parser.add_argument("--val_img_db", type=str)
    parser.add_argument("--negative_size", type=int, default=511)
    parser.add_argument("--hard_neg_size", type=int, default=31)
    parser.add_argument("--margin", type=float, default=0.2)
    parser.add_argument("--inf_minibatch_size", type=int, default=400)
    parser.add_argument("--txt_bucket", type=int, default=64)
    parser.add_argument("--img_bucket", type=int, default=64)
    parser.set_defaults(learning_rate=5e-5, num_train_steps=5000,
                        warmup_steps=500, train_batch_size=8)
    return parser


if __name__ == "__main__":
    main(parse_with_config(get_parser()))
