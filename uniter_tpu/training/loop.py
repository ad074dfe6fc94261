"""Shared fine-tune training loop — the reference's driver skeleton
(train_nlvr2.py:55-276, replicated in every train_*.py) as one reusable
engine.

Responsibilities: mesh + state placement, step-based loop over an infinite
bucketed loader, LR scheduling (inside the optax chain), EMA loss meters and
the reference's TB scalar names (``loss``, ``lr``, ``grad_norm``,
``perf/ex_per_s``), periodic validation callbacks, Orbax train-state
checkpointing with resume (which the reference lacked, utils/save.py:70-73
TODO), and end-of-training weight export.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from uniter_tpu.parallel.mesh import batch_sharding, replicate
from uniter_tpu.training.step import TrainState, make_train_step
from uniter_tpu.utils.logger import LOGGER, RunningMeter, TB_LOGGER


def place_state(state: TrainState, mesh) -> TrainState:
    rep = replicate(mesh)
    return jax.device_put(state, rep)


def default_prng_key(seed: int):
    """Hardware RNG (rbg) on accelerators — threefry dropout-mask generation
    costs ~25% of a base-model train step on v5e; threefry on CPU for
    deterministic tests."""
    impl = "threefry2x32" if jax.default_backend() == "cpu" else "rbg"
    return jax.random.key(seed, impl=impl)


def device_put_batch(batch: Dict[str, Any], mesh):
    bsh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, bsh)
        else:
            out[k] = v  # host-side metadata (qids etc.) stays put
    return out


def jnp_batch(batch):
    return {k: v for k, v in batch.items() if isinstance(v, (np.ndarray,))}


class TrainLoop:
    def __init__(
        self,
        *,
        loss_fn: Callable,  # (params, batch, rng) -> (scalar, metrics)
        state: TrainState,
        train_loader: Iterable,
        mesh=None,
        num_train_steps: int,
        gradient_accumulation_steps: int = 1,
        valid_steps: int = 1000,
        log_steps: int = 100,
        validate_fn: Optional[Callable] = None,  # (state, step) -> dict
        saver=None,
        seed: int = 0,
        loss_scale: str = "sum",
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (10, 15),
        prefetch: int = 2,
    ):
        self.loss_fn = loss_fn
        self.state = state
        self.train_loader = train_loader
        self.mesh = mesh
        self.num_train_steps = num_train_steps
        self.accum = gradient_accumulation_steps
        self.valid_steps = valid_steps
        self.log_steps = log_steps
        self.validate_fn = validate_fn
        self.saver = saver
        self.rng = default_prng_key(seed)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self.prefetch = prefetch
        if self.accum > 1:
            from uniter_tpu.data.loader import AccumLoader

            self.train_loader = AccumLoader(train_loader, self.accum)
        self.step_fn = make_train_step(
            loss_fn, mesh=mesh, loss_scale=loss_scale,
            accum_steps=self.accum)

    def run(self):
        state = self.state
        meter = RunningMeter("loss")
        start_step = int(state.step)
        if start_step > 0:
            LOGGER.info("resuming from step %d", start_step)
        n_examples = 0
        t_start = time.time()
        def host_weight(batch):
            return int(batch.get(
                "ex_weight", np.ones(batch["input_ids"].shape[:1])).sum())

        if self.prefetch > 0 and self.mesh is not None:
            # overlap host->device transfer with compute (the reference's
            # CUDA-stream PrefetchLoader role, data/loader.py:87-142)
            from uniter_tpu.data.loader import DevicePrefetcher

            def put(batch):
                return (host_weight(batch),
                        device_put_batch(jnp_batch(batch), self.mesh))

            it = DevicePrefetcher(iter(self.train_loader), put,
                                  depth=self.prefetch)
        else:
            it = (
                (host_weight(b),
                 device_put_batch(jnp_batch(b), self.mesh)
                 if self.mesh is not None else jnp_batch(b))
                for b in self.train_loader
            )
        global_step = start_step
        while global_step < self.num_train_steps:
            n_ex, jb = next(it)
            n_examples += n_ex
            self.rng, sub = jax.random.split(self.rng)
            if (self.profile_dir is not None
                    and global_step == self.profile_steps[0]):
                jax.profiler.start_trace(self.profile_dir)
            state, metrics = self.step_fn(state, jb, sub)
            if (self.profile_dir is not None
                    and global_step == self.profile_steps[1]):
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                LOGGER.info("profiler trace written to %s", self.profile_dir)
            global_step = int(state.step)
            loss_val = float(metrics["loss"])
            if not np.isfinite(loss_val):
                self._nan_streak = getattr(self, "_nan_streak", 0) + 1
                LOGGER.warning("non-finite loss at step %d (%d consecutive)",
                               global_step, self._nan_streak)
                if self._nan_streak >= 5:
                    raise FloatingPointError(
                        f"loss non-finite for {self._nan_streak} consecutive "
                        f"steps at step {global_step} — aborting (last good "
                        f"checkpoint is resumable)")
            else:
                self._nan_streak = 0
            meter(loss_val)
            if global_step % self.log_steps == 0:
                ex_per_s = n_examples / (time.time() - t_start)
                TB_LOGGER.add_scalar("loss", meter.val, global_step)
                TB_LOGGER.add_scalar(
                    "grad_norm", float(metrics["grad_norm"]), global_step)
                TB_LOGGER.add_scalar("perf/ex_per_s", ex_per_s, global_step)
                LOGGER.info(
                    "step %d/%d loss %.4f (%.1f ex/s)",
                    global_step, self.num_train_steps, meter.val or 0.0,
                    ex_per_s)
            if self.valid_steps and global_step % self.valid_steps == 0:
                if self.validate_fn is not None:
                    logs = self.validate_fn(state, global_step)
                    if logs:
                        TB_LOGGER.log_scalar_dict(
                            {f"valid/{k}": v for k, v in logs.items()},
                            step=global_step)
                if self.saver is not None:
                    self.saver.save(global_step, state)
        if self.saver is not None and int(state.step) % max(
                self.valid_steps, 1) != 0:
            self.saver.save(int(state.step), state)
        self.state = state
        return state
