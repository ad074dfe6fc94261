"""Shared training loops — the reference's driver skeletons as reusable
engines.

``TrainLoop`` is the fine-tune hot loop (train_nlvr2.py:55-276, replicated
in every reference train_*.py); ``MixedTaskLoop`` is the pretraining hot
loop (pretrain.py:255-365, shared with pretrain_vcr.py).

Responsibilities: mesh + state placement (replicated or ZeRO-3/FSDP),
step-based loop over an infinite bucketed loader with device prefetch, LR
scheduling (inside the optax chain), EMA loss meters and the reference's TB
scalar names (``loss``, ``lr``, ``grad_norm``, ``perf/ex_per_s``,
``perf/{task}_{ex,in,loss}_per_s``), periodic validation callbacks, Orbax
train-state checkpointing with resume (which the reference lacked,
utils/save.py:70-73 TODO), graceful SIGTERM preemption (checkpoint + clean
exit, training/preempt.py), and end-of-training weight export.

Metric readback is deferred to the log boundary: calling ``float(loss)``
every step forces a device->host sync that defeats async dispatch (the jit
step returns before the TPU finishes; the readback would block the host
from enqueueing the next step).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from uniter_tpu.parallel.mesh import (
    MeshConfig, batch_sharding, opt_state_sharding, param_sharding_full,
    replicate,
)
from uniter_tpu.training.step import TrainState, make_train_step
from uniter_tpu.utils.logger import LOGGER, RunningMeter, TB_LOGGER


# Deferred readback must still be BOUNDED: XLA:CPU collectives hard-abort
# (rendezvous.cc 40s termination timeout) when a participant thread of an
# in-flight program is starved — which an unbounded async dispatch backlog
# on an oversubscribed host (e.g. the 8-device virtual mesh on 1 vCPU)
# reliably produces on long runs. Once the window fills, force a host
# readback of the OLDEST pending loss: free if that step already finished,
# a dispatch throttle if it hasn't. 16 in-flight steps still hides the
# ~10ms/dispatch relay latency at 30-60ms/step on TPU.
MAX_INFLIGHT_STEPS = int(os.environ.get("UNITER_MAX_INFLIGHT_STEPS", "16"))


def bound_inflight(pending):
    """Cap in-flight step programs by materializing the oldest pending
    loss in place (entries are tuples whose LAST element is the device
    value; flush() accepts the materialized array unchanged)."""
    if MAX_INFLIGHT_STEPS and len(pending) >= MAX_INFLIGHT_STEPS:
        e = pending[0]
        pending[0] = (*e[:-1], np.asarray(e[-1]))


def place_state(state: TrainState, mesh, *, fsdp: bool = False,
                fsdp_min_size: int = 2 ** 16) -> TrainState:
    """Place the train state on the mesh: fully replicated (the reference's
    DP semantics) or ZeRO-3 (params AND Adam moments sharded over 'data';
    moments are 2x the param memory, so sharding only params would defeat
    the point)."""
    if not fsdp:
        return jax.device_put(state, replicate(mesh))
    mcfg = MeshConfig(data=mesh.shape["data"],
                      model=mesh.shape.get("model", 1),
                      fsdp=True, fsdp_min_size=fsdp_min_size)
    psh = param_sharding_full(state.params, mesh, mcfg)
    return state.replace(
        params=jax.device_put(state.params, psh),
        opt_state=jax.device_put(
            state.opt_state,
            opt_state_sharding(state.opt_state, state.tx, psh, mesh)),
        step=jax.device_put(state.step, replicate(mesh)),
    )


def default_prng_key(seed: int):
    """Hardware RNG (rbg) on accelerators — threefry dropout-mask generation
    costs ~25% of a base-model train step on v5e; threefry on CPU for
    deterministic tests."""
    impl = "threefry2x32" if jax.default_backend() == "cpu" else "rbg"
    return jax.random.key(seed, impl=impl)


# Inputs the model immediately casts to its compute dtype (encoder.py
# img_embeddings) — casting them on the host before device_put halves the
# wire bytes with zero numerics change when the model runs bf16. img_feat is
# by far the largest batch field (B x R x 2048 fp32 ~ 31MB at B=96).
TRANSFER_CAST_KEYS = ("img_feat", "img_pos_feat")

# Fields eligible for the int8 wire codec (the dominant wire bytes).
WIRE_INT8_KEYS = ("img_feat",)


def _quantize_wire_int8(v: np.ndarray):
    """Per-row symmetric int8 quantization of [..., D] features: q * scale
    reconstructs v within max|row|/254. Quarters the bf16 wire bytes on
    host->device-limited links (the relay here moves 28-54 MB/s; a real
    host's PCIe does not care). Scales are fp32 [..., 1] — negligible."""
    scale = np.abs(v).max(axis=-1, keepdims=True).astype(np.float32) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.rint(v / scale), -127, 127).astype(np.int8)
    return q, scale


@functools.partial(jax.jit, static_argnames=("dtype_name",))
def _dequant_q8(q, scale, dtype_name: str):
    import jax.numpy as jnp

    dt = jnp.dtype(dtype_name)
    return q.astype(dt) * scale.astype(dt)


def device_put_batch(batch: Dict[str, Any], mesh, accum: bool = False,
                     transfer_dtype=None, local: bool = True,
                     wire_codec: Optional[str] = None):
    """Shard the batch over the mesh's data axis. Accumulation batches are
    [accum, B, ...]: the *second* axis is the batch axis (sharding axis 0
    would split the scan axis across devices). ``transfer_dtype`` casts the
    model-cast float inputs (TRANSFER_CAST_KEYS) before transfer.
    ``wire_codec="int8"`` additionally ships WIRE_INT8_KEYS as per-row
    int8 + scale and dequantizes on device (lossy ~0.4% relative — opt-in
    for wire-bound hosts; the default cast path is bit-exact).

    Multi-process: each host supplies its LOCAL block of the global batch
    (``local=True``, the BucketLoader shard contract) and the global array
    is assembled via make_array_from_process_local_data; ``local=False``
    means every host built the identical full global batch (e.g. the
    hard-negative driver's same-seed candidate batches) and this host's
    block is sliced out first."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = (NamedSharding(mesh, P(None, "data")) if accum
           else batch_sharding(mesh))
    multi = jax.process_count() > 1
    axis = 1 if accum else 0
    dequant = []

    def local_block(k, v):
        """This host's slice of a full-global array (local=False only)."""
        if not (multi and not local):
            return v
        p, n = jax.process_index(), jax.process_count()
        assert v.shape[axis] % n == 0, (
            f"batch axis {v.shape[axis]} ({k}) not divisible by "
            f"{n} processes — rows would be silently dropped")
        blk = v.shape[axis] // n
        sl = [slice(None)] * v.ndim
        sl[axis] = slice(p * blk, (p + 1) * blk)
        return v[tuple(sl)]

    def put_one(v):
        if multi:
            return jax.make_array_from_process_local_data(bsh, v)
        return jax.device_put(v, bsh)

    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            out[k] = v  # host-side metadata (qids etc.) stays put
            continue
        # slice BEFORE any host-side codec work: per-row quantization of
        # the full global candidate batch would do n_processes x the work
        v = local_block(k, v)
        if (wire_codec == "int8" and k in WIRE_INT8_KEYS
                and np.issubdtype(v.dtype, np.floating)):
            # any float source (r4 collates carry the stores' fp16)
            q, scale = _quantize_wire_int8(v)
            out[k] = (put_one(q), put_one(scale))
            dequant.append(k)
            continue
        if (transfer_dtype is not None and k in TRANSFER_CAST_KEYS
                and np.issubdtype(v.dtype, np.floating)
                and v.dtype.itemsize > np.dtype(transfer_dtype).itemsize):
            # cast only when it SHRINKS wire bytes (fp32 -> bf16); fp16
            # sources already ship at 2 bytes — the model's compute-dtype
            # cast runs on device for free
            v = v.astype(transfer_dtype)
        out[k] = put_one(v)
    for k in dequant:
        q, scale = out[k]
        dt = np.dtype(transfer_dtype) if transfer_dtype is not None \
            else np.dtype(np.float32)
        out[k] = _dequant_q8(q, scale, dtype_name=dt.name)
    return out


def jnp_batch(batch):
    return {k: v for k, v in batch.items() if isinstance(v, (np.ndarray,))}


def _crossed(step: int, k: int, every: int) -> bool:
    """True when [step-k, step] crossed a multiple of ``every`` (with
    steps_per_call k > 1, exact equality would skip boundaries that are not
    multiples of k)."""
    return step // every > (step - k) // every


def _clamp_profile(profile_steps, num_train_steps):
    """Fit the profiled step window inside the run (short smoke runs would
    otherwise never hit the default 10-15 window)."""
    start, stop = profile_steps
    stop = min(stop, max(num_train_steps - 2, 0))
    start = min(start, max(stop - 1, 0))
    return (start, stop)


def warn_preempted(step: int, total: int, has_saver: bool):
    """Shared preemption exit message (TrainLoop / MixedTaskLoop / the
    hard-negative driver's bespoke loop)."""
    if has_saver:
        LOGGER.warning(
            "preempted at step %d/%d — saving resumable checkpoint and "
            "exiting (rerun the same command to resume)", step, total)
    else:
        LOGGER.warning(
            "preempted at step %d/%d — exiting WITHOUT a checkpoint "
            "(no saver configured)", step, total)


class NanGuard:
    """Abort after ``limit`` consecutive non-finite losses (checked at flush
    boundaries on the deferred values; the last good checkpoint stays
    resumable)."""

    def __init__(self, limit: int = 5):
        self.limit = limit
        self.streak = 0

    def check(self, loss_val: float, step: int):
        if np.isfinite(loss_val):
            self.streak = 0
            return
        self.streak += 1
        LOGGER.warning("non-finite loss at step %d (%d consecutive)",
                       step, self.streak)
        if self.streak >= self.limit:
            raise FloatingPointError(
                f"loss non-finite for {self.streak} consecutive steps at "
                f"step {step} — aborting (last good checkpoint is resumable)")


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
        transfer_dtype=None,
        wire_codec: Optional[str] = None,
        steps_per_call: int = 1,
        warmup_batches=None,
        preempt=True,
        lr_schedule=None,
        best_metric: Optional[str] = None,
        best_value: Optional[float] = None,
    ):
        self.loss_fn = loss_fn
        self.state = state
        self.train_loader = train_loader
        self._base_loader = train_loader  # pre-wrap ref for resume skip
        self.mesh = mesh
        self.num_train_steps = num_train_steps
        self.accum = gradient_accumulation_steps
        self.valid_steps = valid_steps
        self.log_steps = log_steps
        self.validate_fn = validate_fn
        self.saver = saver
        # best-checkpoint tracking on a validation metric (reference
        # train_re.py:259-263). best_value seeds the running max — a
        # RESUMED run passes the sidecar value so it never regresses the
        # saved best; a fresh run must pass None (stale best files in a
        # reused output_dir would otherwise suppress the new run's best)
        self.best_metric = best_metric
        self.best_value = best_value
        self.rng = default_prng_key(seed)
        self.profile_dir = profile_dir
        self.profile_steps = _clamp_profile(profile_steps, num_train_steps)
        self.prefetch = prefetch
        self.transfer_dtype = transfer_dtype
        self.wire_codec = wire_codec
        self.k = steps_per_call
        if self.k > 1 and num_train_steps % self.k:
            LOGGER.warning(
                "steps_per_call=%d does not divide num_train_steps=%d: the "
                "run stops at step %d (use k=1 for exact-step parity)",
                self.k, num_train_steps,
                ((num_train_steps + self.k - 1) // self.k) * self.k)
        if self.accum > 1 or self.k > 1:
            from uniter_tpu.data.loader import AccumLoader

            # stacks accum (or steps_per_call) same-shape batches into one
            # [k, B, ...] array batch
            self.train_loader = AccumLoader(train_loader,
                                            max(self.accum, self.k))
        self.warmup_batches = warmup_batches
        self.lr_schedule = lr_schedule
        from uniter_tpu.training.preempt import PreemptionGuard

        self.preempt = (PreemptionGuard() if preempt is True
                        else (preempt or None))
        self.preempted = False
        self.step_fn = make_train_step(
            loss_fn, mesh=mesh, loss_scale=loss_scale,
            accum_steps=self.accum, steps_per_call=self.k)

    def _warmup(self, state):
        """Compile every bucket's program up front: on TPU a new (T, R)
        bucket appearing mid-training stalls the run for a full XLA compile
        (minutes through remote-compile services). Runs one throwaway step
        per bucket shape against a copied state (populating the jit cache)."""
        import jax.numpy as jnp

        t0 = time.time()
        for hb in self.warmup_batches:
            jb = jnp_batch(hb)
            if self.accum > 1 or self.k > 1:
                n = max(self.accum, self.k)
                jb = {k: np.broadcast_to(v, (n,) + v.shape)
                      for k, v in jb.items()}
            jb = (device_put_batch(jb, self.mesh,
                                   accum=self.accum > 1 or self.k > 1,
                                   transfer_dtype=self.transfer_dtype,
                                   wire_codec=self.wire_codec)
                  if self.mesh is not None
                  else {k: jnp.asarray(v) for k, v in jb.items()})
            state_copy = jax.tree.map(jnp.array, state)
            out_state, m = self.step_fn(state_copy, jb, self.rng)
            del out_state, m
        LOGGER.info("warmed up %d bucket programs in %.1fs",
                    len(self.warmup_batches), time.time() - t0)

    def run(self):
        try:
            if self.preempt is not None:
                with self.preempt:
                    return self._run()
            return self._run()
        finally:
            it = getattr(self, "_it", None)
            if it is not None and hasattr(it, "close"):
                it.close()  # release the prefetcher's device buffers
            self._it = None

    def _run(self):
        state = self.state
        meter = RunningMeter("loss")
        guard = NanGuard()
        if self.warmup_batches:
            self._warmup(state)
            self.warmup_batches = None
        start_step = int(state.step)
        if start_step > 0:
            LOGGER.info("resuming from step %d", start_step)
            # fast-forward the data stream to where the interrupted run
            # stopped — otherwise the resumed run silently replays batches
            # 0..start_step. One stacked batch serves k steps; AccumLoader
            # owns the stacked->base conversion.
            if hasattr(self._base_loader, "skip_batches"):
                self.train_loader.skip_batches(start_step // self.k)
                LOGGER.info("fast-forwarded train loader to step %d",
                            start_step)
            if self.profile_dir is not None:
                span = self.profile_steps[1] - self.profile_steps[0]
                self.profile_steps = (start_step + 2,
                                      start_step + 2 + span)
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
                        device_put_batch(
                            jnp_batch(batch), self.mesh,
                            accum=self.accum > 1 or self.k > 1,
                            transfer_dtype=self.transfer_dtype,
                            wire_codec=self.wire_codec))

            it = DevicePrefetcher(iter(self.train_loader), put,
                                  depth=self.prefetch)
            self._it = it
        else:
            it = (
                (host_weight(b),
                 device_put_batch(jnp_batch(b), self.mesh,
                                  accum=self.accum > 1 or self.k > 1,
                                  transfer_dtype=self.transfer_dtype,
                                  wire_codec=self.wire_codec)
                 if self.mesh is not None else jnp_batch(b))
                for b in self.train_loader
            )
        global_step = start_step
        last_saved = -1
        pending = []  # (first step, loss scalar or [k]) — flushed at boundaries

        def flush():
            for s0, dev_loss in pending:
                for j, v in enumerate(np.asarray(dev_loss).reshape(-1)):
                    guard.check(float(v), s0 + j)
                    meter(float(v))
            pending.clear()

        profiling = False
        while global_step < self.num_train_steps:
            n_ex, jb = next(it)
            n_examples += n_ex
            if (self.profile_dir is not None and not profiling
                    and global_step >= self.profile_steps[0]):
                jax.profiler.start_trace(self.profile_dir)
                profiling = True
            # base key only — the step folds in state.step itself
            state, metrics = self.step_fn(state, jb, self.rng)
            pending.append((global_step + 1, metrics["loss"]))
            bound_inflight(pending)
            global_step += self.k  # == int(state.step) without a device sync
            if (self.profile_dir is not None and profiling
                    and global_step > self.profile_steps[1]):
                # host readback: block_until_ready does not fence on the
                # remote TPU relay (CLAUDE.md)
                _ = np.asarray(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                self.profile_dir = None
                LOGGER.info("profiler trace written")
            if _crossed(global_step, self.k, self.log_steps):
                flush()
                ex_per_s = n_examples / (time.time() - t_start)
                TB_LOGGER.add_scalar("loss", meter.val, global_step)
                TB_LOGGER.add_scalar(
                    "grad_norm", float(metrics["grad_norm"]), global_step)
                if self.lr_schedule is not None:
                    # reference logs the live lr each window
                    # (train_nlvr2.py:196-198)
                    TB_LOGGER.add_scalar(
                        "lr", float(self.lr_schedule(global_step)),
                        global_step)
                TB_LOGGER.add_scalar("perf/ex_per_s", ex_per_s, global_step)
                LOGGER.info(
                    "step %d/%d loss %.4f (%.1f ex/s)",
                    global_step, self.num_train_steps, meter.val or 0.0,
                    ex_per_s)
            if self.valid_steps and _crossed(global_step, self.k,
                                             self.valid_steps):
                flush()
                improved = None
                if self.validate_fn is not None:
                    logs = self.validate_fn(state, global_step)
                    if logs:
                        TB_LOGGER.log_scalar_dict(
                            {f"valid/{k}": v for k, v in logs.items()},
                            step=global_step)
                    if (self.best_metric and logs
                            and self.best_metric in logs
                            and self.saver is not None
                            and hasattr(self.saver, "best_info")):
                        v = float(logs[self.best_metric])
                        if self.best_value is None or v > self.best_value:
                            self.best_value = improved = v
                if self.saver is not None:
                    # async: overlap disk write/finalize with training;
                    # a val-metric improvement rides the same host
                    # snapshot as model_step_best (no second gather)
                    kw = {"best_value": improved} if improved is not None \
                        else {}
                    self.saver.save(global_step, state, block=False, **kw)
                    last_saved = global_step
            if self.preempt is not None and self.preempt.poll(
                    sync=_crossed(global_step, self.k,
                                  self.preempt.sync_every)):
                flush()
                self.preempted = True
                warn_preempted(global_step, self.num_train_steps,
                               self.saver is not None)
                break
        flush()
        if profiling:
            jax.profiler.stop_trace()
        assert global_step == int(state.step)
        if self.saver is not None:
            if last_saved != global_step:
                self.saver.save(global_step, state)
            elif hasattr(self.saver, "wait"):
                self.saver.wait()  # make the last async save durable
        self.state = state
        return state


def pretrain_loss_units(task: str, batch) -> int:
    """Per-task loss-unit counts (the reference's n_loss_units,
    pretrain.py:266-293): masked tokens (mlm), masked regions (mrm),
    examples (itm). Shared by pretrain.py and pretrain_vcr.py."""
    if task == "mlm":
        return int((batch["mlm_tgt"] != -1).sum())
    if task.startswith("mr"):
        return int(batch["mrm_valid"].sum())
    return int(batch["ex_weight"].sum())


class MixedTaskLoop:
    """Pretraining hot loop (reference pretrain.py:255-365): mixed-task
    batches from a MetaLoader, one compiled step per task, mesh-sharded
    batches with device prefetch, per-task loss meters and throughput
    telemetry (``perf/{task}_ex_per_s``, ``_in_per_s``, ``_loss_per_s`` —
    reference pretrain.py:343-356), deferred metric readback, periodic
    validation + Orbax checkpointing."""

    def __init__(
        self,
        *,
        meta: Iterable,  # yields (name, batch) forever
        get_step: Callable[[str], Callable],  # task -> jitted step
        state: TrainState,
        mesh,
        num_train_steps: int,
        valid_steps: int = 1000,
        log_steps: int = 100,
        validate_fn: Optional[Callable] = None,  # (state, step) -> dict
        saver=None,
        seed: int = 0,
        accum: bool = False,
        loss_units_fn: Optional[Callable] = None,  # (task, batch) -> int
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (10, 15),
        prefetch: int = 2,
        transfer_dtype=None,
        wire_codec: Optional[str] = None,
        preempt=True,
        lr_schedule=None,
    ):
        self.meta = meta
        self.lr_schedule = lr_schedule
        self.get_step = get_step
        self.state = state
        self.mesh = mesh
        self.num_train_steps = num_train_steps
        self.valid_steps = valid_steps
        self.log_steps = log_steps
        self.validate_fn = validate_fn
        self.saver = saver
        self.rng = default_prng_key(seed)
        self.accum = accum
        self.loss_units_fn = loss_units_fn
        self.profile_dir = profile_dir
        self.profile_steps = _clamp_profile(profile_steps, num_train_steps)
        self.prefetch = prefetch
        self.transfer_dtype = transfer_dtype
        self.wire_codec = wire_codec
        self._profiling = False
        from uniter_tpu.training.preempt import PreemptionGuard

        self.preempt = (PreemptionGuard() if preempt is True
                        else (preempt or None))
        self.preempted = False

    def _counters(self, name, batch):
        n_ex = int(batch["ex_weight"].sum()) if "ex_weight" in batch else int(
            batch["input_ids"].shape[0])
        n_in = int(batch["attn_mask"].sum()) if "attn_mask" in batch else n_ex
        task = name.split("_")[0]
        n_loss = (int(self.loss_units_fn(task, batch))
                  if self.loss_units_fn is not None else n_ex)
        return n_ex, n_in, n_loss

    def run(self):
        try:
            if self.preempt is not None:
                with self.preempt:
                    return self._run()
            return self._run()
        finally:
            it = getattr(self, "_it", None)
            if it is not None and hasattr(it, "close"):
                it.close()  # release the prefetcher's device buffers
            self._it = None

    def _run(self):
        state = self.state
        guard = NanGuard()
        task2loss: Dict[str, RunningMeter] = {}
        n_examples: Dict[str, int] = {}
        n_in_units: Dict[str, int] = {}
        n_loss_units: Dict[str, int] = {}
        t_start = time.time()
        global_step = int(state.step)
        last_saved = -1
        if global_step > 0:
            LOGGER.info("resuming from step %d", global_step)
            # fast-forward the mixed-task stream: replay the task draws and
            # skip each task loader's consumed batches (no record fetches)
            if hasattr(self.meta, "skip_steps"):
                self.meta.skip_steps(global_step)
                LOGGER.info("fast-forwarded task mix by %d steps",
                            global_step)
            if self.profile_dir is not None:
                span = self.profile_steps[1] - self.profile_steps[0]
                self.profile_steps = (global_step + 2,
                                      global_step + 2 + span)

        def put(item):
            name, batch = item
            return (name, self._counters(name, batch),
                    device_put_batch(jnp_batch(batch), self.mesh,
                                     accum=self.accum,
                                     transfer_dtype=self.transfer_dtype,
                                     wire_codec=self.wire_codec))

        if self.prefetch > 0:
            from uniter_tpu.data.loader import DevicePrefetcher

            it = DevicePrefetcher(iter(self.meta), put, depth=self.prefetch)
            self._it = it
        else:
            it = (put(item) for item in iter(self.meta))

        pending = []  # (step, name, loss device scalar)

        def flush():
            for s, name, dev_loss in pending:
                val = float(dev_loss)
                guard.check(val, s)
                task2loss.setdefault(
                    name, RunningMeter(f"loss/{name}"))(val)
            pending.clear()

        while global_step < self.num_train_steps:
            name, (n_ex, n_in, n_loss), jb = next(it)
            task = name.split("_")[0]
            n_examples[name] = n_examples.get(name, 0) + n_ex
            n_in_units[name] = n_in_units.get(name, 0) + n_in
            n_loss_units[name] = n_loss_units.get(name, 0) + n_loss
            if (self.profile_dir is not None and not self._profiling
                    and global_step >= self.profile_steps[0]):
                jax.profiler.start_trace(self.profile_dir)
                self._profiling = True
            # base key only — the step folds in state.step itself
            state, metrics = self.get_step(task)(state, jb, self.rng)
            global_step += 1
            pending.append((global_step, name, metrics["loss"]))
            bound_inflight(pending)
            if (self.profile_dir is not None and self._profiling
                    and global_step > self.profile_steps[1]):
                _ = np.asarray(metrics["loss"])  # host readback fence
                jax.profiler.stop_trace()
                self._profiling = False
                self.profile_dir = None
                LOGGER.info("profiler trace written")
            if global_step % self.log_steps == 0:
                flush()
                dt = time.time() - t_start
                TB_LOGGER.log_scalar_dict(
                    {m.name: m.val for m in task2loss.values()
                     if m.val is not None}, step=global_step)
                if self.lr_schedule is not None:
                    TB_LOGGER.add_scalar(
                        "lr", float(self.lr_schedule(global_step)),
                        global_step)
                # reference logs grad_norm every window (pretrain.py:330-332)
                TB_LOGGER.add_scalar(
                    "grad_norm", float(metrics["grad_norm"]), global_step)
                tot_ex = sum(n_examples.values())
                TB_LOGGER.add_scalar(
                    "perf/ex_per_s", tot_ex / dt, global_step)
                for t_name in n_examples:
                    TB_LOGGER.add_scalar(
                        f"perf/{t_name}_ex_per_s",
                        n_examples[t_name] / dt, global_step)
                    TB_LOGGER.add_scalar(
                        f"perf/{t_name}_in_per_s",
                        n_in_units[t_name] / dt, global_step)
                    TB_LOGGER.add_scalar(
                        f"perf/{t_name}_loss_per_s",
                        n_loss_units[t_name] / dt, global_step)
                LOGGER.info(
                    "step %d/%d (%.0f ex/s) %s", global_step,
                    self.num_train_steps, tot_ex / dt,
                    {m.name: round(m.val, 4) for m in task2loss.values()
                     if m.val is not None})
            if self.valid_steps and global_step % self.valid_steps == 0:
                flush()
                if self.validate_fn is not None:
                    logs = self.validate_fn(state, global_step)
                    if logs:
                        LOGGER.info("step %d validation: %s",
                                    global_step, logs)
                        TB_LOGGER.log_scalar_dict(
                            {f"valid/{k}": v for k, v in logs.items()},
                            step=global_step)
                if self.saver is not None:
                    # async: overlap disk write/finalize with training
                    self.saver.save(global_step, state, block=False)
                    last_saved = global_step
            if self.preempt is not None and self.preempt.poll(
                    sync=global_step % self.preempt.sync_every == 0):
                flush()
                self.preempted = True
                warn_preempted(global_step, self.num_train_steps,
                               self.saver is not None)
                break
        flush()
        if self._profiling:
            jax.profiler.stop_trace()
        assert global_step == int(state.step)
        if self.saver is not None:
            if last_saved != global_step:
                self.saver.save(global_step, state)
            elif hasattr(self.saver, "wait"):
                self.saver.wait()  # make the last async save durable
        self.state = state
        return state
