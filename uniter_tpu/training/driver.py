"""Shared fine-tune driver plumbing: common CLI surface, model init +
checkpoint load, mesh/state setup, and the run harness.

Each ``train_*.py`` entry point supplies a small adapter (datasets, model,
loss, validation) and inherits the reference's driver behavior
(train_nlvr2.py:55-276 skeleton): config-JSON CLI, provenance dump, TB
scalars, periodic validation, Orbax checkpoints with resume.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from uniter_tpu.config import UniterConfig
from uniter_tpu.data.buckets import BucketSpec
from uniter_tpu.data.img_db import DetectFeatDb
from uniter_tpu.models import checkpoint as ckpt_lib
from uniter_tpu.parallel.mesh import MeshConfig, make_mesh
from uniter_tpu.training.loop import TrainLoop, place_state
from uniter_tpu.training.optim import build_optimizer
from uniter_tpu.training.sched import get_lr_schedule
from uniter_tpu.training.step import TrainState
from uniter_tpu.utils.logger import LOGGER, TB_LOGGER, add_log_to_file
from uniter_tpu.utils.misc import set_random_seed
from uniter_tpu.utils.save import TrainStateSaver, save_training_meta


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--config", type=str)
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--model_config", type=str)
    parser.add_argument("--output_dir", default=None, type=str)
    parser.add_argument("--compressed_db", action="store_true",
                        help="img DBs use the *_compressed (npz) store "
                             "layout (reference train_vqa.py:316; released "
                             "DBs are uncompressed msgpack)")
    parser.add_argument("--max_txt_len", type=int, default=60)
    parser.add_argument("--conf_th", type=float, default=0.2)
    parser.add_argument("--max_bb", type=int, default=100)
    parser.add_argument("--min_bb", type=int, default=10)
    parser.add_argument("--num_bb", type=int, default=36)
    parser.add_argument("--train_batch_size", type=int, default=4096)
    parser.add_argument("--val_batch_size", type=int, default=4096)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--steps_per_call", type=int, default=1,
                        help="full optimizer steps per jit call (amortizes "
                             "per-step dispatch; +4%% on v5e at 8)")
    parser.add_argument("--learning_rate", type=float, default=3e-5)
    parser.add_argument("--lr_mul", type=float, default=1.0)
    parser.add_argument("--valid_steps", type=int, default=1000)
    parser.add_argument("--log_steps", type=int, default=100)
    parser.add_argument("--num_train_steps", type=int, default=8000)
    parser.add_argument("--optim", default="adamw")
    parser.add_argument("--fused_adamw", type=int, default=1,
                        help="one-pass fused AdamW kernel (leaf-exact vs the "
                             "optax chain; reads/writes each moment once)")
    parser.add_argument("--moment_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="storage dtype for BOTH Adam moments (bfloat16 "
                             "halves optimizer HBM traffic; fp32 arithmetic "
                             "either way; requires --fused_adamw)")
    parser.add_argument("--param_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="storage dtype for LARGE params (embeddings + "
                             "GEMM kernels; LN vectors/biases stay fp32). "
                             "bfloat16 keeps fp32 master weights in the "
                             "fused optimizer (apex-O2 scheme) — halves "
                             "fwd/bwd param reads and gradient traffic; "
                             "requires --fused_adamw")
    parser.add_argument("--wire_codec", default="cast",
                        choices=["cast", "int8"],
                        help="host->device format for img_feat: 'cast' "
                             "ships compute-dtype (bit-exact); 'int8' "
                             "ships per-row int8+scale (1/4 the bytes, "
                             "~0.4%% feature error — for wire-bound hosts)")
    parser.add_argument("--dropout_impl", default="xla",
                        choices=["xla", "u16", "u8"],
                        help="u16: half-traffic 16-bit dropout masks "
                             "(keep-rate quantized to 1/65536)")
    parser.add_argument("--betas", nargs=2, type=float, default=[0.9, 0.98])
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--grad_norm", type=float, default=2.0)
    parser.add_argument("--warmup_steps", type=int, default=800)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--attention_impl", default="auto",
                        choices=["auto", "xla", "pallas", "pallas_nt"],
                        help="auto: fused Pallas kernel on accelerators, "
                             "XLA attention on CPU")
    parser.add_argument("--block_fusion", default="auto",
                        choices=["auto", "none", "pallas"],
                        help="fuse each sub-block dropout+residual+LN tail "
                             "into one kernel (auto: on for accelerators)")
    parser.add_argument("--attn_batch_block", type=int, default=0,
                        help="batch elements per attention-kernel grid step "
                             "(0 = auto: 2 on accelerators — measured +0.6% "
                             "on v5e; >=4 overflows VMEM at base shapes)")
    parser.add_argument("--fp16", action="store_true",
                        help="accepted for config compat; bf16 is used")
    parser.add_argument("--n_workers", type=int, default=4)
    parser.add_argument("--worker_type", default=None,
                        choices=["thread", "process", "shm"],
                        help="decode-worker pool: threads (lmdbx/lz4/numpy "
                             "release the GIL; near-zero IPC), fork "
                             "processes (GIL-proof; shards return pickled) "
                             "or shm (GIL-proof, zero-copy: workers "
                             "collate into a shared-memory ring; host "
                             "reads of a yielded batch must finish within "
                             "4 batches)")
    parser.add_argument("--pin_mem", action="store_true")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of a few hot-loop "
                             "steps here")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize each encoder layer in the "
                             "backward pass (trades ~1/3 more FLOPs for "
                             "activation memory; for uniter-large at long "
                             "buckets / big batches)")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3: shard params + optimizer moments over "
                             "the data axis (for uniter-large scale)")
    parser.add_argument("--fsdp_min_size", type=int, default=2 ** 16,
                        help="smallest param (elements) to FSDP-shard; tiny "
                             "LN vectors stay replicated")
    parser.add_argument("--warmup_compile", action="store_true",
                        help="compile every bucket's program before step 1 "
                             "(avoids mid-training XLA-compile stalls)")
    return parser


def optim_kwargs(opts) -> dict:
    """Shared optimizer options (drivers pass these to build_optimizer)."""
    md = getattr(opts, "moment_dtype", "float32")
    md = jnp.bfloat16 if md == "bfloat16" else None
    fused = bool(getattr(opts, "fused_adamw", 0))
    if md is not None and not fused:
        # the optax chain only supports mu_dtype; both-moment storage needs
        # the fused kernel — fail loudly rather than train something else
        raise ValueError("--moment_dtype bfloat16 requires --fused_adamw 1")
    master = getattr(opts, "param_dtype", "float32") == "bfloat16"
    if master and not fused:
        raise ValueError("--param_dtype bfloat16 requires --fused_adamw 1")
    return dict(
        betas=tuple(opts.betas), weight_decay=opts.weight_decay,
        grad_norm=opts.grad_norm, optim=opts.optim, fused=fused,
        mu_dtype=md, nu_dtype=md, master=master)


def maybe_cast_param_storage(params, opts):
    """--param_dtype bfloat16: cast LARGE param leaves (>= 2**16 elements
    — embeddings and GEMM kernels) to bf16 storage. Small leaves — LN
    weights/biases, biases — stay fp32, mirroring apex O2's fp32-LN
    policy (the reference's training numerics)."""
    if getattr(opts, "param_dtype", "float32") != "bfloat16":
        return params
    min_size = 2 ** 16
    return jax.tree.map(
        lambda p: (p.astype(jnp.bfloat16)
                   if p.size >= min_size and p.dtype == jnp.float32
                   else p),
        params)


def make_train_state(params, tx, opts):
    """TrainState with the optional bf16 param-storage policy: the
    optimizer inits from the ORIGINAL fp32 params (so its fp32 masters
    are exact, not round-tripped through bf16), then the stored params
    cast down."""
    from uniter_tpu.training.step import TrainState

    state = TrainState.create(params, tx)
    return state.replace(params=maybe_cast_param_storage(state.params, opts))


def make_init_batch(b=8, t=16, r=8, img_dim=None, **extras):
    """Tiny all-zero batch for flax param initialization (shapes don't
    matter — params are shape-independent of batch dims)."""
    import jax.numpy as jnp

    from uniter_tpu.utils.const import IMG_DIM as DEFAULT_IMG_DIM

    d = img_dim or DEFAULT_IMG_DIM
    batch = dict(
        input_ids=jnp.zeros((b, t), jnp.int32),
        position_ids=jnp.zeros((b, t), jnp.int32),
        img_feat=jnp.zeros((b, r, d), jnp.float32),
        img_pos_feat=jnp.zeros((b, r, 7), jnp.float32),
        attn_mask=jnp.ones((b, t + r), jnp.int32),
    )
    batch.update(extras)
    return batch


def shard_kw() -> dict:
    """Multi-host dataset sharding (replaces the reference's
    ids[hvd.rank()::hvd.size()], data/data.py:218-225)."""
    return dict(shard_index=jax.process_index(),
                shard_count=jax.process_count())


def open_img_db(path, opts, compress=None, gt=False) -> DetectFeatDb:
    """``compress=None`` resolves from ``opts.compressed_db`` (the
    reference flag on every driver, default False — train_vqa.py:316-317;
    released DBs are uncompressed). ``gt=True``: ground-truth region DBs
    are opened with conf_th=-1 and
    num_bb=100 (the reference's convention everywhere —
    train_vcr.py:105-107, inf_vcr.py:45-47); released vcr_gt_* tars only
    contain the feat_numbb100 store, so detection thresholds would fail to
    resolve it. The reference also detects gt DBs by path
    (train_re.py:42-45 '"gt" in path' / inf_re.py:67 'coco_gt') — mirror
    that so RE's visual-grounding gt DBs open correctly too."""
    if compress is None:
        compress = bool(getattr(opts, "compressed_db", False))
    base = os.path.basename(os.path.normpath(path))
    if "coco_gt" in base or base.endswith("_gt"):
        gt = True
    if gt:
        return DetectFeatDb(
            path, conf_th=-1, max_bb=opts.max_bb, min_bb=opts.min_bb,
            num_bb=100, compress=compress)
    return DetectFeatDb(
        path, conf_th=opts.conf_th, max_bb=opts.max_bb, min_bb=opts.min_bb,
        num_bb=opts.num_bb, compress=compress)


def load_trunk_checkpoint(params, opts, model_cfg, *,
                          n_type_rows: Optional[int] = None,
                          type_copy_row: int = 1,
                          n_special_words: int = 0,
                          extra_map: Optional[Callable] = None):
    """Load the torch checkpoint into the ``uniter`` trunk with the standard
    surgeries (token-type widening, word widening, task-specific extras)."""
    if not opts.checkpoint:
        return params
    sd = ckpt_lib.load_torch_checkpoint(opts.checkpoint)
    flat, missing, consumed = ckpt_lib.uniter_params_from_state_dict(
        sd, model_cfg.num_hidden_layers)
    tt = None
    if n_type_rows is not None:
        tt = flat.pop("embeddings/token_type_embeddings/embedding", None)
    wt = None
    if n_special_words > 0:
        wt = flat.pop("embeddings/word_embeddings/embedding", None)
    params, filled = ckpt_lib.merge_into_params(
        dict(params), flat, prefix="uniter")
    if tt is not None:
        node = params["uniter"]["embeddings"]["token_type_embeddings"]
        new = np.asarray(node["embedding"]).copy()
        new[: tt.shape[0]] = tt
        for i in range(tt.shape[0], n_type_rows):
            new[i] = tt[type_copy_row]
        node["embedding"] = jnp.asarray(new)
    if wt is not None:
        node = params["uniter"]["embeddings"]["word_embeddings"]
        new = np.asarray(node["embedding"]).copy()
        new[: wt.shape[0]] = wt
        node["embedding"] = jnp.asarray(new)
    if extra_map is not None:
        params = extra_map(params, sd)
    LOGGER.info("loaded %d trunk tensors from %s", len(filled),
                opts.checkpoint)
    return params


def model_config_from_opts(opts, **overrides) -> UniterConfig:
    import json as _json

    with open(opts.model_config) as f:
        raw = _json.load(f)  # parsed ONCE; also consulted for explicit keys
    cfg = UniterConfig.from_dict(
        raw, dtype=opts.dtype,
        attention_impl=getattr(opts, "attention_impl", "auto"),
        block_fusion=getattr(opts, "block_fusion", "auto"),
        dropout_impl=getattr(opts, "dropout_impl", "xla"), **overrides)
    if getattr(opts, "remat", False):
        cfg = cfg.replace(remat=True)
    # --dropout overrides both dropout rates (reference utils/misc.py:57-63
    # set_dropout applied by every driver)
    drop = getattr(opts, "dropout", None)
    if drop is not None:
        cfg = cfg.replace(hidden_dropout_prob=drop,
                          attention_probs_dropout_prob=drop)
    # Accelerator auto-policy (each measured on v5e, docs/PERF.md): fully
    # unrolled encoder (+17%), fused Pallas attention, fused sub-block
    # dropout+residual+LN tails (+12%). CPU keeps the scan (compile time)
    # and the XLA reference paths (Pallas needs the TPU PRNG).
    import jax

    from uniter_tpu.config import resolve_kernel_policies

    # attn_batch_block precedence: CLI flag > model-config JSON (explicit
    # key only — the dataclass default of 1 is not a choice) > accelerator
    # default of 2
    abb = (int(getattr(opts, "attn_batch_block", 0) or 0)
           or int(raw.get("attn_batch_block", 0) or 0))
    if jax.default_backend() != "cpu":
        # bc=2 batch elements per attention grid step: +0.6% measured
        # (1927.6 vs 1915.5 ex/s); the kernel clamps to a divisor of B
        cfg = cfg.replace(scan_unroll=cfg.num_hidden_layers,
                          attn_batch_block=abb or 2)
    elif abb:
        cfg = cfg.replace(attn_batch_block=abb)
    return resolve_kernel_policies(cfg)


def setup_run(opts, model_cfg) -> tuple:
    set_random_seed(opts.seed)
    os.makedirs(opts.output_dir, exist_ok=True)
    # persistent XLA compile cache: bucket programs survive across runs
    # (first compiles via remote-compile services take minutes)
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/uniter_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    mesh = make_mesh(MeshConfig(data=-1))
    save_training_meta(opts.output_dir, opts, model_cfg.to_dict())
    TB_LOGGER.create(os.path.join(opts.output_dir, "log"))
    add_log_to_file(os.path.join(opts.output_dir, "log", "log.txt"))
    LOGGER.info("mesh: %s", mesh)
    return mesh


def bucket_spec(opts, mesh, dataset, budget=None) -> BucketSpec:
    dp = mesh.shape["data"]
    rows = getattr(dataset, "rows_per_example", 1)
    # txt buckets must cover max_txt_len + specials (VCR runs at 220+6;
    # capping at the default 128 would silently truncate rationales)
    cap = getattr(opts, "max_txt_len", 60)
    if cap == -1:
        cap = 506
    cap += 6
    txt_buckets = tuple(b for b in (32, 64, 96, 128, 160, 192, 256, 320, 512)
                        if b < cap) + (((cap + 7) // 8) * 8,)
    # img cap from the dataset's real sizes (VCR concatenates gt+det DBs,
    # so the max can exceed a single DB's max_bb)
    try:
        max_r = max(dataset.size_of(i)[1] for i in range(len(dataset)))
    except Exception:
        max_r = opts.max_bb
    max_r = max(max_r, 4)
    img_buckets = tuple(b for b in (20, 40, 64, 100) if b < max_r) + (
        ((max_r + 3) // 4) * 4,)
    return BucketSpec(
        txt_buckets=txt_buckets,
        img_buckets=img_buckets,
        token_budget=budget or opts.train_batch_size,
        size_mul=max(8, dp * rows))


def check_token_range(model_cfg, dataset, n_samples: int = 32):
    """Fail fast on out-of-range ids. The TPU embedding gather clips OOB
    indices to the last table row (XLA semantics) instead of raising like
    torch nn.Embedding — a missing vocab/type widening (VCR's +81 special
    tokens, NLVR2/VCR type rows) would otherwise train silently on wrong
    embeddings. Samples a strided subset of records at startup."""
    import numpy as np

    n = len(dataset)
    if n == 0:
        return
    def deep_max(v):
        # per-choice/paired records nest id lists (VCR, NLVR2)
        if isinstance(v, (list, tuple)):
            vals = [m for m in (deep_max(x) for x in v) if m is not None]
            return max(vals) if vals else None
        arr = np.asarray(v)
        return int(arr.max()) if arr.size else None

    rng = np.random.RandomState(0)
    for i in range(0, n, max(1, n // n_samples)):
        rec = dataset.get_record(i, rng)
        if not isinstance(rec, dict):
            return  # non-dict record shapes: nothing to check here
        m = deep_max(rec.get("input_ids", ()))
        if m is not None and m >= model_cfg.vocab_size:
            raise ValueError(
                f"token id {m} >= vocab_size {model_cfg.vocab_size} "
                f"(record {i}) — missing vocab widening? (VCR needs +81 "
                "special rows; see load_trunk_checkpoint)")
        m = deep_max(rec.get("txt_type_ids", ()))
        if m is not None and m >= model_cfg.type_vocab_size:
            raise ValueError(
                f"type id {m} >= type_vocab_size "
                f"{model_cfg.type_vocab_size} (record {i}) — missing "
                "type-row widening?")


def run_training(opts, *, model, params, loss_fn, train_loader, mesh,
                 validate_fn=None, lr_mul_paths: Sequence[str] = (),
                 loss_scale: str = "sum", best_metric: str = None):
    sched = get_lr_schedule(opts.learning_rate, opts.warmup_steps,
                            opts.num_train_steps)
    tx = build_optimizer(
        params, sched,
        lr_mul=getattr(opts, "lr_mul", 1.0), lr_mul_paths=lr_mul_paths,
        **optim_kwargs(opts))
    state = place_state(make_train_state(params, tx, opts), mesh,
                        fsdp=getattr(opts, "fsdp", False),
                        fsdp_min_size=getattr(opts, "fsdp_min_size", 2 ** 16))
    saver = TrainStateSaver(opts.output_dir)
    restored = saver.restore(state)
    best_value = None
    if restored is not None:
        state = restored
        LOGGER.info("resumed from step %d", int(state.step))
        # only a genuine resume carries the saved best forward; a fresh
        # run in a reused output_dir starts its own max from scratch
        if best_metric:
            info = saver.best_info()
            if info is not None:
                best_value = float(info["value"])
            # the sidecar lives on process 0's disk only; without shared
            # storage, other processes would resume best_value=None and
            # flag 'improved' divergently — take process 0's value
            if jax.process_count() > 1:
                from uniter_tpu.parallel.collectives import all_gather_list

                best_value = all_gather_list(best_value)[0]
    elif best_metric:
        # fresh run in a reused output_dir: clear a previous run's best
        # export so --ckpt best can never resolve to stale weights
        saver.clear_best()
    ds = getattr(train_loader, "dataset", None)
    if ds is not None:
        check_token_range(model.config, ds)
    # bf16 on the wire: the model casts img features to its compute dtype
    # anyway, so transferring them pre-cast halves host->device bytes
    cdt = model.config.compute_dtype
    warmup = None
    if getattr(opts, "warmup_compile", False) and hasattr(
            train_loader, "example_batches"):
        warmup = train_loader.example_batches()
    loop = TrainLoop(
        loss_fn=loss_fn, state=state, train_loader=train_loader, mesh=mesh,
        num_train_steps=opts.num_train_steps,
        gradient_accumulation_steps=opts.gradient_accumulation_steps,
        valid_steps=opts.valid_steps,
        log_steps=getattr(opts, "log_steps", 100),
        validate_fn=validate_fn, saver=saver,
        seed=opts.seed, profile_dir=getattr(opts, "profile_dir", None),
        transfer_dtype=None if cdt == jnp.float32 else cdt,
        wire_codec=(None if getattr(opts, "wire_codec", "cast") == "cast"
                    else opts.wire_codec),
        steps_per_call=getattr(opts, "steps_per_call", 1),
        warmup_batches=warmup, lr_schedule=sched, loss_scale=loss_scale,
        best_metric=best_metric, best_value=best_value)
    state = loop.run()
    LOGGER.info("training finished at step %d", int(state.step))
    if best_metric and loop.best_value is not None:
        info = saver.best_info() or {}
        # reference logs the winning checkpoint at the end
        # (train_re.py:280-282)
        LOGGER.info("best %s = %.4f at step %s", best_metric,
                    loop.best_value, info.get("step", "?"))
    return state
