"""Pretrain hot-loop per-task bench on the real TPU (VERDICT r3 #2).

Times one compiled train step per pretraining task (mlm / mrfr / mrc-kl /
itm with and without the OT loss) at the flagship pretrain shape
B=48, T=160, R=64 (S=224 — the reference's in-domain recipe scale,
config/pretrain-indomain-base-8gpu.json) with the production step
construction (pretrain.py get_step: scalar_loss + loss_scale="sum").

The itm-vs-itm_no_ot delta isolates the 50-iteration IPOT scan
(ops/ot.py:26-67, the reference's second hot loop — model/ot.py:35-67,
pretrain.py:298): both configs pay identical dispatch and encoder cost
through the relay, so the difference is the OT kernel itself.

Usage: python scripts/bench_pretrain_tpu.py   (real TPU, no env overrides)
Appends JSON lines to /tmp/bench_pretrain_tpu.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

B, T, R = 48, 160, 64
M_TXT = 24   # mlm slots (~15% of T)
M_IMG = 12   # mrm slots (~15% of R)
IMG_DIM, IMG_LABEL_DIM = 2048, 1601
K = int(os.environ.get("UNITER_BENCH_STEPS_PER_CALL", "8"))

TASKS = ["mlm", "mrfr", "mrc-kl", "itm", "itm_no_ot", "itm_ot_xla"]


def make_batch(task, rng, b=None, t=None, r=None, m_txt=None, m_img=None,
               img_dim=None, label_dim=None, vocab=28000):
    import jax.numpy as jnp

    b, t, r = b or B, t or T, r or R
    m_txt, m_img = m_txt or M_TXT, m_img or M_IMG
    img_dim, label_dim = img_dim or IMG_DIM, label_dim or IMG_LABEL_DIM
    batch = dict(
        input_ids=jnp.asarray(rng.randint(1, vocab, (b, t)), jnp.int32),
        position_ids=jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32), (b, t)),
        img_feat=jnp.asarray(rng.randn(b, r, img_dim).astype(np.float32)),
        img_pos_feat=jnp.asarray(rng.rand(b, r, 7).astype(np.float32)),
        attn_mask=jnp.ones((b, t + r), jnp.int32),
    )
    if task == "mlm":
        batch["mlm_pos"] = jnp.asarray(
            np.sort(rng.choice(t, (b, m_txt), replace=True), -1), jnp.int32)
        batch["mlm_tgt"] = jnp.asarray(
            rng.randint(1, vocab, (b, m_txt)), jnp.int32)
    elif task in ("mrfr", "mrc-kl"):
        batch["mrm_pos"] = jnp.asarray(
            np.sort(rng.choice(r, (b, m_img), replace=True), -1), jnp.int32)
        batch["mrm_valid"] = jnp.ones((b, m_img), np.float32)
        if task == "mrfr":
            batch["feat_targets"] = jnp.asarray(
                rng.randn(b, m_img, img_dim).astype(np.float32))
        else:
            soft = rng.rand(b, m_img, label_dim).astype(np.float32)
            batch["label_targets"] = jnp.asarray(
                soft / soft.sum(-1, keepdims=True))
    else:  # itm variants
        batch["targets"] = jnp.asarray(
            rng.randint(0, 2, (b,)), jnp.int32)
    return batch


# the reference's in-domain mix MLM:ITM:MRFR:MRC = 2:2:1:1
# (config/pretrain-indomain-base-8gpu.json mix_ratio) as a repeating cycle
MIX_CYCLE = ("mlm", "itm", "mlm", "itm", "mrfr", "mrc-kl")


def run_mix(b=B, t=T, r=R, k=K, tiny=False, ot_lambda=0.1, n_cycles=2):
    """Mixed-task pretrain throughput (examples/sec/chip): one compiled
    step per task (pretrain.py get_step), tasks dispatched in the
    reference's 2:2:1:1 in-domain ratio, k same-task steps per relay call
    (the MixedTaskLoop's steps_per_call grouping). Returns delivered ex/s
    over full ratio cycles — the MetaLoader-stream rate bench.py guards
    (VERDICT r4 #3)."""
    import jax
    import jax.numpy as jnp

    from uniter_tpu.config import base_config, tiny_config
    from uniter_tpu.models.pretrain import UniterForPretraining
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.sched import get_lr_schedule
    from uniter_tpu.training.step import TrainState, make_train_step

    if tiny:
        cfg = tiny_config(dtype="bfloat16", attention_impl="xla",
                          scan_unroll=2, block_fusion="none")
        img_dim, label_dim, vocab = 32, 17, 500
        m_txt, m_img = 4, 2
    else:
        cfg = base_config(dtype="bfloat16", attention_impl="pallas",
                          scan_unroll=12, block_fusion="pallas",
                          attn_batch_block=int(os.environ.get(
                              "UNITER_BENCH_ATTN_BB", "2")))
        img_dim, label_dim, vocab = IMG_DIM, IMG_LABEL_DIM, 28000
        m_txt = max(1, round(t * 0.15))
        m_img = max(1, round(r * 0.15))
    model = UniterForPretraining(cfg, img_dim=img_dim,
                                 img_label_dim=label_dim)
    kw = dict(b=b, t=t, r=r, m_txt=m_txt, m_img=m_img, img_dim=img_dim,
              label_dim=label_dim, vocab=vocab)
    rng_np = np.random.RandomState(0)
    init_batch = {}
    for task in ("mlm", "mrfr", "mrc-kl", "itm"):
        init_batch.update(make_batch(task, rng_np, **kw))
    params = model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                        method=UniterForPretraining.init_all)["params"]
    tx = build_optimizer(params, get_lr_schedule(5e-5, 500, 5000),
                         grad_norm=2.0, weight_decay=0.01, fused=True,
                         mu_dtype=None, nu_dtype=None)
    state = TrainState.create(params, tx)
    rng = jax.random.key(1, impl="rbg")

    steps, batches = {}, {}
    for task in sorted(set(MIX_CYCLE)):
        def loss_fn(p, batch, r_, _task=task):
            scalar, metrics = model.apply(
                {"params": p}, batch, _task,
                ot_lambda=ot_lambda if _task == "itm" else 0.0,
                deterministic=False, rngs={"dropout": r_},
                method=UniterForPretraining.scalar_loss)
            return scalar, metrics

        steps[task] = make_train_step(loss_fn, loss_scale="mean",
                                      steps_per_call=k)
        batch = make_batch(task, np.random.RandomState(1), **kw)
        if k > 1:
            batch = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (k,) + x.shape), batch)
        batches[task] = batch

    def cycle(state):
        for task in MIX_CYCLE:
            state, metrics = steps[task](state, batches[task], rng)
        return state, metrics

    state, metrics = cycle(state)  # compile all four programs
    assert np.isfinite(float(np.asarray(metrics["loss"]).reshape(-1)[-1]))
    t0 = time.perf_counter()
    for _ in range(n_cycles):
        state, metrics = cycle(state)
    _ = float(np.asarray(metrics["loss"]).reshape(-1)[-1])  # relay fence
    dt = time.perf_counter() - t0
    return n_cycles * len(MIX_CYCLE) * k * b / dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
    import jax.numpy as jnp  # noqa: F401

    from uniter_tpu.config import base_config
    from uniter_tpu.models.pretrain import UniterForPretraining
    from uniter_tpu.training.optim import build_optimizer
    from uniter_tpu.training.sched import get_lr_schedule
    from uniter_tpu.training.step import TrainState, make_train_step

    cfg = base_config(dtype="bfloat16", attention_impl="pallas",
                      scan_unroll=12, block_fusion="pallas",
                      attn_batch_block=int(os.environ.get(
                          "UNITER_BENCH_ATTN_BB", "2")))
    model = UniterForPretraining(cfg, img_dim=IMG_DIM,
                                 img_label_dim=IMG_LABEL_DIM)
    rng_np = np.random.RandomState(0)
    init_batch = {**make_batch("mlm", rng_np), **make_batch("mrfr", rng_np),
                  **make_batch("mrc-kl", rng_np), **make_batch("itm", rng_np)}
    params = model.init({"params": jax.random.PRNGKey(0)}, init_batch,
                        method=UniterForPretraining.init_all)["params"]
    tx = build_optimizer(params, get_lr_schedule(5e-5, 500, 5000),
                         grad_norm=2.0, weight_decay=0.01, fused=True,
                         mu_dtype=None, nu_dtype=None)
    state0 = TrainState.create(params, tx)
    # the train step DONATES its state argument; hand each task a fresh
    # device-side copy so state0 (and the params aliased inside it)
    # survives all six tasks (one jit -> one relay dispatch per task)
    copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
    rng = jax.random.key(1, impl="rbg")
    out_path = "/tmp/bench_pretrain_tpu.jsonl"

    for name in TASKS:
        task = "itm" if name.startswith("itm") else name
        ot_lambda = 0.0 if name == "itm_no_ot" else (
            0.1 if name.startswith("itm") else 0.0)
        # itm = fused Pallas IPOT kernel (the accelerator default);
        # itm_ot_xla = the lax.scan reference for the A/B
        if name == "itm_ot_xla":
            os.environ["UNITER_OT_IMPL"] = "xla"
        else:
            os.environ.pop("UNITER_OT_IMPL", None)

        def loss_fn(p, batch, r, _task=task, _ot=ot_lambda):
            scalar, metrics = model.apply(
                {"params": p}, batch, _task, ot_lambda=_ot,
                deterministic=False, rngs={"dropout": r},
                method=UniterForPretraining.scalar_loss)
            return scalar, metrics

        step = make_train_step(loss_fn, loss_scale="mean", steps_per_call=K)
        batch = make_batch(task, np.random.RandomState(1))
        if K > 1:
            batch = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (K,) + x.shape), batch)
        t0 = time.time()
        try:
            state = copy_state(state0)
            for _ in range(3):
                state, metrics = step(state, batch, rng)
            loss = float(np.asarray(metrics["loss"]).reshape(-1)[-1])
            assert np.isfinite(loss), name
            n_iters = max(24 // K, 3)
            t1 = time.perf_counter()
            for _ in range(n_iters):
                state, metrics = step(state, batch, rng)
            _ = float(np.asarray(metrics["loss"]).reshape(-1)[-1])  # fence
            dt = time.perf_counter() - t1
            ex_s = n_iters * K * B / dt
            rec = dict(task=name, B=B, T=T, R=R, k=K,
                       ex_per_s=round(ex_s, 1),
                       tok_per_s=round(ex_s * (T + R)),
                       ms_per_step=round(1000 * dt / (n_iters * K), 2),
                       wall_s=round(time.time() - t0, 1))
        except Exception as e:
            rec = dict(task=name, error=repr(e)[:300],
                       wall_s=round(time.time() - t0, 1))
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
